"""Graph-analytics QA probes over the canonicalized KG (ours).

The reference stops at materializing the graph (store.py / harvest.py); a
100 TB KG-construction pipeline also needs cheap structural QA after entity
canonicalization — "did the URI dedup collapse hubs correctly?" is asked of
degree/centrality/closure statistics, not of individual triples.  This
module adds the two classic probes on top of `merge.py::node_degrees`:

* ``pagerank_integer`` — PageRank with SCALED-INTEGER arithmetic.  Every
  contribution is ``(rank * d_permille) div (1000 * outdeg)`` on int64, so
  partial sums are associative/commutative EXACTLY (no float reassociation):
  the result is bit-identical at any parallelism and any shuffle order, and
  a DuckDB oracle replays it with the same unrolled integer expressions.
  Dangling mass is dropped (documented variant; determinism over mass
  conservation — the probe ranks hubs, it does not need a stochastic matrix).

* ``node_triangles`` — triangle participation counts via the degree-oriented
  wedge join (Suri & Vassilvitskii's MapReduce node-iterator++): each
  undirected edge is oriented from its (degree, id)-smaller endpoint to the
  larger, which caps the wedge fan-out at O(sqrt(m)) per node and counts
  each triangle exactly once — THE skew answer for power-law graphs, where
  the naive wedge join explodes on hubs.

Scale notes: the link set is projected/deduped once and localCheckpoint-ed;
each PageRank iteration is one join of the (node,rank) table onto the links'
``src`` side plus one hash-agg shuffle on ``dst`` — the frontier-sized state
moves, never the edge set lineage.  Triangles take two self-joins of the
oriented edge list; orientation makes the join keys near-uniform even when
raw degrees are power-law (AQE skew-join stays as a backstop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _uri_links(edges: DataFrame) -> DataFrame:
    """Distinct directed URI->URI link set (literal objects are attributes,
    never graph edges); self-loops dropped (rank-neutral, triangle-neutral)."""
    return (
        edges.filter(F.col("obj_kind") == "uri")
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 5,
    damping_permille: int = 850,
    scale: int = 1_000_000,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """(node, rank): scaled-integer PageRank after ``iterations`` rounds.

    rank_0 = ``scale`` for every linked node; each round
    ``rank'(v) = base + sum_{u->v} (rank(u) * damping_permille)
    div (1000 * outdeg(u))`` with ``base = scale * (1000 - damping_permille)
    div 1000`` — all int64, floor division, so the sum is order-independent
    and the output deterministic at any parallelism.  int64 headroom: ranks
    are bounded by total mass <= n * scale, so ``rank * damping_permille``
    stays below 2^63 for any graph under ~10^10 nodes at the default scale.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    raw = _uri_links(edges)
    # out-degree is loop-invariant: fold it into the checkpointed link set
    # once so each round pays ONE join (ranks onto src) + one agg, not a
    # degree recount per iteration
    links = (
        raw.join(
            raw.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src"
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        links.select(F.col("src").alias("node"))
        .unionByName(links.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = scale * (1000 - damping_permille) // 1000

    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for it in range(iterations):
        contribs = (
            links.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                F.expr(
                    f"(rank * {damping_permille}) div (1000 * outdeg)"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(
            contribs.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (F.lit(base) + F.coalesce(F.col("contrib"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
        # truncate iterative lineage every few rounds (GraphX-style
        # checkpointInterval): a per-round eager materialization would pay
        # one blocking job per iteration; unbounded laziness grows the plan
        # superlinearly. Every k rounds is the right middle at any scale.
        if (it + 1) % checkpoint_interval == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def node_triangles(edges: DataFrame) -> DataFrame:
    """(node, triangles): per-node triangle participation counts.

    Wedges are enumerated only from each triangle's (degree, id)-minimal
    vertex (edges oriented low->high by (degree, id)), then closed by ONE
    equi-join against the lexicographic undirected edge set — each triangle
    is found exactly once and its corners are exploded map-side into the
    final count agg.
    """
    und = (
        _uri_links(edges)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    j = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # checkpointed: the wedge self-join would otherwise recompute the
    # orientation join once per side
    e = j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint(eager=True)
    wedges = (
        e.select(F.col("lo").alias("w"), F.col("hi").alias("x"))
        .join(e.select(F.col("lo").alias("w"), F.col("hi").alias("y")), "w")
        .filter(F.col("x") < F.col("y"))
    )
    # wedge arms are x < y lexicographic, so the closing undirected edge is
    # exactly a row of `und` — one join, no orientation-case union
    tri = wedges.join(
        und.withColumnRenamed("a", "x").withColumnRenamed("b", "y"), ["x", "y"]
    )
    corners = tri.select(
        F.explode(F.array("w", "x", "y")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )


def kcore(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 8,
    checkpoint_interval: int = 3,
    require_converged: bool = True,
) -> DataFrame:
    """(node, core_degree): the k-core of the undirected URI-link graph
    after ``rounds`` peel rounds — nodes of the maximal subgraph where
    every node keeps degree >= k.

    Dense-core extraction is the standard KG-quality probe next to
    PageRank/triangles: the k-core is where the interlinked entity mass
    lives; degree-1 tails (dangling labels, one-off mentions) peel away.

    Algorithm: iterative peeling — drop nodes with current degree < k,
    recompute degrees on the induced subgraph, repeat.  A FIXED round
    count (like ``pagerank_integer``'s unrolled iterations) keeps the
    result oracle-replayable as ``rounds`` unrolled SQL stages; peeling is
    monotone, so extra rounds past the fixpoint are exact no-ops, and
    ``rounds`` only needs to be >= the peel depth.  ``require_converged``
    (default True) makes an under-provisioned ``rounds`` FAIL instead of
    silently returning a non-core: one extra degree aggregation checks
    that a further peel round would remove nothing.  Pass False only to
    inspect intermediate peel states (as the cascade test does).
    Per round: ONE degree aggregation + two semi-joins on the surviving
    node set — no shuffle grows with round count, and the edge set only
    shrinks.  Deterministic: pure set operations, no ordering anywhere.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    raw = _uri_links(edges)
    und = (
        raw.select("src", "dst")
        .unionByName(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    live = und
    for it in range(rounds):
        survivors = (
            live.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select(F.col("src").alias("node"))
        )
        live = (
            live.join(survivors.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(survivors.withColumnRenamed("node", "dst"), "dst", "left_semi")
        )
        if (it + 1) % checkpoint_interval == 0 and it + 1 < rounds:
            live = live.localCheckpoint(eager=True)
    if require_converged:
        # fixpoint check: every surviving endpoint must already clear k,
        # i.e. one more peel round would remove nothing
        n_nodes = live.select("src").distinct().count()
        n_ok = (
            live.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .count()
        )
        if n_ok != n_nodes:
            raise ValueError(
                f"kcore: not converged after {rounds} rounds "
                f"({n_nodes - n_ok} nodes still peelable) — raise rounds"
            )
    return (
        live.groupBy("src")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .select(F.col("src").alias("node"), F.col("core_degree").cast("long"))
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """(node, label) after ``rounds`` of DETERMINISTIC synchronous label
    propagation over the undirected URI graph — community structure as a
    canonicalization QA probe (over-merged entities fuse communities that
    share no vocabulary; under-merged ones split a hub into twins).

    Classic LPA is notoriously nondeterministic (random visit order, random
    tie-breaks); this variant is reproducible at any parallelism: all nodes
    update simultaneously from the PREVIOUS round's labels (synchronous),
    the new label is the most frequent neighbor label, and ties break to
    the lexicographically smallest label.  Isolated/stable nodes keep their
    label.  Counts are exact integers, so a DuckDB oracle replays every
    round verbatim (same ROW_NUMBER tie-break).

    Scale: the symmetrized link set is deduped once and checkpointed; each
    round is one join of the (node, label) table onto ``src`` plus one
    (node, label) hash-agg and one per-node top-1 window — state the size
    of the node set moves each round, never the edge lineage.  Synchronous
    min-tie LPA can oscillate on bipartite structure instead of converging;
    a FIXED round count (like the PageRank/k-core probes) keeps the output
    well-defined — this is a structural probe, not a clustering service.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    directed = _uri_links(edges)
    links = (
        directed.unionByName(
            directed.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        links.select(F.col("src").alias("node")).distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))

    from pyspark.sql import Window

    top1 = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for i in range(rounds):
        cand = (
            links.join(
                labels.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = (
            cand.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(winner, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
        if (i + 1) % checkpoint_interval == 0 and i + 1 < rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels


# ---------------------------------------------------------------------------
# HyperANF-style neighborhood function (Boldi, Rosa & Vigna 2011)
# ---------------------------------------------------------------------------

ANF_M = 64        # HLL buckets per node
ANF_MAX_RHO = 40  # register ceiling (40-bit hash tail)
# alpha_64 * m^2 * 2^40 / 1000, exact integer (same plan constant in the
# DuckDB oracle); raw estimate = _ANF_A // sum_j 2^(40 - M_j)
_ANF_A = (709 * ANF_M * ANF_M * (1 << ANF_MAX_RHO)) // 1000
# linear-counting branch (est < 2.5m with empty buckets): round(m*ln(m/V))
# for V = 1..64, precomputed so BOTH engines use the identical integer table
_ANF_LC = [round(ANF_M * __import__("math").log(ANF_M / v)) for v in range(1, ANF_M + 1)]


def _anf_hash_cols(node_col):
    """(bucket, rho) from sha256(node): bucket = first byte mod m, rho =
    1 + leading zeros of the next 40 hash bits (capped) — pure integer
    Column math, identical in the oracle's generated CASE chain."""
    h = F.sha2(node_col, 256)
    bucket = F.pmod(F.conv(F.substring(h, 1, 2), 16, 10).cast("long"), ANF_M)
    w = F.conv(F.substring(h, 3, 10), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(ANF_MAX_RHO)).otherwise(
        F.least(F.lit(41) - F.length(F.bin(w)), F.lit(ANF_MAX_RHO))
    )
    return bucket.cast("int"), rho.cast("int")


def neighborhood_function(
    edges: DataFrame,
    radius: int = 3,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """(node, radius, reach_est): estimated out-ball sizes |B(v, r)| for
    r = 0..``radius`` — the HyperANF neighborhood function, the
    100 TB-scale answer to "how far does this entity reach" (exact
    reachability is quadratic output; ``paths.reachable_pairs`` at depth 8
    materializes every pair).

    Each node carries m=64 integer HLL registers; one round is
    ``regs(v) <- elementwise-max(regs(v), regs(u) for v->u)``, kept in the
    EXPLODED (node, idx, val) relation so the merge is a plain
    (node, idx) hash-agg — a hub's fan-in spreads over 64 keys instead of
    hammering one, and map-side partial max absorbs the rest.  Per round:
    ONE join (links.dst -> regs) + ONE agg shuffle.

    Registers are integers derived from sha256, merged by max — fully
    order/parallelism-independent, so the DuckDB oracle replays every
    round and every estimate BIT-EXACTLY (scaled-integer HLL estimator
    with an integer linear-counting table; no float anywhere).

    EAGER: the job runs at call time (the output is materialized once so
    every per-round register cache can be released before returning —
    see the cleanup note at the end); the returned frame is
    checkpoint-backed and cheap to re-consume.
    """
    if radius < 0:
        raise ValueError("radius must be >= 0")
    links = _uri_links(edges).localCheckpoint(eager=True)
    nodes = (
        links.select(F.col("src").alias("node"))
        .unionAll(links.select(F.col("dst").alias("node")))
        .distinct()
    )
    bucket, rho = _anf_hash_cols(F.col("node"))
    regs = (
        nodes.select("node", bucket.alias("_b"), rho.alias("_r"))
        .select(
            "node", "_b", "_r",
            F.explode(F.sequence(F.lit(0), F.lit(ANF_M - 1))).alias("idx"),
        )
        .withColumn(
            "val",
            F.when(F.col("idx") == F.col("_b"), F.col("_r")).otherwise(0),
        )
        .select("node", "idx", "val")
        .localCheckpoint(eager=True)
    )

    def estimate(r_regs: DataFrame, r: int) -> DataFrame:
        per = r_regs.groupBy("node").agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {ANF_MAX_RHO} - val)")
            ).alias("_sn"),
            F.sum(F.when(F.col("val") == 0, 1).otherwise(0)).alias("_v"),
        )
        # exact int64 division — float '/' loses precision above 2^53
        raw = F.expr(f"div(CAST({_ANF_A} AS BIGINT), _sn)")
        lc = F.element_at(
            F.array(*[F.lit(x) for x in _ANF_LC]), F.col("_v").cast("int")
        )
        est = F.when(
            (F.col("_v") > 0) & (raw < int(2.5 * ANF_M)), lc.cast("long")
        ).otherwise(raw)
        return per.select(
            "node", F.lit(r).alias("radius"), est.alias("reach_est")
        )

    out = estimate(regs, 0)
    persisted: list[DataFrame] = []
    for r in range(1, radius + 1):
        pulled = (
            links.join(
                regs.withColumnRenamed("node", "dst"), "dst"
            ).select(F.col("src").alias("node"), "idx", "val")
        )
        regs = (
            regs.unionByName(pulled)
            .groupBy("node", "idx")
            .agg(F.max("val").alias("val"))
        )
        # EVERY round is shared: the output unions one estimate branch per
        # radius, and each branch otherwise re-derives its round's register
        # lineage from scratch inside the one final action.  Non-interval
        # rounds use persist() — evictable and RECOMPUTABLE on executor
        # loss — while the periodic localCheckpoint still truncates lineage
        # depth (an un-recomputable pinned block per interval, not per
        # round).
        if r % checkpoint_interval == 0 and r < radius:
            regs = regs.localCheckpoint(eager=True)
        else:
            regs = regs.persist()
            persisted.append(regs)
        out = out.unionByName(estimate(regs, r))
    # Materialize the (output-sized) result ONCE, then deterministically
    # release every persist()-cached register round — without this,
    # ~radius × 64 × |nodes| evictable register blocks stay pinned for the
    # session lifetime (reclaimed only when the lineage is GC'd).  Scope
    # honestly: the PERIODIC localCheckpoint rounds (one per
    # checkpoint_interval, the documented lineage-truncation pins) and the
    # output's own checkpoint remain until their frames are GC'd — both
    # are bounded (radius/interval register rounds + an output-sized
    # result per call), unlike the per-round caches released here.  The
    # operator is consequently EAGER: the job runs at call time and the
    # caller gets a checkpoint-backed frame with no reference to the
    # released register lineage.
    out = out.localCheckpoint(eager=True)
    for df in persisted:
        df.unpersist()
    return out


def oracle_neighborhood_sql(triples_rel: str, radius: int = 3) -> str:
    """DuckDB replay of the full register algebra: the same sha-derived
    (bucket, rho), the same per-round elementwise max in the exploded
    relation, the same scaled-integer estimator + LC table."""
    rho_chain = " ".join(
        f"WHEN w >= {1 << (40 - k)} THEN {k}" for k in range(1, 41)
    )
    lc_list = ", ".join(str(x) for x in _ANF_LC)
    head = f"""
WITH l AS (
    SELECT subj AS src, obj AS dst FROM {triples_rel} AS _t
    WHERE obj_kind = 'uri' AND subj <> obj GROUP BY subj, obj
),
n AS (SELECT src AS node FROM l UNION SELECT dst FROM l),
h0 AS (
    SELECT node,
           CAST(('0x' || substr(sha256(node), 1, 2))::BIGINT % {ANF_M} AS INTEGER) AS b,
           ('0x' || substr(sha256(node), 3, 10))::BIGINT AS w
    FROM n
),
h AS (
    SELECT node, b,
           CAST(CASE {rho_chain} ELSE {ANF_MAX_RHO} END AS INTEGER) AS r
    FROM h0
),
r0 AS (
    SELECT h.node, g.i AS idx,
           CASE WHEN g.i = h.b THEN h.r ELSE 0 END AS val
    FROM h, LATERAL (SELECT unnest(generate_series(0, {ANF_M - 1})) AS i) g
)"""
    rounds = "".join(
        f""",
r{k} AS (
    SELECT node, idx, MAX(val) AS val FROM (
        SELECT node, idx, val FROM r{k - 1}
        UNION ALL
        SELECT l.src AS node, p.idx, p.val
        FROM l JOIN r{k - 1} p ON p.node = l.dst
    ) GROUP BY node, idx
)"""
        for k in range(1, radius + 1)
    )
    est = f"""
SELECT node, CAST(rr AS INTEGER) AS radius, reach_est FROM (
    {" UNION ALL ".join(
        f'''SELECT node, {k} AS rr,
        CASE WHEN v > 0 AND ({_ANF_A} // sn) < {int(2.5 * ANF_M)}
             THEN CAST(([{lc_list}])[v] AS BIGINT)
             ELSE CAST({_ANF_A} // sn AS BIGINT) END AS reach_est
        FROM (
            SELECT node,
                   SUM(CAST(1 AS BIGINT) << ({ANF_MAX_RHO} - val)) AS sn,
                   CAST(SUM(CASE WHEN val = 0 THEN 1 ELSE 0 END) AS INTEGER) AS v
            FROM r{k} GROUP BY node
        )'''
        for k in range(0, radius + 1)
    )}
)"""
    return head + rounds + est
