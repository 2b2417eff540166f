"""Connected components + canonicalization (J11).

Union-find over the link graph as iterative min-label propagation: each node
repeatedly adopts the minimum component id among itself and its neighbors
until fixpoint.  This mirrors the reference's URI-dedup semantics (identical
URIs collapse by RDF set union; linked co-referent URIs collapse here) and
the north_star's "iterative DataFrame self-join with checkpointed frontier".

Scale design:
* Each iteration is one join (labels x symmetric edges) + one min-agg — two
  shuffles on node id; AQE coalesces.
* ``localCheckpoint`` every iteration truncates the lineage chain (an
  unchecked iterative plan grows exponentially and re-executes from scratch).
  On a cluster with an Iceberg catalog, storage.write_table checkpoints
  survive driver failure (resume path).
* Convergence: iterations ~ graph diameter.  Entity-link graphs are
  near-cliques of co-referent mentions, so diameter is tiny; for adversarial
  long chains the loop caps at ``max_iter`` and raises.  (At 10^12-edge
  scale one would switch to the large-star/small-star algorithm
  [Kiveris et al., "Connected Components in MapReduce and Beyond"], which
  converges in O(log^2 n) rounds; plain propagation is optimal for the
  short-diameter graphs linking produces.)
* Idempotence: running canonicalization on already-canonical edges is a
  no-op (tested) — required for resumable re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node_id, canonical_id) for every node appearing in ``pairs``.

    canonical_id is the lexicographically smallest node id in the component
    (deterministic, content-derived — stable across runs and cluster sizes).
    """
    # localCheckpoint cuts whatever lineage produced the pairs (the LSH
    # blocking DAG is deep); without it every iteration would recompute
    # candidate generation from scratch.
    sym = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .unionByName(pairs.select(F.col(b_col).alias("x"), F.col(a_col).alias("y")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select("x").distinct().withColumn("comp", F.col("x"))

    # Convergence check: component labels only ever decrease (min-propagation
    # is monotone), so an unchanged label-set checksum means fixpoint —
    # one cheap aggregation instead of a per-iteration join.
    def _checksum(df: DataFrame):
        # decimal accumulator: a long sum of 64-bit hashes overflows (ANSI)
        row = df.agg(
            F.sum(F.xxhash64("x", "comp").cast("decimal(28,0)")).alias("c")
        ).head()
        return row.c or 0

    prev_sum = _checksum(labels)
    for it in range(max_iter):
        nbr = sym.join(labels.withColumnRenamed("x", "y"), "y").select("x", "comp")
        new_labels = (
            labels.unionByName(nbr).groupBy("x").agg(F.min("comp").alias("comp"))
        )
        # truncate lineage every ``checkpoint_every`` rounds (every round by
        # default; raising it trades a deeper plan for fewer materializations)
        if (it + 1) % max(checkpoint_every, 1) == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        new_sum = _checksum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            return labels.select(
                F.col("x").alias("node_id"), F.col("comp").alias("canonical_id")
            )
        prev_sum = new_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 30,
) -> DataFrame:
    """(node_id, canonical_id) via alternating large-star / small-star.

    The O(log^2 n)-round algorithm from Kiveris et al., "Connected
    Components in MapReduce and Beyond" (SoCC'14) — the high-diameter
    fallback the ``connected_components`` docstring cites.  Min-propagation
    moves the component minimum ONE hop per round, so a D-diameter graph
    needs D rounds; the star operations re-hang whole neighborhoods under
    their local minimum each round, collapsing chains geometrically.  Same
    output contract: canonical_id = lexicographically smallest node id in
    the component (deterministic at any parallelism).

    Per round: large-star (one min-agg + one join on the node key) then
    small-star (same shape on the oriented edge set) — ~4 key-partitioned
    shuffles, AQE-coalesced; ``localCheckpoint`` truncates lineage per
    round.  Use this for arbitrary graphs (e.g. web/citation links); plain
    propagation stays preferable for the near-clique link graphs entity
    linking emits (fewer shuffles per round, ~2 rounds total there).
    """
    raw = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    # all_nodes comes from the RAW pairs, BEFORE the self-loop filter: a node
    # appearing only as (a, a) still owes an identity row, matching
    # connected_components' contract (the filtered edge list would drop it)
    all_nodes = raw.select(F.col("u").alias("node_id")).unionByName(
        raw.select(F.col("v").alias("node_id"))
    ).distinct().localCheckpoint(eager=True)
    edges = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _checksum(df: DataFrame):
        # (hash-sum, count) pair: star rounds are NOT monotone (unlike
        # min-propagation's labels), so the order-insensitive hash sum alone
        # could collide between two different consecutive edge sets; equal
        # counts must also hold before we declare convergence.  Same single
        # aggregation, one extra long.
        row = df.agg(
            F.sum(F.xxhash64("u", "v").cast("decimal(28,0)")).alias("c"),
            F.count(F.lit(1)).alias("n"),
        ).head()
        return (row.c or 0, row.n)

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mv"))
        m = mins.select("u", F.least("u", "_mv").alias("m"))
        # attach (v, m(u)) for every strictly-larger neighbor v of u
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        nbr = o.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
        center = mins.select("u", F.col("m").alias("v"))
        return (
            nbr.unionByName(center)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    prev_sum = _checksum(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sum = _checksum(edges)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # converged edge set is a star forest: every edge is (member, component
    # min); roots appear only on the v side
    labels = edges.select(
        F.col("u").alias("node_id"), F.col("v").alias("canonical_id")
    )
    return (
        all_nodes.join(labels, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("canonical_id", F.col("node_id")).alias("canonical_id"),
        )
    )


def canonical_mapping(labels: DataFrame) -> DataFrame:
    """Only the non-identity rows (node_id != canonical_id) — the rewrite map."""
    return labels.filter(F.col("node_id") != F.col("canonical_id"))


def canonicalize_edges(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonical map (URI dedup semantics).

    Broadcast the mapping (it is |linked nodes|-sized, tiny relative to the
    edge table) and left-join twice; unmapped terms pass through.
    """
    m = F.broadcast(canonical_mapping(labels))
    ms = m.select(F.col("node_id").alias("subj"), F.col("canonical_id").alias("_cs"))
    mo = m.select(F.col("node_id").alias("obj"), F.col("canonical_id").alias("_co"))
    return (
        edges.join(ms, "subj", "left")
        .join(mo, "obj", "left")
        .withColumn("subj", F.coalesce("_cs", "subj"))
        .withColumn(
            "obj",
            F.when(F.col("obj_kind") == "uri", F.coalesce("_co", "obj")).otherwise(
                F.col("obj")
            ),
        )
        .drop("_cs", "_co")
    )


def build_nodes(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """The nodes table (schema.NODES): every distinct term with its kind,
    entity type, label, and canonical id."""
    from ..schema import RDF_TYPE  # local import to avoid cycle

    subj_nodes = edges.select(F.col("subj").alias("node_id")).withColumn(
        "node_kind", F.lit("uri")
    )
    obj_nodes = edges.select(
        F.col("obj").alias("node_id"), F.col("obj_kind").alias("node_kind")
    )
    nodes = subj_nodes.unionByName(obj_nodes).distinct()

    from ..schema import DCT, FOAF

    # one filtered scan + one groupBy for BOTH attributes (the split
    # two-groupBy + two-join form shuffled twice and re-traversed the edge
    # DAG per branch when uncached) — same single-pass shape as
    # link.entity_labels
    attrs = (
        edges.filter(F.col("pred").isin(RDF_TYPE, FOAF + "name", DCT + "title"))
        .groupBy(F.col("subj").alias("node_id"))
        .agg(
            F.min(F.when(F.col("pred") == RDF_TYPE, F.col("obj"))).alias(
                "entity_type"
            ),
            F.min(F.when(F.col("pred") != RDF_TYPE, F.col("obj"))).alias("label"),
        )
    )
    m = canonical_mapping(labels).withColumnRenamed("canonical_id", "_canon")
    return (
        nodes.join(attrs, "node_id", "left")
        .join(F.broadcast(m), "node_id", "left")
        .select(
            "node_id",
            F.coalesce("_canon", "node_id").alias("canonical_id"),
            "node_kind",
            "entity_type",
            "label",
        )
    )


def incremental_components_delta(
    base_labels: DataFrame,
    new_pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Fold a shard of newly discovered link pairs into an existing
    canonical mapping WITHOUT re-running CC over the base graph.

    Returns ``(remap, new_node_labels)``:

    * ``remap`` — (node_id=old canonical, canonical_id=new canonical) rows
      for every EXISTING component whose canonical id changes;
    * ``new_node_labels`` — (node_id, canonical_id) for every node the base
      mapping has never seen.

    The union of {base rows rewritten through remap} ∪ {new_node_labels} is
    exactly ``connected_components(base_pairs ∪ new_pairs)`` (tested) —
    because contracting each base component to its canonical id preserves
    connectivity, and the base canonical is the minimum of its component, so
    the min-label of the contracted merge graph is the global minimum of the
    merged component.

    Scale shape (the whole point): every join/agg here runs on the
    INCREMENT (new pairs + their endpoints + the touched components), never
    on the base graph.  The base mapping is probed once with a left join to
    anchor endpoints — at 10^12-edge scale that probe is a bucketed/
    broadcast-right lookup of |increment endpoints| keys, and applying the
    remap afterwards is one map-only broadcast join over the base table
    (``incremental_components``).  Mirrors dedup.incremental_minhash_pairs:
    cost ∝ arriving shard, the ingested corpus is never re-shuffled.
    """
    ends = (
        new_pairs.select(F.col(a_col).alias("node_id"))
        .unionByName(new_pairs.select(F.col(b_col).alias("node_id")))
        .distinct()
    )
    # anchor each endpoint to its current component; unseen nodes anchor to
    # themselves (their own 1-node component)
    anchored = (
        ends.join(base_labels, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("canonical_id", "node_id").alias("comp"),
        )
        .localCheckpoint(eager=True)
    )
    aa = anchored.select(F.col("node_id").alias(a_col), F.col("comp").alias("_ca"))
    ab = anchored.select(F.col("node_id").alias(b_col), F.col("comp").alias("_cb"))
    contracted = (
        new_pairs.select(a_col, b_col)
        .join(aa, a_col)
        .join(ab, b_col)
        .select(F.col("_ca").alias("a"), F.col("_cb").alias("b"))
    )
    # CC over the contracted merge graph — |touched components| nodes, an
    # increment-sized problem regardless of base size.  Vertices are base
    # canonical ids (each the min of its base component) and fresh node ids,
    # so min-label canonicals here are the true merged-component minima.
    merged = connected_components(contracted, max_iter=max_iter)
    remap = merged.filter(F.col("node_id") != F.col("canonical_id")).join(
        base_labels.select(F.col("canonical_id").alias("node_id")).distinct(),
        "node_id",
        "left_semi",
    )
    new_node_labels = (
        anchored.join(base_labels, "node_id", "left_anti")
        .join(
            merged.withColumnRenamed("node_id", "comp").withColumnRenamed(
                "canonical_id", "_merged"
            ),
            "comp",
            "left",
        )
        .select("node_id", F.coalesce("_merged", "comp").alias("canonical_id"))
    )
    return remap, new_node_labels


def incremental_components(
    base_labels: DataFrame,
    new_pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Full updated (node_id, canonical_id) mapping after folding
    ``new_pairs`` into ``base_labels`` — equals
    ``connected_components(base_pairs ∪ new_pairs)`` row-for-row.

    One pass over the base table: the increment-sized remap is broadcast
    and left-joined (map-only — the base is never shuffled), then the
    brand-new nodes are appended.
    """
    remap, new_node_labels = incremental_components_delta(
        base_labels, new_pairs, a_col=a_col, b_col=b_col, max_iter=max_iter
    )
    rm = F.broadcast(
        remap.select(F.col("node_id").alias("canonical_id"), F.col("canonical_id").alias("_new"))
    )
    updated = (
        base_labels.join(rm, "canonical_id", "left")
        .select(
            "node_id",
            F.coalesce("_new", "canonical_id").alias("canonical_id"),
        )
    )
    return updated.unionByName(new_node_labels)
