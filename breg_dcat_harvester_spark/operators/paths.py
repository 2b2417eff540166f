"""Property-path reachability — the SPARQL 1.1 ``p+`` analog.

The reference's browser composes fixed-depth chains by hand (the 3-hop
catalog→publisher→type join of browser.py:200-214); SPARQL 1.1 generalizes
that to arbitrary-depth property paths (``dcat:dataset/dcat:distribution``,
``skos:broader+``).  ``reachable_pairs`` is that operator over the edge
table: every (src, dst) connected by a directed path of whitelisted
predicates, with ``depth`` = the SHORTEST such path (BFS order).

Scale design (semi-naive / Datalog delta evaluation):

* The traversable edge set is projected once to (src, dst) — predicate
  filter and ``obj_kind == 'uri'`` pushed into the scan (literals are
  attributes, never path steps) — and ``localCheckpoint``ed: every
  iteration re-reads this small materialized set, not the harvest DAG.
* Each round joins ONLY the previous round's delta against the edges
  (``delta.dst == edges.src``), then anti-joins the visited set, so a pair
  is expanded exactly once, in the round of its shortest path.  Work is
  O(|closure| + |frontier joins|), not O(rounds x |closure|) as the naive
  re-join-everything form pays.
* ``localCheckpoint`` truncates both accumulators every round — iterative
  lineage otherwise grows superlinearly and re-executes from the source.
* Rounds = longest shortest path (graph depth), bounded by ``max_hops``.
  Container hierarchies (catalog→dataset→distribution, concept schemes)
  are 2-4 deep; a cycle cannot loop because the anti-join never re-admits
  a known (src, dst).
* On a cluster the per-round join is one shuffle of the DELTA only; with
  the bucketed-by-subj triple layout (storage.write_bucketed_triples) the
  edge side plans zero exchanges, so each round moves just the frontier.
  Closure SIZE is the real 100 TB cost: bound the predicate whitelist (a
  closure over all predicates of a dense graph is quadratic by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachable_pairs(
    edges: DataFrame,
    preds: list[str] | None = None,
    max_hops: int = 10,
) -> DataFrame:
    """(src, dst, depth): directed reachability over whitelisted predicates.

    ``depth`` is the minimum number of hops (>= 1).  Deterministic at any
    parallelism: the pair set is a pure function of the edge set, and BFS
    assigns each pair its unique shortest depth.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    step = edges.filter(F.col("obj_kind") == "uri")
    if preds is not None:
        step = step.filter(F.col("pred").isin(list(preds)))
    step = (
        step.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .filter(F.col("src") != F.col("dst"))  # self-loop is a 0-hop no-op
        .distinct()
        .localCheckpoint(eager=True)
    )

    # visited is kept as the UNION VIEW of per-round checkpointed deltas:
    # each round materializes only its (shrinking) frontier, never the
    # accumulated closure — total writes are O(|closure|), and the
    # anti-join still reads flat materialized inputs (no lineage growth).
    deltas = [step.withColumn("depth", F.lit(1).cast("long"))]
    for hop in range(2, max_hops + 1):
        grown = (
            deltas[-1].select("src", F.col("dst").alias("mid"))
            .join(step.withColumnRenamed("src", "mid"), "mid")
            .select("src", "dst")
            .distinct()
            .filter(F.col("src") != F.col("dst"))
        )
        visited = deltas[0].select("src", "dst")
        for d in deltas[1:]:
            visited = visited.unionByName(d.select("src", "dst"))
        new_pairs = (
            grown.join(visited, ["src", "dst"], "left_anti")
            .withColumn("depth", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        if not new_pairs.head(1):
            break
        deltas.append(new_pairs)
    out = deltas[0]
    for d in deltas[1:]:
        out = out.unionByName(d)
    return out
