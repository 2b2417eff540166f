"""Negative sampling for KG-embedding training (ours).

Link-prediction training (TransE/DistMult families, Bordes et al. 2013)
consumes each positive triple with k CORRUPTED negatives — same (subj,
pred), object replaced by a plausible-but-wrong candidate drawn from the
objects the predicate actually takes (type-consistent corruption; uniform
random objects are trivially separable).  At corpus scale the naive
formulation — join every triple against the full per-predicate object
set and sample — re-shuffles the graph per epoch.  This operator makes
sampling a MAP-SIDE decision:

1. per-predicate candidate pools: the ``pool_size`` objects with the
   smallest ``sha256(pred|obj)`` — a deterministic, content-keyed sample
   of each predicate's object population (hash order ≈ uniform), built
   in one agg pass and SORTED into an array.  Pools are
   vocabulary-bounded (``|preds| × pool_size``) and broadcast;
2. each positive picks its k negatives by indexing the pool with
   ``sha256(subj|pred|obj|i)`` — pure Column math on the broadcast
   array, zero shuffle on the triple stream, reproducible across runs,
   epochs (vary ``salt``), parallelism and engines;
3. accidental hits (the drawn candidate equals the true object) are
   dropped, not resampled — the standard filtered-negative policy; with
   pools ≥ ~100 the loss is ≤ k/pool_size of rows, and determinism is
   worth more to a training pipeline than an exact-k guarantee.

Output: (subj, pred, obj, neg_idx, neg_obj) — one row per surviving
negative.  A DuckDB oracle replays pools, indexes and filters hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hex_to_long(col):
    # first 8 hex chars -> [0, 2^32): safely inside int64 for modulo math
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("long")


def kg_negative_samples(
    edges: DataFrame,
    k: int = 2,
    pool_size: int = 1024,
    salt: str = "neg",
) -> DataFrame:
    """k type-consistent corrupted objects per URI-object triple.

    Deterministic: pools are hash-ranked, picks are hash-indexed; change
    ``salt`` per training epoch for fresh (but still reproducible)
    negatives.
    """
    if k < 1 or pool_size < 2:
        raise ValueError("k >= 1 and pool_size >= 2 required")
    pos = (
        edges.filter(F.col("obj_kind") == "uri")
        .select("subj", "pred", "obj")
        .distinct()
    )
    # two-stage top-pool_size (the exact_dup_groups / stratified_fixed_k
    # recipe): a high-cardinality predicate must not funnel its whole
    # distinct-object population through ONE window task, so stage 1 ranks
    # inside (pred, xxhash64(obj) % fanout) splits — any member of the
    # predicate's global top-pool_size by (hk, obj) is also in its split's
    # local top-pool_size — and stage 2 is a bounded per-pred agg over the
    # <= fanout * pool_size survivors (array_sort on (hk, obj) structs
    # reproduces the global order exactly).
    fanout = 64
    w_local = Window.partitionBy("pred", "_split").orderBy("hk", "obj")
    pools = (
        pos.select("pred", "obj")
        .distinct()
        .withColumn(
            "hk", F.sha2(F.concat_ws("|", F.lit(salt), F.col("pred"), F.col("obj")), 256)
        )
        .withColumn("_split", F.pmod(F.xxhash64("obj"), F.lit(fanout)))
        .withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= pool_size)
        .groupBy("pred")
        .agg(
            F.transform(
                F.slice(
                    F.array_sort(F.collect_list(F.struct("hk", "obj"))),
                    1, pool_size,
                ),
                lambda s: s["obj"],
            ).alias("pool")
        )
    )
    drawn = (
        pos.join(F.broadcast(pools), "pred")
        .select(
            "subj",
            "pred",
            "obj",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx"),
            "pool",
        )
        .withColumn(
            "neg_obj",
            F.element_at(
                F.col("pool"),
                (
                    F.pmod(
                        _hex_to_long(
                            F.sha2(
                                F.concat_ws(
                                    "|",
                                    F.lit(salt),
                                    F.col("subj"),
                                    F.col("pred"),
                                    F.col("obj"),
                                    F.col("neg_idx").cast("string"),
                                ),
                                256,
                            )
                        ),
                        F.size("pool"),
                    )
                    + 1
                ).cast("int"),
            ),
        )
    )
    return drawn.filter(F.col("neg_obj") != F.col("obj")).select(
        "subj", "pred", "obj",
        F.col("neg_idx").cast("int").alias("neg_idx"),
        "neg_obj",
    )


def oracle_negative_samples_sql(
    triples_rel: str, k: int = 2, pool_size: int = 1024, salt: str = "neg"
) -> str:
    """DuckDB replay: same hash-ranked pools (list ordered by rank), same
    hash-indexed picks, same accidental-hit filter."""
    return f"""
WITH pos AS (
    SELECT DISTINCT subj, pred, obj FROM {triples_rel}
    WHERE obj_kind = 'uri'
),
ranked AS (
    SELECT pred, obj,
           row_number() OVER (
               PARTITION BY pred
               ORDER BY sha256('{salt}' || '|' || pred || '|' || obj), obj
           ) AS rn
    FROM (SELECT DISTINCT pred, obj FROM pos)
),
pools AS (
    SELECT pred, list(obj ORDER BY rn) AS pool
    FROM ranked WHERE rn <= {pool_size} GROUP BY pred
),
drawn AS (
    SELECT p.subj, p.pred, p.obj, i.neg_idx, po.pool,
           po.pool[
               CAST((('0x' || substr(sha256(
                   '{salt}' || '|' || p.subj || '|' || p.pred || '|' ||
                   p.obj || '|' || CAST(i.neg_idx AS VARCHAR)
               ), 1, 8))::BIGINT % len(po.pool)) + 1 AS INT)
           ] AS neg_obj
    FROM pos p
    JOIN pools po ON po.pred = p.pred
    CROSS JOIN (
        SELECT unnest(generate_series(0, {k - 1})) AS neg_idx
    ) i
)
SELECT subj, pred, obj, CAST(neg_idx AS INT) AS neg_idx, neg_obj
FROM drawn WHERE neg_obj <> obj
"""
