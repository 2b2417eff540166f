"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``       — exact brute-force top-k per query (the baseline and
  the oracle shape): cross join + JVM-side dot product via zip_with/aggregate
  (double accumulation), deterministic (round(sim,4), id) ranking.
* ``cosine_topk_lsh``   — the scale path: random-hyperplane LSH bucket join.
  Each vector gets a sign-bit sketch from R seeded hyperplanes, split into
  bands; candidates share a band; exact cosine re-ranks candidates only.
  Recall < 1 by construction (probed in tests, not oracle-gated).
* ``embedding_dup_pairs`` — near-dup pairs by cosine >= threshold.

Scale notes: brute force is O(Q x N) — fine for reranking shortlists, wrong
for corpus x corpus; the LSH variant's join is keyed on (band, sketch), one
shuffle each side.  At real scale the hyperplane matrix stays a broadcast
(R x dim doubles), and AQE handles bucket skew.  Determinism: hyperplanes
derive from numpy PCG64(seed) — identical across cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIM_DECIMALS = 4  # rank on round(sim, 4) with id tie-break -> engine-stable


def _cosine(a, b):
    """Double-precision cosine between two array columns (JVM, codegen)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank).

    ``queries``: (query_id, query_vec).  Ranking key is
    (round(cos, 4) DESC, neighbor_id ASC) — the rounding makes ranks
    identical across engines despite float summation-order differences.
    """
    base = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    q = queries.select(F.col("query_id"), F.col("query_vec"))
    scored = (
        q.crossJoin(base)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(_cosine(F.col("query_vec"), F.col("vec")), SIM_DECIMALS))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplanes(dim: int, num: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num, dim)).tolist()


def sketch_bits(
    df: DataFrame, vec_col: str, planes: list[list[float]], bits_per_band: int = 8
) -> DataFrame:
    """Append one long column per band of sign bits."""
    out = df
    bands = len(planes) // bits_per_band
    for band in range(bands):
        val = F.lit(0).cast("long")
        for j in range(bits_per_band):
            p = planes[band * bits_per_band + j]
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            val = val + F.when(dot >= 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out.withColumn(f"band{band}", val)
    return out


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bands: int = 8,
    bits_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidates + exact rerank.

    Recall/cost dial: fewer bits per band -> bigger buckets -> higher recall;
    more bands -> more probes.  8x8 suits loosely-clustered corpora; dense
    near-dup corpora can afford 16-bit bands.
    """
    dim = len(emb.select(vec_col).head()[0])
    planes = _hyperplanes(dim, bands * bits_per_band, seed)
    base = sketch_bits(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")),
        "vec",
        planes,
        bits_per_band,
    )
    q = sketch_bits(queries, "query_vec", planes, bits_per_band)
    cands = None
    for band in range(bands):
        c = q.select("query_id", "query_vec", F.col(f"band{band}").alias("bk")).join(
            base.select("neighbor_id", "vec", F.col(f"band{band}").alias("bk")), "bk"
        ).drop("bk")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.withColumn(
        "sim", F.round(_cosine(F.col("query_vec"), F.col("vec")), SIM_DECIMALS)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (a, b, sim) with cosine >= threshold (rounded)."""
    left = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    right = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        left.crossJoin(right)
        .filter(F.col("a") < F.col("b"))
        .withColumn("sim", F.round(_cosine(F.col("va"), F.col("vb")), SIM_DECIMALS))
        .filter(F.col("sim") >= threshold)
        .select("a", "b", "sim")
    )
