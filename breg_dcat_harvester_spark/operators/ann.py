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


def _dot_const(vec, c: list[float]):
    """dot(vec_column, constant vector) — JVM-side, codegen."""
    return F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(float(x)) for x in c]),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def train_ivf_centroids(
    emb: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_cap: int = 4096,
    iters: int = 8,
) -> list[list[float]]:
    """Coarse quantizer for IVF: seeded k-means (spherical) on a
    deterministic sample.

    The sample is the ``sample_cap`` rows with the smallest xxhash64(id) —
    content-derived, so identical across runs and cluster sizes (the same
    play as skolemization).  At 100 TB the sample collect is the only
    driver-side step and stays ~nlist x dim floats.
    """
    rows = (
        emb.select(
            F.col(vec_col).alias("v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("r"),
        )
        .orderBy("r", "v")
        .limit(sample_cap)
        .collect()
    )
    x = np.array([r.v for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    k = min(nlist, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return cents.tolist()


def ivf_assign(
    df: DataFrame, vec_col: str, centroids: list[list[float]], nprobe: int = 1
) -> DataFrame:
    """Append ``cid`` — the vector's ``nprobe`` nearest coarse centroids
    (one output row per probe).  Pure Catalyst: per-centroid dots into a
    struct array, array_sort + reverse + slice for deterministic top-nprobe
    (ties broken by centroid id)."""
    scores = F.array(
        *[
            F.struct(
                F.round(_dot_const(F.col(vec_col), c), 6).alias("sim"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scores)), 1, nprobe)
    return df.withColumn("cid", F.explode(F.transform(top, lambda s: s["cid"])))


def cosine_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF partitioning: corpus vectors live in their
    nearest-centroid list; each query probes its ``nprobe`` nearest lists and
    exact cosine re-ranks only those candidates.

    The scale path next to ``cosine_topk_lsh``: the candidate join is an
    equi-join on the small cid key (corpus shuffled once by list), centroids
    stay a broadcast-sized constant, and recall/cost is the nprobe/nlist
    dial (nprobe=nlist degenerates to exact brute force).
    """
    cents = train_ivf_centroids(
        emb, nlist=nlist, id_col=id_col, vec_col=vec_col, seed=seed
    )
    base = ivf_assign(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")),
        "vec",
        cents,
        nprobe=1,
    )
    q = ivf_assign(queries, "query_vec", cents, nprobe=nprobe)
    scored = (
        q.join(base, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(_cosine(F.col("query_vec"), F.col("vec")), SIM_DECIMALS))
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
    """Near-duplicate pairs (a, b, sim) with cosine >= threshold (rounded).

    Brute force O(N^2) — the oracle-comparable baseline; use
    ``embedding_dup_pairs_lsh`` at corpus scale.
    """
    left = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    right = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        left.crossJoin(right)
        .filter(F.col("a") < F.col("b"))
        .withColumn("sim", F.round(_cosine(F.col("va"), F.col("vb")), SIM_DECIMALS))
        .filter(F.col("sim") >= threshold)
        .select("a", "b", "sim")
    )


def embedding_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    bands: int = 16,
    bits_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane LSH blocking,
    exact cosine verify — same output schema as ``embedding_dup_pairs``.

    Each candidate pair must collide in >=1 of ``bands`` sign-bit bands; a
    pair at cosine c collides per band with p = (1 - acos(c)/pi)^bits.
    Defaults are tuned for recall at moderate thresholds: at c=0.45 the
    4-bit band collides with p=0.18, so P(candidate) = 1-(1-0.18)^16 ~ 0.96
    (and ->1 for the near-identical pairs dedup targets); shorter bands mean
    bigger buckets — the exact-verify stage prunes them.  The join is an
    equi-join on (band value), one shuffle per side; no crossJoin anywhere.
    """
    dim = len(emb.select(vec_col).head()[0])
    planes = _hyperplanes(dim, bands * bits_per_band, seed)
    sk = sketch_bits(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "v",
        planes,
        bits_per_band,
    )
    cands = None
    for band in range(bands):
        left = sk.select(
            F.col("id").alias("a"), F.col("v").alias("va"), F.col(f"band{band}").alias("bk")
        )
        right = sk.select(
            F.col("id").alias("b"), F.col("v").alias("vb"), F.col(f"band{band}").alias("bk")
        )
        c = left.join(right, "bk").filter(F.col("a") < F.col("b")).drop("bk")
        cands = c if cands is None else cands.unionByName(c)
    return (
        cands.dropDuplicates(["a", "b"])
        .withColumn("sim", F.round(_cosine(F.col("va"), F.col("vb")), SIM_DECIMALS))
        .filter(F.col("sim") >= threshold)
        .select("a", "b", "sim")
    )
