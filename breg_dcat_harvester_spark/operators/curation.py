"""End-to-end corpus curation: dedup -> quality -> sampling in ONE plan.

The flagship training-data composition: a real pipeline does not run dedup,
quality filtering, and mix sampling as separate jobs with intermediate
materializations — it wants one DataFrame plan per corpus snapshot that
emits an auditable PER-DOCUMENT decision row (why was this kept/dropped?),
because at 100 TB "show me why doc X survived" is an operational
requirement, not a nicety.

``curate_corpus`` composes the already-tested pieces:

* canonical near-dup decision (``dedup.canonical_docs``: MinHash-LSH pairs
  -> connected components -> keep the min doc_id per cluster),
* quality gating (``functions.textfns.quality_features``; integer-ratio
  comparisons so another engine replays the decision exactly),
* deterministic stratified sampling (``sampling.sample_bucket``: sha256
  bucket vs a per-language per-mille rate).

Everything stays in one Catalyst plan: quality and sampling are map-side
expressions over the documents scan; only the dedup stage shuffles.  The
output keeps EVERY input document with its flags; downstream selects
``WHERE selected`` (and Parquet/Iceberg stats prune the rest on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textfns as tf
from .dedup import canonical_docs
from .sampling import sample_bucket

# quality gate defaults — integer-exact so the DuckDB oracle replays them
MIN_TOKENS = 5
MAX_TOKENS = 5000
MIN_ALPHA_PER_MILLE = 300  # n_alpha / n_chars >= 0.3


def curate_corpus(
    docs: DataFrame,
    rates: dict[str, int],
    threshold: float = 0.8,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    min_alpha_per_mille: int = MIN_ALPHA_PER_MILLE,
    default_rate: int = 0,
    salt: str = "smpl",
    benchmark: DataFrame | None = None,
    decontam_ngram: int = 8,
) -> DataFrame:
    """Per-document curation decision row.

    Returns every input document with:
    (doc_id, lang, n_tokens, n_chars, n_alpha, is_canonical, quality_ok,
    bucket, selected) where ``selected`` = canonical AND quality AND
    sampled-into-the-mix.  Deterministic at any parallelism.

    When ``benchmark`` is given, a ``contaminated`` flag (decontam.py
    eval-set n-gram collision) is added and folded into ``selected``; the
    join strategy is left to AQE (the hit list is corpus-bounded, so a
    forced broadcast could OOM on a heavily contaminated corpus).
    """
    qf = tf.quality_features(F.col("text"))
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == value, F.lit(int(r))).otherwise(rate)

    flagged = docs.select(
        "doc_id",
        "lang",
        qf["n_tokens"].alias("n_tokens"),
        qf["n_chars"].alias("n_chars"),
        qf["n_alpha"].alias("n_alpha"),
        sample_bucket(F.col("doc_id"), salt=salt),
        rate.alias("_rate"),
    ).withColumn(
        "quality_ok",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("n_alpha") * 1000 >= F.col("n_chars") * min_alpha_per_mille),
    )

    decisions = canonical_docs(docs, threshold=threshold).select(
        "doc_id", "is_canonical"
    )

    out = flagged.join(decisions, "doc_id").withColumn(
        "selected",
        F.col("is_canonical")
        & F.col("quality_ok")
        & (F.col("bucket") < F.col("_rate")),
    )
    extra: list[str] = []
    if benchmark is not None:
        from .decontam import contamination_report

        hits = contamination_report(docs, benchmark, n=decontam_ngram).select(
            "doc_id", F.lit(True).alias("contaminated")
        )
        # no broadcast hint: hits is bounded by the CORPUS (every doc that
        # overlaps the benchmark), not by the benchmark — a heavily
        # contaminated 100 TB corpus makes it arbitrarily large.  AQE picks
        # broadcast at runtime when the report actually is small.
        out = (
            out.join(hits, "doc_id", "left")
            .withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
            .withColumn("selected", F.col("selected") & ~F.col("contaminated"))
        )
        extra = ["contaminated"]
    return out.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_chars",
        "n_alpha",
        "is_canonical",
        "quality_ok",
        "bucket",
        *extra,
        "selected",
    )


def domain_stats(
    docs: DataFrame,
    domain_col: str = "source",
    min_docs: int = 10,
    min_quality_per_mille: int = 500,
    blocklist: list[str] | None = None,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    min_alpha_per_mille: int = MIN_ALPHA_PER_MILLE,
) -> DataFrame:
    """Per-domain curation rollup with a keep/drop verdict (RefinedWeb-style
    URL/source filtering, lifted from per-document to per-domain).

    A web-scale corpus drops whole domains, not just documents: spam and
    boilerplate concentrate by origin, and a domain whose sampled documents
    mostly fail the quality gate is cheaper to drop wholesale than to score
    document-by-document forever.  One hash-agg shuffle keyed on the domain
    (quality flags are map-side Column exprs fused into the scan; partial
    aggregation collapses each domain within every partition first, so the
    exchange carries |domains| rows — domains are many orders of magnitude
    fewer than documents).  ``keep`` is integer-exact and blocklist-aware:

        n_docs >= min_docs
        AND n_quality * 1000 >= n_docs * min_quality_per_mille
        AND domain NOT IN blocklist

    The blocklist is a plan literal (an IN-list), not a join: real
    blocklists are 10^4-10^6 entries — at that size pass a frame and
    anti-join instead (broadcast; same semantics).
    """
    qf = tf.quality_features(F.col("text"))
    quality_ok = (
        (qf["n_tokens"] >= min_tokens)
        & (qf["n_tokens"] <= max_tokens)
        & (qf["n_alpha"] * 1000 >= qf["n_chars"] * min_alpha_per_mille)
    )
    agg = (
        docs.select(
            F.col(domain_col).alias("domain"),
            qf["n_tokens"].alias("_nt"),
            quality_ok.cast("long").alias("_q"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens_total"),
            F.sum("_q").cast("long").alias("n_quality"),
        )
    )
    blocked = F.col("domain").isin(*blocklist) if blocklist else F.lit(False)
    return agg.select(
        "domain",
        "n_docs",
        "n_tokens_total",
        "n_quality",
        # integer division (no double round-trip): bit-exact in DuckDB via //
        F.expr("(n_quality * 1000) div n_docs").alias("quality_per_mille"),
        (
            (F.col("n_docs") >= min_docs)
            & (F.col("n_quality") * 1000 >= F.col("n_docs") * min_quality_per_mille)
            & ~blocked
        ).alias("keep"),
    )


def corpus_mixture(
    docs: DataFrame,
    strata: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Training-mix planning report: per-stratum shares of the corpus.

    Before building a mix (``sampling.stratified_bernoulli`` rates), a
    pipeline needs to know what it HAS: docs, whitespace tokens, and bytes
    per (lang, source) stratum, plus each stratum's integer per-mille share
    of the corpus doc and token budgets.

    Plan shape: one map-side-partial aggregation over the corpus scan (the
    only corpus-sized stage), then the shares are a window over the
    aggregated stratum rows — thousands at most, never the corpus.  Shares
    use integer division so any engine replays them bit-exactly.
    """
    toks = tf.tokens(F.col(text_col))
    agg = docs.groupBy(*[F.col(s) for s in strata]).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
    )
    w = Window.partitionBy()
    return agg.select(
        *strata,
        "n_docs",
        "n_tokens",
        "n_chars",
        F.expr("n_docs * 1000").cast("long").alias("_d"),
        F.expr("n_tokens * 1000").cast("long").alias("_t"),
        F.sum("n_docs").over(w).alias("_td"),
        F.sum("n_tokens").over(w).alias("_tt"),
    ).select(
        *strata,
        "n_docs",
        "n_tokens",
        "n_chars",
        F.expr("_d DIV _td").alias("doc_share_pm"),
        F.expr("_t DIV _tt").alias("token_share_pm"),
    )
