"""Keyword search (BM25-shaped ranking) over the documents corpus (ours).

A training-data pipeline needs corpus search for curation forensics —
"which documents match this contamination probe / this quality phrase?" —
long before it needs a serving index.  This operator ranks documents for a
small batch of keyword queries in ONE corpus pass, Spark-first:

* document length and tokenization are map-only Column expressions (no
  Python, no shuffle);
* only postings whose term appears in SOME query survive — the query-term
  table broadcasts, so the corpus-wide token explode is filtered map-side
  and the ONLY corpus-sized shuffle is the (query, doc, term) tf hash-agg
  over that sliver;
* document frequencies come from the same matched sliver (a term's df only
  matters if the term is queried).

Scoring is the BM25 shape with RATIONAL, scaled-integer arithmetic —
``k1 = 1.2``/``b = 0.75`` as per-mille constants, and a rational idf
``1000·(N−df+1)/(df+1)`` in place of Robertson's ``ln``-idf — every
division is int64 floor-div, so scores are bit-identical at any
parallelism AND across engines (the DuckDB oracle replays them
hash-exact; a float ``ln`` can differ in the last ulp between libm
implementations).  The rational idf is monotone in the same document
frequencies; swap in ln-idf on deployments where one engine is the truth.
int64 headroom: ``idf_milli ≤ 1000·N`` and ``tf_part_milli ≤ 2200``, so
scores stay below 2^63 for corpora under ~4·10^14 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1_PERMILLE = 1200  # k1 = 1.2
B_PERMILLE = 750    # b = 0.75
TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens_col(text):
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT), lambda x: x != "")


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per query: (query_id, doc_id, score, rank).

    ``queries`` is a list of (query_id, text); query terms are deduped
    (standard bag-of-distinct-terms BM25).  Ties break on ascending
    doc_id — fully deterministic output.
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        sorted(
            {
                (qid, term)
                for qid, text in queries
                for term in text.lower().split()
                if term
            }
        ),
        "query_id string, term string",
    )

    # map-only: per-doc token count (document length); totals is a one-row
    # broadcastable aggregate
    totals = docs.select(
        F.size(_tokens_col(F.col("text"))).cast("long").alias("dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )

    # corpus postings, filtered map-side to queried terms by the broadcast
    # join — only the matched sliver ever shuffles.  dl rides along with
    # each posting (computed in the same projection), so no corpus-wide
    # (doc_id -> dl) join is ever needed.
    matched = (
        docs.select(
            "doc_id",
            F.size(_tokens_col(F.col("text"))).cast("long").alias("dl"),
            F.explode(_tokens_col(F.col("text"))).alias("term"),
        )
        .join(F.broadcast(qterms), "term")
    )
    tf = matched.groupBy("query_id", "doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.first("dl").alias("dl"),
    )
    # document frequency from the (tiny) tf relation — the corpus explode
    # runs ONCE; (doc, term) pairs are distinct within it regardless of
    # how many queries share the term
    dfreq = (
        tf.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        # norm_permille = 1000·dl/avgdl computed as ONE exact division
        .withColumn(
            "norm_permille",
            F.expr("(1000 * n_docs * dl) div total_tokens"),
        )
        .withColumn(
            "bnorm_permille",
            F.expr(
                f"(1000 - {B_PERMILLE}) + ({B_PERMILLE} * norm_permille) div 1000"
            ),
        )
        .withColumn(
            "tf_part_milli",
            F.expr(
                f"(1000 * tf * (1000 + {K1_PERMILLE})) div "
                f"(1000 * tf + ({K1_PERMILLE} * bnorm_permille) div 1000)"
            ),
        )
        .withColumn("idf_milli", F.expr("(1000 * (n_docs - df + 1)) div (df + 1)"))
        .withColumn("term_score", F.expr("idf_milli * tf_part_milli"))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").cast("long").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", F.col("rank").cast("int").alias("rank"))
    )


def oracle_bm25_sql(
    documents_rel: str, queries: list[tuple[str, str]], k: int = 10
) -> str:
    """DuckDB replay — same tokenization, same scaled-integer formulas
    (``//`` = Spark's ``div`` on positive int64), same tie-break."""
    qvals = ",\n        ".join(
        f"('{qid}', '{term}')"
        for qid, term in sorted(
            {
                (qid, t)
                for qid, text in queries
                for t in text.lower().split()
                if t
            }
        )
    )
    return f"""
WITH q(query_id, term) AS (VALUES
        {qvals}),
dl AS (
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(text),
                '{TOKEN_SPLIT}'), x -> x <> '')) AS BIGINT) AS dl
    FROM {documents_rel}
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS total_tokens
    FROM dl
),
tok AS (
    SELECT doc_id, t.term
    FROM {documents_rel},
         UNNEST(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}')) AS t(term)
    WHERE t.term <> ''
),
m AS (SELECT q.query_id, tok.doc_id, tok.term FROM tok JOIN q USING (term)),
tf AS (
    SELECT query_id, doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM m GROUP BY query_id, doc_id, term
),
dfreq AS (
    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM m GROUP BY term
),
scored AS (
    SELECT tf.query_id, tf.doc_id,
           ((1000 * (tot.n_docs - dfreq.df + 1)) // (dfreq.df + 1))
           * ((1000 * tf.tf * (1000 + {K1_PERMILLE})) //
              (1000 * tf.tf +
               ({K1_PERMILLE} * ((1000 - {B_PERMILLE}) +
                ({B_PERMILLE} * ((1000 * tot.n_docs * dl.dl) // tot.total_tokens)) // 1000))
               // 1000)) AS term_score
    FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN tot
),
agg AS (
    SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score
    FROM scored GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
           ) AS INT) AS rank
    FROM agg
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {k}
"""
