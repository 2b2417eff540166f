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

    The corpus is scanned ONCE into a (doc_id, dl, hits) sliver that is
    cached for the totals aggregate and the tf relation (hits are the
    query-term occurrences — rare by construction, so the cached rows are
    ~Θ(16 bytes)/doc; drop the cache hint on corpora where even that is
    too big and pay a second scan instead).  Query terms and the
    term→queries routing are LITERAL structures — no joins at all before
    the tf aggregation.
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    # query text tokenizes with the SAME split the documents use: a term
    # like "hash-join" must become ("hash", "join"), not a punctuation-
    # carrying token that can never match any document token
    import re

    _tok = re.compile(TOKEN_SPLIT)
    pairs = sorted(
        {
            (qid, term)
            for qid, text in queries
            for term in _tok.split(text.lower())
            if term
        }
    )
    terms = sorted({t for _q, t in pairs})
    # term -> [query_ids]: a LITERAL map, so routing a matched term to its
    # queries is a map-side explode — no join, no broadcast build
    by_term: dict[str, list[str]] = {}
    for qid, t in pairs:
        by_term.setdefault(t, []).append(qid)
    q_map = F.map_from_arrays(
        F.lit(terms), F.lit([sorted(by_term[t]) for t in terms])
    )

    # ONE corpus scan: per-doc length + the (rare) query-term hits, kept
    # as a tiny cached sliver that both the totals aggregate and the tf
    # relation read — the corpus is never re-scanned
    per_doc = docs.select(
        "doc_id",
        F.size(_tokens_col(F.col("text"))).cast("long").alias("dl"),
        F.filter(
            _tokens_col(F.col("text")),
            lambda t: t.isin(*terms) if len(terms) > 1 else t == terms[0],
        ).alias("hits"),
    ).cache()
    totals = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    tf_doc = (
        per_doc.filter(F.size("hits") > 0)
        .select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.first("dl").alias("dl"),
        )
    )
    # fan each (doc, term) out to the queries containing the term —
    # map-side literal-map explode
    tf = tf_doc.select(
        "doc_id", "term", "tf", "dl",
        F.explode(F.element_at(q_map, F.col("term"))).alias("query_id"),
    )
    dfreq = tf_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
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
    import re

    _tok = re.compile(TOKEN_SPLIT)
    qvals = ",\n        ".join(
        f"('{qid}', '{term}')"
        for qid, term in sorted(
            {
                (qid, t)
                for qid, text in queries
                for t in _tok.split(text.lower())
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
