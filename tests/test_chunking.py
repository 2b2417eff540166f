"""Sliding-window document chunking (operators/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators.chunking import chunk_documents


def test_chunk_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk_tokens=64, overlap=16).collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts at 0, 48, 96 (stride 48 while < 100)
    assert [(r.chunk_start, r.n_toks) for r in rows] == [(0, 64), (48, 52), (96, 4)]
    assert rows[0].chunk_text.split(" ")[0] == "t0"
    # consecutive chunks share the overlap region
    a, b = rows[0].chunk_text.split(" "), rows[1].chunk_text.split(" ")
    assert a[48:] == b[:16]
    # no token dropped: union of chunks covers the doc
    assert b[-1] == "t99" or rows[2].chunk_text.split(" ")[-1] == "t99"


def test_chunk_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    assert len(rows) == 1
    assert (rows[0].chunk_idx, rows[0].n_toks, rows[0].chunk_text) == (0, 3, "a b c")


def test_chunk_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=16, overlap=16)


def test_chunk_plan_is_map_only(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
