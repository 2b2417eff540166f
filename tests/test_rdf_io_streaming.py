"""RDF serialization round-trip + incremental streaming harvest."""

import pytest

from breg_dcat_harvester_spark.operators.extract import extract_edges
from breg_dcat_harvester_spark.operators.merge import merge_triples
from breg_dcat_harvester_spark.sources import rdf_io
from breg_dcat_harvester_spark.streaming.incremental import (
    incremental_harvest,
    read_merged,
)


def test_data_types_enum_parity():
    """models.py:9-27 verbatim values."""
    assert [d.value for d in rdf_io.DataTypes] == ["xml", "turtle", "nt", "json-ld"]
    assert rdf_io.mime_for(rdf_io.DataTypes.JSON_LD) == "application/ld+json"
    assert rdf_io.find_data_type("turtle") is rdf_io.DataTypes.TURTLE
    with pytest.raises(ValueError):
        rdf_io.find_data_type("n3")
    assert rdf_io.PARSE_TRY_FORMATS == ["xml", "turtle", "json-ld", "nt"]


def test_sniff_format(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ('<?xml version="1.0"?><rdf:RDF/>',),
            ("@prefix dcat: <http://x> .",),
            ('{"@context": {}}',),
            ("<http://a> <http://b> <http://c> .",),
            ("plain text",),
        ],
        "doc string",
    )
    got = [r.fmt for r in df.select(rdf_io.sniff_format(F.col("doc")).alias("fmt")).collect()]
    assert got == ["xml", "turtle", "json-ld", "nt", None]


def test_ntriples_round_trip(spark, golden_df):
    edges = merge_triples(extract_edges(golden_df, emit_provenance=False))
    nt = rdf_io.to_ntriples(edges)
    lines = [r.ntriple for r in nt.collect()]
    assert len(lines) == 33 and all(l.endswith(" .") for l in lines)
    parsed = rdf_io.parse_ntriples(nt.withColumnRenamed("ntriple", "value"))
    orig = {(r.subj, r.pred, r.obj, r.obj_kind, r.lang, r.dtype) for r in edges.collect()}
    back = {(r.subj, r.pred, r.obj, r.obj_kind, r.lang, r.dtype) for r in parsed.collect()}
    assert back == orig


def test_incremental_harvest_exactly_once(spark, tmp_path, small_transcripts):
    """T1/T2: AvailableNow drains new files once; re-trigger with no new data
    is a no-op; incremental result == batch result (set semantics)."""
    src = tmp_path / "stream_src"
    out = str(tmp_path / "edges_stream")
    ckpt = str(tmp_path / "ckpt")

    first = small_transcripts.filter("conv_id < 'conv-00000050'")
    second = small_transcripts.filter("conv_id >= 'conv-00000050'")
    first.write.mode("overwrite").parquet(str(src))

    assert incremental_harvest(spark, str(src), out, ckpt) >= 1
    n1 = read_merged(spark, out).count()
    assert n1 > 0

    # re-run with no new data: no growth (exactly-once)
    incremental_harvest(spark, str(src), out, ckpt)
    assert read_merged(spark, out).count() == n1

    # append the second half; incremental total == full-batch total
    second.write.mode("append").parquet(str(src))
    incremental_harvest(spark, str(src), out, ckpt)
    batch = merge_triples(extract_edges(small_transcripts)).count()
    assert read_merged(spark, out).count() == batch
