"""Skew helpers + CLI smoke + per-partition metrics."""

import json
import subprocess
import sys

from pyspark.sql import functions as F

from breg_dcat_harvester_spark.functions import skew


def test_salted_join_equals_plain(spark):
    fact = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k string, v int",
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, name string")
    plain = fact.join(dim, "k").groupBy("k", "name").count()
    salted = skew.salted_join(fact, dim, "k", salt_mod=8).groupBy("k", "name").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
    # salt actually spreads the hot key across multiple salt values
    spread = (
        skew.with_salt(fact.filter("k = 'hot'"), "k", 8)
        .select("_salt").distinct().count()
    )
    assert spread > 1


def test_hot_keys_and_salted_collect_set(spark):
    df = spark.createDataFrame(
        [("hot", f"v{i % 17}") for i in range(300)] + [("cold", "x")],
        "k string, v string",
    )
    hot = skew.hot_keys(df, "k", min_count=100)
    assert [r.k for r in hot.collect()] == ["hot"]
    sets = {r.k: sorted(r.v_set) for r in skew.salted_collect_set(df, "k", "v").collect()}
    assert len(sets["hot"]) == 17 and sets["cold"] == ["x"]


def test_cli_harvest_and_facets(tmp_path):
    """CLI drives the full pipeline in a fresh process (spark-submit shape)."""
    from breg_dcat_harvester_spark.datagen import gen_transcripts, write_transcripts_parquet

    src = str(tmp_path / "t")
    out = str(tmp_path / "kg")
    write_transcripts_parquet(gen_transcripts(300), src)
    env_code = (
        "import sys; sys.path.insert(0, '/root/repo'); "
        "from breg_dcat_harvester_spark.cli import main; "
        f"sys.exit(main(['harvest', '--transcripts', {src!r}, '--out', {out!r}, "
        "'--impl', 'sql', '--buckets', '4']))"
    )
    res = subprocess.run(
        [sys.executable, "-c", env_code], capture_output=True, text=True, timeout=420
    )
    assert res.returncode == 0, res.stderr[-2000:]
    payload = json.loads([l for l in res.stdout.splitlines() if l.startswith("{")][-1])
    assert payload["num_triples"] > 0

    res2 = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '/root/repo'); "
         "from breg_dcat_harvester_spark.cli import main; "
         f"sys.exit(main(['facets', '--out', {out!r}]))"],
        capture_output=True, text=True, timeout=300,
    )
    assert res2.returncode == 0, res2.stderr[-2000:]
    facets = json.loads([l for l in res2.stdout.splitlines() if l.startswith("[")][-1])
    assert any(f["facet"] == "taxonomy" for f in facets)

    dest = str(tmp_path / "nt")
    res3 = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '/root/repo'); "
         "from breg_dcat_harvester_spark.cli import main; "
         f"sys.exit(main(['export', '--out', {out!r}, '--dest', {dest!r}]))"],
        capture_output=True, text=True, timeout=300,
    )
    assert res3.returncode == 0, res3.stderr[-2000:]
    exp = json.loads([l for l in res3.stdout.splitlines() if l.startswith("{")][-1])
    assert exp["num_triples"] == payload["num_triples"]
    # the .nt part files concatenate into a valid graph document: every
    # line is a triple terminated by ' .'
    import glob as _glob

    lines = []
    for p in _glob.glob(f"{dest}/part-*"):
        with open(p) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == exp["num_triples"]
    assert all(ln.endswith(" .") and ln.startswith("<") for ln in lines)


def test_partition_metrics(spark, tmp_path, small_transcripts):
    from breg_dcat_harvester_spark.plans.harvest import HarvestConfig, run_harvest
    from breg_dcat_harvester_spark.plans.jobs import MetricsLog

    src = str(tmp_path / "t")
    small_transcripts.limit(200).write.parquet(src)
    cfg = HarvestConfig(out_dir=str(tmp_path / "kg"), extract_impl="sql", num_buckets=4)
    run_harvest(spark, src, cfg, run_id="m-run")
    m = MetricsLog(spark, str(tmp_path / "kg" / "metrics")).read()
    rows = m.filter((F.col("run_id") == "m-run") & (F.col("stage") == "edges"))
    assert rows.count() > 0
    assert rows.agg(F.sum("rows_out")).head()[0] > 0


def test_cli_harvest_increment(spark, tmp_path, small_transcripts, capsys):
    """harvest-increment arg wiring: base harvest + shard fold-in via the
    CLI entry (in-process — get_spark getOrCreate's the test session);
    result equals a batch harvest over the combined corpus."""
    from breg_dcat_harvester_spark.cli import main
    from breg_dcat_harvester_spark.plans.harvest import HarvestConfig, run_harvest
    from pyspark.sql import functions as F

    is_inc = F.substring(F.sha2(F.col("conv_id"), 256), 64, 1).isin(
        "0", "1", "2", "3", "4", "5"
    )
    base_src = str(tmp_path / "tb")
    inc_src = str(tmp_path / "ti")
    all_src = str(tmp_path / "ta")
    small_transcripts.filter(~is_inc).write.parquet(base_src)
    small_transcripts.filter(is_inc).write.parquet(inc_src)
    small_transcripts.write.parquet(all_src)

    base_out = str(tmp_path / "kg_base")
    run_harvest(
        spark, base_src, HarvestConfig(out_dir=base_out, extract_impl="sql"),
        run_id="b",
    )
    rc = main([
        "harvest-increment", "--base", base_out,
        "--transcripts", inc_src, "--out", str(tmp_path / "kg_inc"),
        "--impl", "sql", "--buckets", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    batch = run_harvest(
        spark, all_src,
        HarvestConfig(out_dir=str(tmp_path / "kg_all"), extract_impl="sql"),
        run_id="a",
    )
    assert payload["num_triples"] == batch["num_triples"]
    assert payload["num_nodes"] == batch["num_nodes"]
