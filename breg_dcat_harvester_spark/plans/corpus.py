"""The training-corpus curation pipeline — the documents-side twin of
``plans/harvest.py::run_harvest``.

``run_curation`` composes the training-data operator family into ONE staged
DataFrame DAG with per-stage snapshot checkpoints and the same resume
protocol as the harvest (north_rule: resumable from snapshot checkpoints,
per-partition lineage + metrics):

    decisions -> selected -> packing -> pack_segments -> shards
              -> shard_stats + runs/metrics rows

* ``decisions``     — one auditable curation row per input document
  (``curation.curate_corpus``: canonical near-dup verdict, integer-exact
  quality gate, stratified sampling bucket, optional benchmark
  decontamination flag).
* ``selected``      — the surviving documents (semi-join on the decision
  rows; full text carried forward exactly once).
* ``packing``       — concatenate-and-cut LM packing placement via the
  distributed prefix sum (``packing.pack_sequences``).
* ``pack_segments`` — the per-pack segment table a training reader consumes
  (``packing.pack_manifest``).
* ``shards``        — deterministic training-order shuffle
  (``packing.shuffle_shards``: sha256 shard bucket + within-shard hash
  order, map-only, resume-stable) and ``shard_stats`` its manifest.

Every stage commits a snapshot table under ``cfg.out_dir`` and records its
snapshot id in the runs registry; a re-run with the same ``run_id`` reads
completed stages back instead of recomputing (pytest-gated, like the
harvest resume).  At 10^12-turn scale each arrow is one job whose
restart cost is bounded by its own stage, not the pipeline.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import curate_corpus
from ..operators.packing import (
    pack_manifest,
    pack_sequences,
    shard_manifest,
    shuffle_shards,
)
from ..storage import table_for
from .jobs import MetricsLog, RunLog


@dataclass
class CurationConfig:
    out_dir: str
    rates: dict[str, int] = field(default_factory=lambda: {"en": 1000})
    default_rate: int = 0
    dedup_threshold: float = 0.8
    min_tokens: int = 20
    max_tokens: int = 1_000_000
    min_alpha_per_mille: int = 820
    seq_len: int = 512
    n_shards: int = 32
    decontam_ngram: int = 8
    extra: dict = field(default_factory=dict)


def run_curation(
    spark: SparkSession,
    docs_path: str,
    cfg: CurationConfig,
    run_id: str | None = None,
    benchmark: DataFrame | None = None,
) -> dict:
    """Execute (or resume) the curation pipeline; returns the job-result
    dict with per-stage rows/seconds and the final shard statistics."""
    run_id = run_id or f"cur-{uuid.uuid4().hex[:12]}"
    runlog = RunLog(spark, os.path.join(cfg.out_dir, "runs"))
    metrics = []

    def stage(name: str, builder):
        tbl = table_for(os.path.join(cfg.out_dir, name))
        prior = runlog.snapshot_for(run_id, name)
        if prior:
            return tbl.read(spark, prior)
        t0 = time.time()
        runlog.record(run_id, name, "started")
        try:
            df = builder()
            sid = tbl.write(df, mode="overwrite")
            out = tbl.read(spark, sid)
            n = out.count()
            metrics.append((name, n, time.time() - t0))
            runlog.record(run_id, name, "finished", snapshot_id=sid, num_triples=n)
            return out
        except Exception as ex:
            runlog.record(run_id, name, "failed", exc_info=repr(ex))
            raise

    docs = spark.read.parquet(docs_path)

    decisions = stage(
        "decisions",
        lambda: curate_corpus(
            docs,
            rates=cfg.rates,
            threshold=cfg.dedup_threshold,
            min_tokens=cfg.min_tokens,
            max_tokens=cfg.max_tokens,
            min_alpha_per_mille=cfg.min_alpha_per_mille,
            default_rate=cfg.default_rate,
            benchmark=benchmark,
            decontam_ngram=cfg.decontam_ngram,
        ),
    )

    selected = stage(
        "selected",
        lambda: docs.join(
            decisions.filter(F.col("selected")).select("doc_id"),
            "doc_id",
            "left_semi",
        ),
    )

    packing = stage(
        "packing", lambda: pack_sequences(selected, seq_len=cfg.seq_len)
    )
    segments = stage(
        "pack_segments", lambda: pack_manifest(packing, seq_len=cfg.seq_len)
    )
    shards = stage(
        "shards", lambda: shuffle_shards(selected, n_shards=cfg.n_shards)
    )
    shard_stats = stage("shard_stats", lambda: shard_manifest(shards))

    # lineage is keyed to the run: write it whenever THIS run_id has no
    # partitions row yet (not merely when some stage ran fresh — a crash
    # between the last stage commit and this write must be repairable by
    # resume, else the run's shard lineage is lost forever)
    metricslog = MetricsLog(spark, os.path.join(cfg.out_dir, "metrics"))
    have_lineage = metricslog.table.exists() and (
        metricslog.read()
        .filter((F.col("run_id") == run_id) & (F.col("stage") == "shards"))
        .limit(1)
        .count()
        > 0
    )
    if not have_lineage:
        metricslog.record_partitions(run_id, "shards", shards)

    # row counts were already computed inside each fresh stage() — reuse
    # them instead of re-running count jobs; only a resumed stage (absent
    # from `metrics`) needs a count of its read-back snapshot
    stage_rows = {s: n for s, n, _ in metrics}
    n_input = stage_rows.get("decisions")  # one decision row per input doc
    n_input = docs.count() if n_input is None else n_input
    n_selected = stage_rows.get("selected")
    n_selected = selected.count() if n_selected is None else n_selected
    runlog.record(run_id, "job", "finished", num_triples=n_selected)
    return {
        "run_id": run_id,
        "num_input_docs": n_input,
        "num_selected": n_selected,
        "num_packs": segments.select("stratum", "pack_id").distinct().count(),
        "num_shards": stage_rows.get("shard_stats", None) or shard_stats.count(),
        "stages": [
            {"stage": s, "rows": n, "seconds": round(dt, 3)} for s, n, dt in metrics
        ],
    }
