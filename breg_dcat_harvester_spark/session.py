"""SparkSession factory with scale-appropriate defaults.

Tuned for the target deployment (multi-executor cluster over ~100 TB of
transcripts) while remaining correct on local[N]:

* AQE on (runtime coalescing + skew-join splitting) — the reference has no
  optimizer at all (it ships SPARQL text to Virtuoso); on Spark, AQE plus the
  explicit salting helpers in ``functions.skew`` are our skew story.
* Arrow enabled — every Python-side operator in this engine is a pandas/Arrow
  UDF (``input_hint``: "no per-row Python").
* ``spark.sql.shuffle.partitions`` defaults to a small-local value; the
  cluster entrypoint (plans/harvest.py CLI) scales it to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "breg-dcat-harvester-spark",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` locally; on a
    real cluster, spark-submit supplies the master and this arg stays None.
    """
    # Executor python workers must be able to import this package (its
    # pandas-UDF closures reference module-level functions).  On a real
    # cluster spark-submit ships it via --py-files; in local mode the worker
    # inherits PYTHONPATH from the driver process, so pin our parent dir.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    builder = SparkSession.builder.appName(app_name)
    # Under spark-submit the driver python is launched by PythonRunner and
    # talks to an already-running gateway (PYSPARK_GATEWAY_PORT is set) whose
    # conf carries the submitted --master; setting one here would CLOBBER it
    # (a `--master yarn` job silently running local[*]).  Only default the
    # master when we own the JVM launch.
    in_submit = "PYSPARK_GATEWAY_PORT" in os.environ or os.environ.get(
        "SPARK_GRAFT_IN_CLUSTER"
    )
    if master is None and not in_submit:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": shuffle_partitions
        or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # deterministic timestamp behaviour across engines (duckdb oracle)
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
        # keep stdout/stderr clean: the bench contract is machine-parsed JSON
        # lines, and \r-progress spam can push them out of a log tail
        "spark.ui.showConsoleProgress": "false",
    }
    # S5 straggler guard, cluster half: re-launch suspiciously slow tasks on
    # another executor (the reference bounds per-source work with request/
    # parse timeouts, scheduler.py; our in-task half is the max_doc_chars
    # fail-fast in sources/rdf_parse.parse_rdf_docs).  Only under
    # spark-submit — in local mode every "copy" shares the same JVM and
    # speculation just duplicates work.
    if in_submit:
        conf["spark.speculation"] = "true"
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
