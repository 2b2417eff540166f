"""spark-submit driver script (north_rule: "runs via spark-submit --py-files").

spark-submit takes a SCRIPT, not a module (`-m` is a python flag, not a
spark-submit one), so this thin file is the submittable entry: the package
itself ships in the --py-files zip and is imported from there on every
executor.

    zip -r pipeline.zip breg_dcat_harvester_spark
    spark-submit --master <cluster> --py-files pipeline.zip \
        scripts/submit_harvest.py harvest \
        --transcripts <path-or-iceberg-table> --out <dir> [--resume RUN_ID]

All subcommands of breg_dcat_harvester_spark.cli are available (harvest /
facets / search / schedule).  Exercised for real by
tests/test_spark_submit.py: the package is zipped, the repo dir is NOT on
sys.path in the child, and the harvest runs end-to-end from the zip.
"""

import sys

from breg_dcat_harvester_spark import cli

if __name__ == "__main__":
    rc = cli.main(sys.argv[1:])
    # surface the effective master on stderr: proof the submitted --master
    # was respected (session.get_spark must not clobber it)
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        print(f"spark.master={active.sparkContext.master}", file=sys.stderr)
        print(
            "spark.speculation="
            f"{active.conf.get('spark.speculation', 'false')}",
            file=sys.stderr,
        )
    sys.exit(rc)
