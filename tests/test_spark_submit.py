"""Real `spark-submit --py-files` smoke test (north_rule run-mode clause).

The package is zipped, the repo root is NOT importable in the child (cwd and
PYTHONPATH point elsewhere), and the harvest runs end-to-end with the package
imported from the zip — the exact deployment shape of
``scripts/submit_harvest.py``'s docstring.  Also proves session.get_spark
does not clobber the submitted ``--master`` (the child asserts it).
"""

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_harvest(tmp_path):
    # tiny deterministic transcript corpus (the datagen guarantees the
    # extractor's mention grammar is present, so num_triples > 0)
    from breg_dcat_harvester_spark.datagen import (
        gen_transcripts,
        write_transcripts_parquet,
    )

    tpath = str(tmp_path / "transcripts")
    write_transcripts_parquet(gen_transcripts(200), tpath)

    zpath = tmp_path / "pipeline.zip"
    pkg = REPO / "breg_dcat_harvester_spark"
    with zipfile.ZipFile(zpath, "w") as zf:
        for f in pkg.rglob("*.py"):
            zf.write(f, f.relative_to(REPO))

    out_dir = str(tmp_path / "kg")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    # child runs from tmp_path: the repo tree is reachable only via the zip
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--py-files",
            str(zpath),
            "--conf",
            "spark.ui.enabled=false",
            str(REPO / "scripts" / "submit_harvest.py"),
            "harvest",
            "--transcripts",
            tpath,
            "--out",
            out_dir,
            "--buckets",
            "4",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert result["num_triples"] > 0
    assert {s["stage"] for s in result["stages"]} >= {
        "edges_raw",
        "triples",
        "valid_triples",
        "links",
        "cc_labels",
        "edges",
        "nodes",
    }
    # the submitted master was respected, not clobbered to local[*]
    # (PythonRunner merges the python child's stderr into spark-submit's
    # stdout, so the echo lands there)
    assert "spark.master=local[2]" in proc.stdout
    # S5 cluster half: speculative execution is on under spark-submit
    assert "spark.speculation=true" in proc.stdout
