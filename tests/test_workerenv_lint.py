"""Structural lint: every package module that crosses the Python boundary
(mapInPandas / mapInArrow / applyInPandas / pandas_udf) must reference the
native-thread pinning helper (pin_native_threads or the pinned decorator).

Rationale (functions/workerenv.py): pyarrow/BLAS pools default to
hardware_concurrency per worker; at 32 workers that is a measured 1.5x
throughput collapse.  A result-correctness test can never catch a missing
pin — only this structural check can.
"""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "breg_dcat_harvester_spark")
BOUNDARY = re.compile(r"\.(mapInPandas|mapInArrow|applyInPandas(WithState)?)\(|pandas_udf\(")
PIN = re.compile(r"pin_native_threads|\bpinned\b")


def test_every_python_boundary_module_pins_native_threads():
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            src = open(path).read()
            if BOUNDARY.search(src) and not PIN.search(src):
                offenders.append(os.path.relpath(path, PKG))
    assert not offenders, (
        f"modules with a Python boundary but no native-thread pinning: "
        f"{offenders} — wrap the UDF body with functions.workerenv.pinned "
        f"or call pin_native_threads() at its top"
    )
