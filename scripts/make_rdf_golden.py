"""Rebuild the hand-derived RDF-harvest golden fixture.

The 33 golden triples (and the sample-03.jsonld third source) live in
``breg_dcat_harvester_spark/fixtures.py`` — versioned in-repo so the
oracle data survives a wiped workspace; this script just forces a rebuild
of the parquet/jsonld artifacts from them.

Run:  python scripts/make_rdf_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from breg_dcat_harvester_spark import fixtures as fx  # noqa: E402

if __name__ == "__main__":
    for path in (
        os.path.join(fx.ORACLE_DIR, "rdf_docs_golden.parquet"),
        os.path.join(fx.SAMPLE_DIR, "sample-03.jsonld"),
    ):
        if os.path.exists(path):
            os.remove(path)
    print("wrote", fx.ensure_sample_jsonld())
    print("wrote", fx.ensure_rdf_golden(), f"({len(fx.GOLDEN_TRIPLES)} triples)")
