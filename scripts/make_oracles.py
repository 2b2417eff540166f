"""Rebuild engine-independent oracle fixtures DuckDB cannot express.

* dedup_simhash_<sf>.parquet — expected SimHash near-dup pairs, computed by
  a pure-Python replay (functions/hashing_ref.py) of the public xxHash64 +
  SimHash definitions, brute-forcing ALL pairs (no blocking): the Spark
  operator's pigeonhole blocking is lossless by construction, so its output
  must equal this set exactly.

The builder lives in ``breg_dcat_harvester_spark/fixtures.py`` (the
contract queries regenerate lazily via ``ensure_simhash_oracle``); this
script forces a rebuild.

Run:  python scripts/make_oracles.py [sf0.01 sf0.001 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from breg_dcat_harvester_spark import fixtures as fx  # noqa: E402

if __name__ == "__main__":
    for sf in sys.argv[1:] or ["sf0.001", "sf0.01"]:
        path = os.path.join(fx.ORACLE_DIR, f"dedup_simhash_{sf}.parquet")
        if os.path.exists(path):
            os.remove(path)
        print("wrote", fx.ensure_simhash_oracle(sf))
