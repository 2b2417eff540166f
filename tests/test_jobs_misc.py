"""Pure-python control-plane parity checks (no Spark session needed)."""

import datetime as dt

from breg_dcat_harvester_spark.plans.jobs import next_fire_date


def test_next_fire_date_ceiling_math():
    """scheduler.py:159-169 semantics: ceil((now-base)/s)*s + base."""
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    assert next_fire_date(base, 3600, base) == base
    # 10 minutes in -> next boundary is base + 1h
    assert next_fire_date(base, 3600, base + dt.timedelta(minutes=10)) == base + dt.timedelta(hours=1)
    # exactly on a boundary -> that boundary
    assert next_fire_date(base, 3600, base + dt.timedelta(hours=2)) == base + dt.timedelta(hours=2)
    # default harvest cadence: 432000 s (5 days, scheduler.py:25)
    nxt = next_fire_date(base, 432_000, base + dt.timedelta(days=7))
    assert nxt == base + dt.timedelta(days=10)
