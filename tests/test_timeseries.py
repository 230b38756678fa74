"""Gap-fill resampling (operators.timeseries.resample_ffill,
X-TS-GAPFILL) vs a Python reference: grid alignment, forward fill,
leading-edge NULL, single-point series, and multi-key independence."""

from __future__ import annotations

import random

from snowflake_azure_etl_spark.operators.timeseries import resample_ffill


def _py_ffill(rows, step):
    bykey = {}
    for k, t, v in rows:
        bykey.setdefault(k, []).append((t, v))
    out = []
    for k, obs in bykey.items():
        obs.sort()
        lo = (min(t for t, _ in obs) // step) * step
        hi = (max(t for t, _ in obs) // step) * step
        g = lo
        while g <= hi:
            at_or_before = [(t, v) for t, v in obs if t <= g]
            if at_or_before:
                t, v = at_or_before[-1]
                out.append((k, g, t, float(v)))
            else:
                out.append((k, g, None, None))
            g += step
    return sorted(out)


def _run(spark, rows, step):
    df = spark.createDataFrame(rows, "k bigint, t bigint, v double")
    got = resample_ffill(df, ["k"], "t", "v", step)
    return sorted((r["k"], r["grid_ts"], r["src_ts"], r["value"])
                  for r in got.collect())


def test_forward_fill_matches_reference(spark):
    rows = [(1, 103, 5.0), (1, 250, 7.0), (1, 460, 9.0),
            (2, 90, 1.0), (2, 450, 2.0)]
    assert _run(spark, rows, 100) == _py_ffill(rows, 100)


def test_leading_grid_point_is_null_unless_aligned(spark):
    rows = [(1, 150, 3.0)]   # first grid point 100 < first obs 150
    got = _run(spark, rows, 100)
    assert got == [(1, 100, None, None)]
    rows2 = [(1, 200, 3.0)]  # exactly aligned: same-instant obs included
    assert _run(spark, rows2, 100) == [(1, 200, 200, 3.0)]


def test_random_series_match_reference(spark):
    rng = random.Random(11)
    rows = [(rng.randrange(4), rng.randrange(1000), float(rng.randrange(50)))
            for _ in range(60)]
    rows = list({(k, t): v for k, t, v in rows}.items())
    rows = [(k, t, v) for (k, t), v in rows]   # unique per (key, time)
    for step in (64, 250):
        assert _run(spark, rows, step) == _py_ffill(rows, step)


def test_gap_longer_than_many_steps_carries_value(spark):
    rows = [(1, 0, 1.0), (1, 1000, 2.0)]
    got = _run(spark, rows, 100)
    assert len(got) == 11
    assert all(r[3] == 1.0 for r in got[:-1]) and got[-1][3] == 2.0


def _py_interp(rows, step):
    bykey = {}
    for k, t, v in rows:
        bykey.setdefault(k, []).append((t, float(v)))
    out = []
    for k, obs in bykey.items():
        obs.sort()
        lo = (min(t for t, _ in obs) // step) * step
        hi = (max(t for t, _ in obs) // step) * step
        for g in range(lo, hi + 1, step):
            prev = [(t, v) for t, v in obs if t <= g]
            nxt = [(t, v) for t, v in obs if t > g]
            if not prev:
                out.append((k, g, None))
            elif not nxt:
                out.append((k, g, prev[-1][1]))
            else:
                pt, pv = prev[-1]
                nt, nv = nxt[0]
                out.append((k, g, pv + (nv - pv) * float(g - pt)
                            / float(nt - pt)))
    return sorted(out)


def test_interp_matches_reference(spark):
    from snowflake_azure_etl_spark.operators.timeseries import (
        resample_interp)
    rows = [(1, 100, 10.0), (1, 400, 40.0), (1, 450, 20.0),
            (2, 50, 5.0), (2, 51, 7.0)]
    df = spark.createDataFrame(rows, "k bigint, t bigint, v double")
    got = sorted((r["k"], r["grid_ts"], r["value"])
                 for r in resample_interp(df, ["k"], "t", "v", 100)
                 .collect())
    assert got == _py_interp(rows, 100)


def test_interp_at_observation_instant_is_exact(spark):
    from snowflake_azure_etl_spark.operators.timeseries import (
        resample_interp)
    rows = [(1, 100, 3.0), (1, 300, 9.0)]
    df = spark.createDataFrame(rows, "k bigint, t bigint, v double")
    got = {r["grid_ts"]: r["value"]
           for r in resample_interp(df, ["k"], "t", "v", 100).collect()}
    assert got == {100: 3.0, 200: 6.0, 300: 9.0}


def test_interp_random_matches_reference(spark):
    import random
    from snowflake_azure_etl_spark.operators.timeseries import (
        resample_interp)
    rng = random.Random(5)
    rows = list({(rng.randrange(3), rng.randrange(500)):
                 float(rng.randrange(100)) for _ in range(40)}.items())
    rows = [(k, t, v) for (k, t), v in rows]
    df = spark.createDataFrame(rows, "k bigint, t bigint, v double")
    got = sorted((r["k"], r["grid_ts"], r["value"])
                 for r in resample_interp(df, ["k"], "t", "v", 60)
                 .collect())
    assert got == _py_interp(rows, 60)


def test_null_valued_observation_is_no_observation(spark):
    """A NULL-valued obs must neither advance src_ts (ffill) nor
    supply an interpolation endpoint — the carried (value, src) pair
    stays synchronized (review finding r7)."""
    from snowflake_azure_etl_spark.operators.timeseries import (
        resample_interp)
    rows = [(1, 100, 5.0), (1, 300, None), (1, 400, 9.0)]
    df = spark.createDataFrame(rows, "k bigint, t bigint, v double")
    ff = {r["grid_ts"]: (r["src_ts"], r["value"])
          for r in resample_ffill(df, ["k"], "t", "v", 100).collect()}
    assert ff[300] == (100, 5.0)     # src stays at the REAL obs
    assert ff[400] == (400, 9.0)
    ip = {r["grid_ts"]: r["value"]
          for r in resample_interp(df, ["k"], "t", "v", 100).collect()}
    # interpolates 100->400 directly: grid 200 = 5 + 4*(100/300)
    assert abs(ip[200] - (5.0 + 4.0 * 100.0 / 300.0)) < 1e-12
    assert abs(ip[300] - (5.0 + 4.0 * 200.0 / 300.0)) < 1e-12
