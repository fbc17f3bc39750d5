"""Golden tests pinning the reference's exact indicator semantics
(dags/spark_job_1.py:25-54): trailing 14-ROW frame, simple-average RSI
(not Wilder's), sample stddev, NULL warm-up rows dropped, gain/loss
defaulting to 0.0 on the first row's NULL diff."""

from __future__ import annotations

import datetime as dt
import math
import statistics

import pytest

from crypto_data_pipeline_with_kafka_spark.operators.indicators import (
    compute_indicators,
    indicator_pipeline,
)

PRICES = [
    100.0, 101.5, 99.8, 102.3, 103.1, 101.0, 104.2, 105.5, 103.9, 106.1,
    107.0, 105.2, 108.3, 109.1, 107.8, 110.2, 111.0, 109.5, 112.3, 113.0,
]


def _expected():
    """Independent pure-Python recomputation of the reference semantics."""
    rows = {}
    diffs = [None] + [PRICES[i] - PRICES[i - 1] for i in range(1, len(PRICES))]
    gains = [0.0 if d is None or d <= 0 else d for d in diffs]
    losses = [0.0 if d is None or d >= 0 else -d for d in diffs]
    for i in range(len(PRICES)):
        lo = max(0, i - 13)
        frame = PRICES[lo : i + 1]
        sma = sum(frame) / len(frame)
        rows[("SMA", i)] = sma
        ag = sum(gains[lo : i + 1]) / len(frame)
        al = sum(losses[lo : i + 1]) / len(frame)
        rows[("RSI", i)] = None if al == 0 else 100 - 100 / (1 + ag / al)
        sd = statistics.stdev(frame) if len(frame) > 1 else None
        rows[("BB_UP", i)] = None if sd is None else sma + 2 * sd
        rows[("BB_DOWN", i)] = None if sd is None else sma - 2 * sd
    return {k: v for k, v in rows.items() if v is not None}


@pytest.fixture(scope="module")
def series_df(spark):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(hours=i), 1, p) for i, p in enumerate(PRICES)
    ]
    return spark.createDataFrame(data, "event_id long, ts timestamp, user_id long, value double")


def test_indicator_values_match_reference_semantics(spark, series_df):
    got = {
        (r["type_name"], r["_i"]): r["ind_value"]
        for r in compute_indicators(series_df, order_cols=("ts", "event_id"))
        .withColumnRenamed("ts", "_ts")
        .join(series_df.selectExpr("ts as _ts", "event_id as _i"), "_ts")
        .collect()
    }
    want = _expected()
    assert set(got) == set(want)
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=1e-9), (k, got[k], v)


def test_first_row_rsi_is_dropped_not_zero(spark, series_df):
    """First row: diff NULL → gain=loss=0.0 → rs NULL (0/0) → RSI dropped."""
    rsi = (
        compute_indicators(series_df)
        .filter("type_name = 'RSI'")
        .join(series_df.selectExpr("ts", "event_id as i"), "ts")
        .select("i")
        .collect()
    )
    assert 0 not in {r["i"] for r in rsi}


def test_bollinger_warmup_dropped(spark, series_df):
    """1-row frame → sample stddev NULL → BB rows dropped."""
    bb = (
        compute_indicators(series_df)
        .filter("type_name like 'BB%'")
        .join(series_df.selectExpr("ts", "event_id as i"), "ts")
        .select("i")
        .collect()
    )
    assert 0 not in {r["i"] for r in bb}


def test_pipeline_anti_join_idempotent(spark, series_df):
    full = indicator_pipeline(spark, series_df)
    existing = full.select("user_id", "type_id", "ts")
    again = indicator_pipeline(spark, series_df, existing=existing)
    assert again.count() == 0  # re-run writes nothing (spark_job_1.py:81-85)


def test_wilder_rsi_golden(spark):
    """Wilder-smoothed RSI-14 (r5, recursive_indicators): NULL through
    the 14-row warm-up, seed = simple mean of the first 14 diffs at row
    15, Wilder recurrence after; a strictly-rising series pins the
    zero-loss branch at exactly 100. Checked bit-for-bit against an
    independently-written reference loop."""
    import datetime as _dt

    from crypto_data_pipeline_with_kafka_spark.operators.recursive import (
        recursive_indicators,
    )

    vals = [50.0, 50.5, 49.8, 51.2, 52.0, 51.5, 53.1, 52.4, 54.0, 53.2,
            55.5, 54.8, 56.0, 55.1, 57.3, 56.2, 58.0, 57.1, 59.4, 58.5]
    t0 = _dt.datetime(2024, 3, 1)
    rows = [(1, i, t0 + _dt.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: (r.ema, r.rsi_wilder)
        for r in recursive_indicators(df).collect()
    }

    # reference: textbook Wilder, written straight from the formula
    period = 14
    diffs = [vals[i] - vals[i - 1] for i in range(1, len(vals))]
    gains = [d if d > 0 else 0.0 for d in diffs]
    losses = [-d if d < 0 else 0.0 for d in diffs]
    want_rsi: list[float | None] = [None] * len(vals)
    ag = al = None
    for i in range(period, len(vals)):  # row i consumes diffs[0..i-1]
        if i == period:
            sg = 0.0
            sl = 0.0
            for k in range(period):
                sg += gains[k]
                sl += losses[k]
            ag, al = sg / 14.0, sl / 14.0
        else:
            ag = (ag * 13.0 + gains[i - 1]) / 14.0
            al = (al * 13.0 + losses[i - 1]) / 14.0
        want_rsi[i] = 100.0 if al == 0.0 else 100.0 - 100.0 / (1.0 + ag / al)

    for i in range(len(vals)):
        assert got[i][1] == want_rsi[i], (i, got[i][1], want_rsi[i])
    assert all(got[i][1] is None for i in range(period))
    assert got[period][1] is not None

    # zero-loss branch: strictly rising prices → RSI exactly 100
    rising = [(2, i, t0 + _dt.timedelta(hours=i), 10.0 + i) for i in range(16)]
    df2 = spark.createDataFrame(
        rising, "user_id long, event_id long, ts timestamp, value double"
    )
    r15 = {r.event_id: r.rsi_wilder for r in recursive_indicators(df2).collect()}
    assert r15[15] == 100.0 and r15[14] == 100.0 and r15[13] is None


def test_prefilter_empty_ingest(spark, series_df):
    """An empty ingest batch: the bounds probe finds no rows, the
    pre-filter returns an empty existing side, and the pipeline output
    is empty — no error, no full-history read."""
    from crypto_data_pipeline_with_kafka_spark.operators.indicators import (
        prefilter_to_ingest_range,
    )

    full = indicator_pipeline(spark, series_df)
    existing = full.select("user_id", "type_id", "ts")
    empty = series_df.limit(0)
    assert prefilter_to_ingest_range(empty, existing).count() == 0
    assert indicator_pipeline(spark, empty, existing=existing).count() == 0


def test_prefilter_bounds_follow_supplied_indicators(spark, series_df):
    """With a caller-supplied ``indicators`` relation the pre-filter must
    probe ITS ts range, not the (possibly empty or narrower) events
    batch — otherwise `existing` rows that would have matched are
    pruned and already-persisted indicators get re-emitted (r5 review
    finding). Supplying the full indicator relation with an EMPTY events
    frame must still anti-join everything away."""
    ind = indicator_pipeline(spark, series_df).persist()
    existing = ind.select("user_id", "type_id", "ts")
    empty_events = series_df.limit(0)
    out = indicator_pipeline(
        spark, empty_events, existing=existing, indicators=ind
    )
    assert out.count() == 0  # every row already persisted → all dropped
    ind.unpersist()
