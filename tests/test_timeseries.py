"""Semantic invariants for the time-series event operators
(plans/timeseries.py) that the oracle parity check can't see:
parity proves Spark == DuckDB, these prove both == the math.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.plans.timeseries import (
    q_agg_ohlc_bars,
    q_agg_time_weighted_avg,
    q_window_cumulative_distinct,
)


def test_twa_of_constant_is_the_constant(spark, sf_dir):
    """Step-interpolated TWA is a weighted mean: for a constant series
    it must return exactly that constant, whatever the gaps."""
    rows = [(i, f"2024-01-01 00:0{i}:00", 7, 3.25) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value")
    assert _twa_on(spark, df) == [(7, 3.25, 4)]


def _twa_on(spark, df):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        df.withColumn("next_ts", F.lead("ts").over(w))
        .filter(F.col("next_ts").isNotNull())
        .select(
            "user_id",
            (F.unix_micros("next_ts") - F.unix_micros("ts")).alias("w_us"),
            F.col("value").cast("decimal(18,6)").alias("v_dec"),
        )
    )
    twa = F.col("sum_vw").cast("double") / F.col("sum_w").cast("double")
    out = (
        seg.groupBy("user_id")
        .agg(
            F.sum(F.col("v_dec") * F.col("w_us")).alias("sum_vw"),
            F.sum("w_us").alias("sum_w"),
            F.count("*").cast("long").alias("n_segments"),
        )
        .select("user_id", F.round(twa, 6).alias("twa_r6"), "n_segments")
        .collect()
    )
    return [tuple(r) for r in out]


def test_ohlc_volume_partitions_events(spark, sf_dir):
    """Every event lands in exactly one bar: bar volumes sum to the
    table count, and low ≤ open/close ≤ high within each bar."""
    total = load(spark, sf_dir, "events").count()
    bars = q_agg_ohlc_bars(spark, sf_dir).collect()
    assert sum(r["volume"] for r in bars) == total
    for r in bars:
        assert r["low_r6"] <= r["open_r6"] <= r["high_r6"]
        assert r["low_r6"] <= r["close_r6"] <= r["high_r6"]


def test_cumulative_distinct_final_equals_distinct(spark, sf_dir):
    """The running distinct-type count is nondecreasing per user and
    its final value equals the user's exact COUNT(DISTINCT event_type)."""
    out = q_window_cumulative_distinct(spark, sf_dir).collect()
    by_user: dict[int, list[int]] = {}
    for r in out:  # already ordered (user_id, event_id); re-group
        by_user.setdefault(r["user_id"], []).append(r["distinct_types_so_far"])
    exact = {
        r["user_id"]: r["d"]
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("d"))
        .collect()
    }
    for uid, seq in by_user.items():
        assert seq == sorted(seq), f"user {uid}: running count decreased"
        assert seq[-1] == exact[uid]


def test_twa_segment_counts(spark, sf_dir):
    """n_segments = events_per_user - 1 (the last reading has no
    duration), proving no segment is dropped or double-counted."""
    seg = {
        r["user_id"]: r["n_segments"]
        for r in q_agg_time_weighted_avg(spark, sf_dir).collect()
    }
    per_user = {
        r["user_id"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for uid, n in per_user.items():
        if n >= 2:
            assert seg[uid] == n - 1
        else:
            assert uid not in seg


def test_peak_detect_matches_brute_force(spark, sf_dir):
    """Every flagged peak must beat both neighbors by the floor when
    replayed against the collected per-type series."""
    from job_market_research_spark.plans.timeseries import (
        PEAK_MIN_PROMINENCE6,
        q_window_peak_detect,
    )

    peaks = {
        r["event_id"]: r for r in q_window_peak_detect(spark, sf_dir).collect()
    }
    rows = (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "ts", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    import decimal

    expected = set()
    for t, rs in by_type.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        y = [
            int(
                decimal.Decimal(repr(r["value"])).quantize(
                    decimal.Decimal("0.000001")
                )
                * 1000000
            )
            for r in rs
        ]
        for i in range(1, len(rs) - 1):
            if (
                y[i] - y[i - 1] >= PEAK_MIN_PROMINENCE6
                and y[i] - y[i + 1] >= PEAK_MIN_PROMINENCE6
            ):
                expected.add(rs[i]["event_id"])
    assert set(peaks) == expected
    assert expected, "peak report must not be vacuous"


def test_cohort_ltv_cumulative_is_total_revenue(spark, sf_dir):
    """Per cohort the final cumulative LTV equals that cohort's total
    purchase revenue, and the running sum is nondecreasing."""
    from job_market_research_spark.plans.events_analytics import q_agg_cohort_ltv

    out = q_agg_cohort_ltv(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in out:
        by_cohort.setdefault(r["cohort_date"], []).append(r)
    total = 0.0
    for cohort, rows in by_cohort.items():
        cums = [r["cum_ltv_r6"] for r in rows]
        assert cums == sorted(cums)
        assert abs(sum(r["week_rev_r6"] for r in rows) - cums[-1]) < 1e-4
        total += cums[-1]
    exact = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s"))
        .first()["s"]
    )
    assert abs(total - float(exact)) < 1e-3
