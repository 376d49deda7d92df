"""Equivalence guards for the round-9 two-level window stitches.

The oracle-parity suite already proves every stitched query equals its
DuckDB single-window twin on the fixed corpus; these tests attack the
STITCH LOGIC itself with adversarial shapes the corpus may not contain
— single-row days, multi-day gaps, timestamp ties, negative walks —
by comparing the production helper against an inline single-window
reference on synthetic frames.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Window, functions as F

from job_market_research_spark.plans.timeseries import cusum_report


def _single_window_cusum(events):
    """The pre-round-9 single-window form, kept ONLY as the test
    reference: cumulative sum + running min partitioned by type."""
    ev = events.select(
        "event_id",
        "event_type",
        "ts",
        F.col("value").cast("decimal(18,6)").alias("v_dec"),
    )
    base = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v_dec").alias("s1"),
        F.sum(F.col("v_dec") * F.col("v_dec")).alias("s2"),
    )
    n = F.col("n")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    stats = base.filter(n > 1).select(
        "event_type",
        F.floor((F.col("s1") * 1000000).cast("double") / n)
        .cast("long")
        .alias("mu6"),
        F.floor(F.sqrt((s2d - s1d * s1d / n) / (n - 1)) * 1000000.0)
        .cast("long")
        .alias("sd6"),
    )
    dev = ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "ts",
        ((F.col("v_dec") * 1000000).cast("long") - F.col("mu6")).alias("d6"),
        "sd6",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dev.select(
        "event_id", "event_type", "ts", "sd6", F.sum("d6").over(w).alias("cs6")
    ).withColumn("lo6", F.min("cs6").over(w))


def _adversarial_events(spark):
    """Shapes that stress the day stitch: a type whose days are all
    single-row, a type with multi-day gaps, a type entirely inside one
    day (carry never used), timestamp TIES broken by event_id, and a
    walk that dips negative across a day boundary (prevmin must win)."""
    rows = []
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    # type A: one event per day across 6 days, values force sign flips
    for i, v in enumerate([10.0, -30.0, 25.0, -40.0, 5.0, 60.0]):
        rows.append((100 + i, "A", base + datetime.timedelta(days=i), v))
    # type B: all inside ONE day, with two ts ties
    t0 = base
    for i, v in enumerate([5.0, -2.0, -2.0, 9.0, 1.0]):
        ts = t0 if i < 2 else t0 + datetime.timedelta(minutes=i)
        rows.append((200 + i, "B", ts, v))
    # type C: bursts separated by multi-day gaps; negative start
    for i, (d, v) in enumerate(
        [(0, -50.0), (0, 20.0), (7, -1.0), (7, 100.0), (30, -200.0), (30, 3.0)]
    ):
        rows.append(
            (300 + i, "C", base + datetime.timedelta(days=d, minutes=i), v)
        )
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )


def test_cusum_day_stitch_equals_single_window(spark):
    ev = _adversarial_events(spark)
    got = {
        r["event_type"]: (r["n"], r["peak_event_id"], r["peak_drawup_sigma_r6"])
        for r in cusum_report(ev).collect()
    }
    # independent reference: single-window walk, then the same report
    walk = _single_window_cusum(ev)
    peak = walk.groupBy("event_type").agg(
        F.max(F.col("cs6") - F.col("lo6")).alias("peak6"),
        F.count("*").cast("long").alias("n"),
    )
    ref_rows = (
        peak.join(walk.withColumn("du6", F.col("cs6") - F.col("lo6")), ["event_type"])
        .filter(F.col("du6") == F.col("peak6"))
        .groupBy("event_type", "peak6", "n")
        .agg(
            F.min("event_id").cast("long").alias("peak_event_id"),
            F.first("sd6").alias("sd6"),
        )
        .select(
            "event_type",
            "n",
            "peak_event_id",
            F.round(F.col("peak6").cast("double") / F.col("sd6"), 6).alias(
                "sigma"
            ),
        )
        .collect()
    )
    ref = {r["event_type"]: (r["n"], r["peak_event_id"], r["sigma"]) for r in ref_rows}
    assert got == ref and set(got) == {"A", "B", "C"}


def test_bounded_frame_stitch_equals_single_window(spark):
    """stitched_bounded_frames (the window_ewma_bounded core) must
    equal the single part-keyed window frame on adversarial bucket
    shapes: single-row buckets spanning more buckets than the frame,
    one dense bucket far larger than the frame, huge empty-bucket
    gaps, and the degenerate spans (every key its own bucket / all
    keys one bucket). This pins the round-10 narrowing of the carry
    window to the last n-1 buckets — a frame too narrow by even one
    bucket drops a carry row on the all-single-row-buckets shape."""
    from job_market_research_spark.functions.enrich import (
        stitched_bounded_frames,
    )

    # partition p1: exactly one row per bucket (at span 10) across 8
    # buckets; p2: dense run (20 rows in 2 buckets) then multi-bucket
    # gaps; p3: two rows total (frame never fills)
    keys_p1 = [1, 12, 23, 34, 45, 56, 67, 78]
    keys_p2 = list(range(20, 40)) + [500, 9000, 9001]
    rows = (
        [("p1", k, (k * 7) % 13) for k in keys_p1]
        + [("p2", k, (k * 3) % 11) for k in keys_p2]
        + [("p3", k, k) for k in (7, 70_000)]
    )
    df = spark.createDataFrame(rows, "g string, k long, x long")
    for n, span in ((4, 10), (16, 5), (2, 1), (16, 1_000_000)):
        got = {
            (r["g"], r["k"]): list(r["arr"])
            for r in stitched_bounded_frames(
                df, "g", "k", "x", n, span
            ).collect()
        }
        w = (
            Window.partitionBy("g")
            .orderBy("k")
            .rowsBetween(-(n - 1), Window.currentRow)
        )
        ref = {
            (r["g"], r["k"]): list(r["arr"])
            for r in df.withColumn(
                "arr", F.collect_list("x").over(w)
            ).collect()
        }
        assert got == ref, (n, span)


def test_bounded_frame_stitch_property(spark):
    """Hypothesis: for RANDOM key sets, partitions, frame sizes and
    bucket spans, the stitched trailing frame equals the single-window
    frame. Random keys generate exactly the shapes the fixed test
    can't enumerate — runs of single-row buckets longer than the carry
    frame, duplicate-free sparse tails, clustered bursts."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from job_market_research_spark.functions.enrich import (
        stitched_bounded_frames,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=st.lists(
            st.tuples(
                st.sampled_from(["g1", "g2"]),
                st.integers(min_value=0, max_value=2_000),
            ),
            min_size=1,
            max_size=80,
            unique=True,
        ),
        n=st.integers(min_value=2, max_value=16),
        span=st.sampled_from([1, 7, 64, 1_000]),
    )
    def run(keys, n, span):
        rows = [(g, k, (k * 13) % 97) for g, k in keys]
        df = spark.createDataFrame(rows, "g string, k long, x long")
        got = {
            (r["g"], r["k"]): list(r["arr"])
            for r in stitched_bounded_frames(
                df, "g", "k", "x", n, span
            ).collect()
        }
        w = (
            Window.partitionBy("g")
            .orderBy("k")
            .rowsBetween(-(n - 1), Window.currentRow)
        )
        ref = {
            (r["g"], r["k"]): list(r["arr"])
            for r in df.withColumn(
                "arr", F.collect_list("x").over(w)
            ).collect()
        }
        assert got == ref, (n, span)

    run()


def test_topk_per_group_equals_single_window(spark):
    """topk_per_group (kept for WGL-unprunable shapes) must equal the
    single-level window on adversarial data: duplicate scores across
    bucket boundaries, a group smaller than k, and k=1."""
    from job_market_research_spark.ml.similarity import topk_per_group

    rows = []
    # group g1: 40 rows, many tied scores (hash-buckets split ties)
    for i in range(40):
        rows.append(("g1", i, float(i % 5)))
    # group g2: fewer rows than k
    for i in range(3):
        rows.append(("g2", 100 + i, float(i)))
    df = spark.createDataFrame(rows, "g string, uid long, score double")
    for k in (1, 7):
        w = Window.partitionBy("g").orderBy(F.desc("score"), "uid")
        ref = (
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("g", "uid", "rk")
            .collect()
        )
        got = (
            topk_per_group(df, "g", [F.desc("score"), "uid"], k, "uid")
            .select("g", "uid", "rk")
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, ref)), k
