"""Property-based tests (hypothesis) for the operators whose
correctness is an algebraic invariant, not a fixed fixture:

- multi-format date parsing inverts date formatting for every date and
  format, and garbage never parses (model: Python strptime)
- salted aggregation is exactly COUNT(*) GROUP BY for any key
  distribution, including pathological single-key skew
- keyed dedup keeps exactly the deterministic min survivor
- batch sessionization partitions the event set: counts sum to the
  total and intra-session gaps stay under the gap threshold

Each example is a whole row batch (one Spark job per example, small
max_examples) — Spark job latency makes per-row examples impractical.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F, types as T

from job_market_research_spark.functions.dates import parse_multiformat_date
from job_market_research_spark.operators.dedup import dedup_keep_min
from job_market_research_spark.operators.skew import salted_count
from job_market_research_spark.streaming.sessions import sessionize

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

DATES = st.dates(min_value=datetime.date(1990, 1, 1), max_value=datetime.date(2099, 12, 28))
FMT = st.sampled_from([("yyyy-MM-dd", "%Y-%m-%d"), ("dd/MM/yyyy", "%d/%m/%Y"), ("dd-MM-yyyy", "%d-%m-%Y")])


@SLOW
@given(batch=st.lists(st.tuples(DATES, FMT), min_size=1, max_size=40))
def test_date_parse_inverts_format(spark, batch):
    rows = [(d.strftime(pyfmt), d) for d, (_sparkfmt, pyfmt) in batch]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("raw", T.StringType()),
                T.StructField("expected", T.DateType()),
            ]
        ),
    )
    out = df.select(
        parse_multiformat_date("raw").alias("got"), "expected"
    ).collect()
    for r in out:
        assert r.got == r.expected, (r.got, r.expected)


@SLOW
@given(
    garbage=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll")), max_size=12
        ),
        min_size=1,
        max_size=30,
    )
)
def test_date_parse_rejects_garbage(spark, garbage):
    """Pure-letter strings can never satisfy any accepted format."""
    df = spark.createDataFrame([(g,) for g in garbage], ["raw"])
    out = df.select(parse_multiformat_date("raw").alias("got")).collect()
    assert all(r.got is None for r in out)


@SLOW
@given(
    keys=st.lists(
        st.sampled_from(["hot", "hot", "hot", "warm", "cold"]),  # skewed draw
        min_size=1,
        max_size=200,
    )
)
def test_salted_count_equals_plain_count(spark, keys):
    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, ["k", "rid"])
    got = {
        r.k: r.n for r in salted_count(df, "k", "rid", buckets=4).collect()
    }
    expected = {}
    for k in keys:
        expected[k] = expected.get(k, 0) + 1
    assert got == expected


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.integers(min_value=-1000, max_value=1000),  # payload
        ),
        min_size=1,
        max_size=100,
    )
)
def test_dedup_keep_min_survivor(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r.k: r.v for r in dedup_keep_min(df, ["k"], "v").collect()}
    expected = {}
    for k, v in rows:
        expected[k] = v if k not in expected else min(expected[k], v)
    assert got == expected


@SLOW
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=60 * 60 * 24),  # seconds within a day
        min_size=1,
        max_size=120,
    ),
    users=st.lists(st.integers(min_value=1, max_value=3), min_size=1, max_size=120),
)
def test_sessionize_partitions_events(spark, offsets, users):
    base = datetime.datetime(2024, 1, 1)
    n = min(len(offsets), len(users))
    rows = [
        (users[i], base + datetime.timedelta(seconds=offsets[i])) for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    sessions = sessionize(df, gap="2 hours").collect()
    # counts partition the events
    assert sum(s.n_events for s in sessions) == n
    # per user: session spans don't overlap, and each span is tight
    gap = datetime.timedelta(hours=2)
    by_user: dict[int, list] = {}
    for s in sessions:
        by_user.setdefault(s.user_id, []).append(s)
    for user, ss in by_user.items():
        ss.sort(key=lambda s: s.session_start)
        for a, b in zip(ss, ss[1:]):
            # end = last event + gap; next session starts >= that end
            assert b.session_start >= a.session_end
        user_ts = sorted(ts for u, ts in rows if u == user)
        # every event falls inside exactly one session span
        covered = sum(
            1
            for ts in user_ts
            if any(s.session_start <= ts < s.session_end for s in ss)
        )
        assert covered == len(user_ts)
        # no intra-session gap reaches the threshold: consecutive events
        # inside one session are < gap apart
        for s in ss:
            inside = [ts for ts in user_ts if s.session_start <= ts < s.session_end]
            for t1, t2 in zip(inside, inside[1:]):
                assert t2 - t1 < gap


URL_CHARS = st.text(
    alphabet=st.sampled_from("abcXYZ019/-_.~%"), min_size=0, max_size=30
)


@SLOW
@given(paths=st.lists(URL_CHARS, min_size=1, max_size=30))
def test_canonicalize_url_idempotent(spark, paths):
    """canon(canon(u)) == canon(u): a canonical form is a fixpoint —
    re-cleaning an already-clean key never changes it (otherwise
    incremental dedup against historic keys silently diverges)."""
    from job_market_research_spark.operators.dedup import canonicalize_url

    urls = [
        (i, f"https://www.Host{i % 3}.Example.com/{p}?utm_x=1#f")
        for i, p in enumerate(paths)
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    once = df.select("id", canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        "id", "c1", canonicalize_url(F.col("c1")).alias("c2")
    )
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert bad == [], bad


@SLOW
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                 max_size=60, unique=True),
    lo=st.integers(min_value=0, max_value=4),
)
def test_mixture_rate_monotone_supersets(spark, ids, lo):
    """Raising a stratum's keep rate only ADDS survivors (hash
    thresholding ⇒ nested keep-sets) — mixture recipes can be tuned
    up without resampling churn."""
    from job_market_research_spark.ml.curation import mixture_sample

    df = spark.createDataFrame([(i, "s") for i in ids], "doc_id long, source string")
    low = {"s": lo / 10}
    high = {"s": (lo + 3) / 10}
    kept_lo = {r.doc_id for r in mixture_sample(df, low).collect()}
    kept_hi = {r.doc_id for r in mixture_sample(df, high).collect()}
    assert kept_lo <= kept_hi


@SLOW
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=1, max_size=50, unique=True,
    )
)
def test_morton_interleave_bijective(spark, pairs):
    """The Morton code is a bijection on (10-bit, 10-bit) pairs:
    distinct inputs → distinct codes, and deinterleaving the code
    recovers exactly (x, y)."""
    from job_market_research_spark.operators.sessionize import morton_interleave

    df = spark.createDataFrame(pairs, "x long, y long")
    out = df.select(
        "x", "y", morton_interleave(F.col("x"), F.col("y")).alias("z")
    ).collect()
    assert len({r.z for r in out}) == len(pairs)
    for r in out:
        x = sum(((r.z >> (2 * i)) & 1) << i for i in range(10))
        y = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(10))
        assert (x, y) == (r.x, r.y)


@SLOW
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50),
    probes=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50),
)
def test_bloom_prune_never_false_negative(spark, keys, probes):
    """For ANY build/probe key sets, every probe key that IS in the
    build set survives the bloom prune (false positives allowed,
    false negatives never)."""
    from job_market_research_spark.operators.bloom import bloom_bits, bloom_prune

    build = spark.createDataFrame([(k,) for k in keys], "k long")
    probe = spark.createDataFrame([(p,) for p in probes], "k long")
    bits = bloom_bits(build, "k")
    kept = {r["k"] for r in bloom_prune(probe, "k", bits).collect()}
    must_keep = set(probes) & set(keys)
    assert must_keep <= kept


@SLOW
@given(
    vec=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    )
)
def test_quantize_reconstruction_error_bounded(spark, vec):
    """Symmetric int8 quantization: |x − q·s/127| ≤ s/254 + ulp slack
    for every element (half a quantization step), s = max|x|."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[float(x) for x in vec])],
        "vec_id long, embedding array<float>",
    )
    out = (
        df.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
        .withColumn("s", F.array_max(F.transform("e", lambda x: F.abs(x))))
        .select(
            "s",
            F.posexplode(
                F.transform(
                    "e",
                    lambda x: F.when(F.col("s") == 0, F.lit(0.0)).otherwise(
                        F.round(x * 127.0 / F.col("s"), 0)
                    ),
                )
            ).alias("i", "q"),
            F.col("e"),
        )
        .collect()
    )
    for r in out:
        s = r["s"]
        if s == 0:
            continue
        x = r["e"][r["i"]]
        err = abs(x - r["q"] * s / 127.0)
        assert err <= s / 254.0 * (1 + 1e-9) + 1e-12, (x, r["q"], s, err)


@SLOW
@given(
    keys=st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1,
                  max_size=300, unique=True)
)
def test_global_row_number_matches_global_window(spark, keys):
    """global_row_number (range-partition + offsets) must reproduce
    row_number().over(Window.orderBy(k)) exactly — range boundaries
    decide WHERE a row is numbered, never WHAT number it gets."""
    from job_market_research_spark.operators.joins import global_row_number

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.rn for r in global_row_number(df, "k", partitions=4).collect()}
    expect = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == expect


DAYVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # day offset
        st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@SLOW
@given(series=DAYVALS)
def test_gap_fill_matches_python_replica(spark, series):
    """window_gap_fill_interpolate's floor-quantized micro-unit
    arithmetic must match an exact Python replica for ANY daily
    series: observed days keep floor(v·1e6), gaps get
    pv + floor(Δ·d/n)."""
    import datetime
    import math

    from pyspark.sql import functions as F

    from job_market_research_spark.plans.timeseries import (
        q_window_gap_fill_interpolate,
    )
    import job_market_research_spark.io as io_mod

    base = datetime.date(2024, 1, 1)
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1, 12, 0, 0)
            + datetime.timedelta(days=day),
            7,
            float(val),
        )
        for i, (day, val) in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )

    # replica: floor-quantized micro-units, one reading per day
    from decimal import Decimal, ROUND_HALF_UP

    obs = {}
    for day, val in series:
        d6 = Decimal(repr(float(val))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        obs[day] = math.floor(float(d6 * 1000000) / 1)
    lo, hi = min(obs), max(obs)
    expected = {}
    for day in range(lo, hi + 1):
        if day in obs:
            expected[day] = (obs[day] / 1e6, False)
        else:
            pd_ = max(d for d in obs if d < day)
            nd = min(d for d in obs if d > day)
            interp = obs[pd_] + math.floor(
                float((obs[nd] - obs[pd_]) * (day - pd_)) / (nd - pd_)
            )
            expected[day] = (interp / 1e6, True)

    # drive the registered plan through a monkeypatched loader
    real_load = io_mod.load
    try:
        io_mod.load = lambda _s, _sf, _t: df
        import job_market_research_spark.plans.timeseries as ts_mod

        orig = ts_mod.load
        ts_mod.load = io_mod.load
        try:
            out = q_window_gap_fill_interpolate(spark, "ignored").collect()
        finally:
            ts_mod.load = orig
    finally:
        io_mod.load = real_load

    got = {
        (r["day"] - base).days: (r["value_q6"], r["interpolated"]) for r in out
    }
    assert got == expected
