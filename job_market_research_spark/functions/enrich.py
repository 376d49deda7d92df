"""LLM enrichment operator (SURVEY §2.10 `text_llm_enrich`).

The reference enriches each offer with a per-record Groq call —
1 offer/call, 1 s pause, 3 retries + exponential backoff, deterministic
rule fallback on failure (enrechissement_process/init_groq.py:103-264,
pipline.py:112-149). That throughput ceiling (~0.2 offers/s) is the
design to beat: here enrichment is an Arrow-batched `mapInPandas`
stage, so concurrency = partitions × batch, rate limiting is partition
count, and the external client is injectable.

The default client is the reference's own deterministic rule fallback
(init_groq.py:164-228) expressed in pandas — making the operator fully
testable offline. A real LLM client plugs in with `enrich_offers(df,
client=...)`; the plan shape does not change.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

ENRICH_OUTPUT_SCHEMA = (
    "job_url string, titre string, titre_homogene string, secteur_infere string, "
    "niveau_qualification int, enrich_source string"
)

#: Ordered keyword → label rules (reference: init_groq.py:164-228's
#: rule-based fallback classification).
SECTOR_RULES: list[tuple[str, str]] = [
    ("data", "Data & AI"),
    ("engineer", "Engineering"),
    ("market", "Marketing"),
    ("finance", "Finance"),
    ("developer", "IT"),
]

TITLE_NORMALIZATIONS: list[tuple[str, str]] = [
    (r"\bsr\.?\b|\bsenior\b", "senior"),
    (r"\bjr\.?\b|\bjunior\b", "junior"),
    (r"\s+", " "),
]


def rule_based_enrich(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic enrichment: normalized title, keyword-inferred
    sector, 1-5 qualification from seniority keywords."""
    titles = pdf["titre"].fillna("").str.lower().str.strip()
    homog = titles
    for pat, repl in TITLE_NORMALIZATIONS:
        homog = homog.str.replace(pat, repl, regex=True)

    def sector_of(t: str) -> str:
        for kw, label in SECTOR_RULES:
            if kw in t:
                return label
        return "Autre"

    def qual_of(t: str) -> int:
        if "senior" in t or "lead" in t:
            return 4
        if "junior" in t or "stagiaire" in t:
            return 2
        return 3

    return pd.DataFrame(
        {
            "job_url": pdf["job_url"],
            "titre": pdf["titre"],
            "titre_homogene": homog,
            "secteur_infere": titles.map(sector_of),
            "niveau_qualification": titles.map(qual_of).astype("int32"),
            "enrich_source": "rule_fallback",
        }
    )


#: Output columns, in schema order (derived once from the DDL string).
_ENRICH_COLS = [c.strip().split(" ")[0] for c in ENRICH_OUTPUT_SCHEMA.split(",")]


def endpoint_client(
    call: Callable[[dict], dict],
    retries: int = 3,
    backoff_s: float = 1.0,
    backoff_mult: float = 2.0,
    pause_s: float = 0.0,
    sleep: Callable[[float], None] | None = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Wrap a per-record external endpoint (LLM, enrichment API) into a
    batch client for `enrich_offers`, with the reference's resilience
    semantics re-expressed for executor-side batches
    (enrechissement_process/pipline.py:112-149: per-call pause,
    3 retries with exponential backoff, deterministic rule fallback
    when retries exhaust):

    - ``pause_s`` seconds between consecutive calls (rate limit — runs
      per partition, so cluster-wide rate = partitions / pause_s; cap
      concurrency with `enrich_offers(batch_partitions=...)`),
    - each record retried ``retries`` times with delay
      ``backoff_s * backoff_mult**attempt``,
    - a record whose retries exhaust (or whose response is not a dict)
      degrades to the rule fallback for THAT record only, tagged
      ``enrich_source='rule_fallback'``; successes tag ``'endpoint'``.

    ``sleep`` is injectable for tests; endpoint responses supply
    ``titre_homogene`` / ``secteur_infere`` / ``niveau_qualification``,
    with per-field rule-fallback defaults for partial responses."""
    do_sleep = sleep if sleep is not None else __import__("time").sleep

    def client(pdf: pd.DataFrame) -> pd.DataFrame:
        fallback = rule_based_enrich(pdf).reset_index(drop=True)
        rows: list[dict] = []
        for i, rec in enumerate(pdf.reset_index(drop=True).to_dict("records")):
            if pause_s and i:
                do_sleep(pause_s)
            resp: dict | None = None
            delay = backoff_s
            for attempt in range(retries + 1):
                try:
                    out = call(rec)
                    if isinstance(out, dict):
                        resp = out
                        break
                except Exception:
                    pass
                if attempt < retries:
                    do_sleep(delay)
                    delay *= backoff_mult
            fb = fallback.iloc[i]
            row = None
            if resp is not None:
                # Per-record degradation contract: a well-formed dict
                # with a malformed FIELD (e.g. niveau_qualification=
                # 'senior' from an LLM) must degrade THIS record to the
                # rule row, not raise out of the batch and fail the
                # whole mapInPandas task.
                try:
                    row = {
                        "job_url": rec["job_url"],
                        "titre": rec["titre"],
                        "titre_homogene": resp.get(
                            "titre_homogene", fb["titre_homogene"]
                        ),
                        "secteur_infere": resp.get(
                            "secteur_infere", fb["secteur_infere"]
                        ),
                        "niveau_qualification": int(
                            resp.get(
                                "niveau_qualification", fb["niveau_qualification"]
                            )
                        ),
                        "enrich_source": "endpoint",
                    }
                except (TypeError, ValueError, KeyError):
                    row = None
            if row is None:
                row = {c: fb[c] for c in _ENRICH_COLS}
                row["enrich_source"] = "rule_fallback"
            rows.append(row)
        out = pd.DataFrame(rows, columns=_ENRICH_COLS)
        out["niveau_qualification"] = out["niveau_qualification"].astype("int32")
        return out

    return client


def enrich_offers(
    df: DataFrame,
    client: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Batch enrichment as mapInPandas. `client` maps a pandas batch of
    offers to the enriched batch; defaults to the rule fallback. The
    join back to the input is KEYED on job_url, not positional —
    SURVEY §7 hard-point (d): the reference zips LLM output back by
    list position (pipline.py:184-187), which breaks on partial
    batches; a keyed merge cannot."""
    fn = client or rule_based_enrich

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            missing = set(
                c.split(" ")[0] for c in ENRICH_OUTPUT_SCHEMA.split(", ")
            ) - set(out.columns)
            if missing:  # fall back per batch, like the reference's retry tail
                out = rule_based_enrich(pdf)
            yield out

    src = df.select("job_url", "titre")
    if batch_partitions:
        src = src.repartition(batch_partitions)
    return src.mapInPandas(run, schema=ENRICH_OUTPUT_SCHEMA)


from job_market_research_spark.io import load  # noqa: E402
from job_market_research_spark.registry import query  # noqa: E402


@query(
    "text_llm_enrich",
    oracle=r"""
    WITH src AS (
      SELECT CAST(p_partkey AS VARCHAR) AS job_url, p_name AS titre,
             lower(trim(p_name)) AS t
      FROM part
    )
    SELECT job_url, titre,
      regexp_replace(regexp_replace(regexp_replace(t,
          '\bsr\.?\b|\bsenior\b', 'senior', 'g'),
          '\bjr\.?\b|\bjunior\b', 'junior', 'g'),
          '\s+', ' ', 'g') AS titre_homogene,
      CASE WHEN t LIKE '%data%' THEN 'Data & AI'
           WHEN t LIKE '%engineer%' THEN 'Engineering'
           WHEN t LIKE '%market%' THEN 'Marketing'
           WHEN t LIKE '%finance%' THEN 'Finance'
           WHEN t LIKE '%developer%' THEN 'IT'
           ELSE 'Autre' END AS secteur_infere,
      CAST(CASE WHEN t LIKE '%senior%' OR t LIKE '%lead%' THEN 4
                WHEN t LIKE '%junior%' OR t LIKE '%stagiaire%' THEN 2
                ELSE 3 END AS INTEGER) AS niveau_qualification,
      'rule_fallback' AS enrich_source
    FROM src ORDER BY job_url
    """,
)
def q_text_llm_enrich(spark, sf_dir: str) -> DataFrame:
    """Batch LLM-enrichment stage on its deterministic fallback path
    (the only reproducible one — SURVEY §2.10): `part` rows stand in
    for offers (p_partkey→job_url, p_name→titre). The plan shape is
    the production one — Arrow-batched mapInPandas, keyed (not
    positional) output — with the rule client in place of the remote
    model; the oracle replays the same rules in SQL."""
    offers = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("job_url"),
        F.col("p_name").alias("titre"),
    )
    return enrich_offers(offers).orderBy("job_url")


def _scaling_src(spark, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "grouped_minmax_native",
    oracle="""
    SELECT o_orderkey, o_orderpriority AS priority,
           o_totalprice AS totalprice,
           round(CASE WHEN MAX(o_totalprice) OVER w = MIN(o_totalprice) OVER w
                      THEN 0.0
                      ELSE (o_totalprice - MIN(o_totalprice) OVER w)
                           / (MAX(o_totalprice) OVER w - MIN(o_totalprice) OVER w)
                 END, 6) AS scaled
    FROM orders
    WHERE o_orderkey % 10 = 0
    WINDOW w AS (PARTITION BY o_orderpriority)
    ORDER BY o_orderkey
    """,
)
def q_grouped_minmax_native(spark, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling NATIVELY — the
    built-in-beats-pandas policy applied: one bounded (|priorities|-
    row) min/max aggregation broadcast-joined back, plus one division,
    stays entirely inside whole-stage codegen with no Arrow hop and no
    whole-group materialization. (Round 9: this replaced an unordered
    `min/max OVER (PARTITION BY priority)` window — semantically
    identical, but a window keyed on 5 priorities funnels the corpus
    through 5 tasks, while agg+broadcast-join is map-side after a
    combinable aggregate. Before that it replaced an applyInPandas
    version; grouped-map is reserved for transforms window functions
    cannot express — see grouped_pandas_ewma.)"""
    src = _scaling_src(spark, sf_dir)
    bounds = src.groupBy("priority").agg(
        F.min("totalprice").alias("__lo"), F.max("totalprice").alias("__hi")
    )
    lo, hi = F.col("__lo"), F.col("__hi")
    scaled = F.when(hi == lo, F.lit(0.0)).otherwise(
        (F.col("totalprice") - lo) / (hi - lo)
    )
    return (
        src.join(F.broadcast(bounds), "priority")
        .withColumn("scaled", F.round(scaled, 6))
        .drop("__lo", "__hi")
        .orderBy("o_orderkey")
    )


EWMA_ALPHA = 0.5  # exactly representable in binary → both engines
# compute bit-identical 0.5*x + 0.5*prev chains and round(6) is safe.
EWMA_SCHEMA = "o_orderkey long, priority string, totalprice double, ewma double"


def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map body: exponential smoothing over the group ordered
    by key — y_0 = x_0, y_t = (1-a)*y_{t-1} + a*x_t. The recursion is
    SEQUENTIAL: each output depends on the previous one, which no
    Spark built-in window aggregate expresses — this is what
    applyInPandas is for (whole ordered group as one frame).

    The recurrence is written out explicitly (not pandas `ewm`, whose
    internal divide-by-weight form rounds differently in the 12th
    decimal) so each step is literally `0.5*x + 0.5*prev` — the same
    IEEE ops in the same order as the oracle's recursive CTE."""
    pdf = pdf.sort_values("o_orderkey")
    vals = pdf["totalprice"].to_numpy()
    smoothed = []
    prev = 0.0
    for i, x in enumerate(vals):
        prev = x if i == 0 else EWMA_ALPHA * x + (1.0 - EWMA_ALPHA) * prev
        smoothed.append(prev)
    out = pdf[["o_orderkey", "priority", "totalprice"]].copy()
    # no rounding here: pandas .round is banker's; the query rounds
    # with F.round (half-up, same rule as DuckDB's round()).
    out["ewma"] = pd.Series(smoothed, index=pdf.index)
    return out


@query(
    "grouped_pandas_ewma",
    oracle="""
    WITH RECURSIVE src AS (
      SELECT o_orderpriority AS priority, o_orderkey,
             o_totalprice AS totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_orderkey) AS rn
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    rec AS (
      SELECT priority, o_orderkey, totalprice, rn, totalprice AS y
      FROM src WHERE rn = 1
      UNION ALL
      SELECT s.priority, s.o_orderkey, s.totalprice, s.rn,
             0.5 * s.totalprice + 0.5 * r.y
      FROM src s JOIN rec r ON s.priority = r.priority AND s.rn = r.rn + 1
    )
    SELECT o_orderkey, priority, totalprice, round(y, 6) AS ewma
    FROM rec ORDER BY o_orderkey
    """,
)
def q_grouped_pandas_ewma(spark, sf_dir: str) -> DataFrame:
    """Per-group exponential smoothing via applyInPandas (grouped map)
    — the pandas boundary EARNING its place: y_t = (1-a)*y_{t-1} +
    a*x_t is sequentially recursive, so no native window aggregate can
    express it; the whole ordered group must be visible at once. Arrow
    ships the group both ways and the recurrence runs once per row
    inside the group. The oracle replays it as a recursive CTE — two
    independent engines walking the same recurrence (alpha=0.5 keeps
    every step binary-exact so the chains match bitwise). At 100 TB
    the group key must be high-cardinality (entity id, not a 5-value
    priority — the 5-value key here is correctness-scale DEMO data);
    skewed giant groups are the failure mode to watch, same as any
    grouped map."""
    return (
        _scaling_src(spark, sf_dir)
        .groupBy("priority")
        .applyInPandas(_ewma_group, schema=EWMA_SCHEMA)
        .withColumn("ewma", F.round("ewma", 6))
        .orderBy("o_orderkey")
    )


#: Bounded-EWMA window width (rows of history kept per output row).
EWMA_WINDOW = 16

#: Contiguous o_orderkey span per stitch bucket for the two-level
#: bounded-frame walk (order-aligned with the window ORDER BY).
EWMA_KB_SPAN = 4096


def stitched_bounded_frames(
    src: DataFrame, part: str, key: str, val: str, n: int, span: int
) -> DataFrame:
    """Trailing n-row frame (`arr`: the last <= n `val`s ordered by
    `key`, oldest first) for every row, computed at corpus-parallel
    (part, bucket) keys instead of a single `part`-keyed window — the
    two-level stitch every bounded-frame day/series operator here uses,
    because a low-cardinality `part` window funnels each partition's
    full history through one task and WindowGroupLimit cannot prune a
    frame every row keeps.

    Rows bucket by contiguous `key` range (kb = key DIV span, order-
    aligned with the window's ORDER BY); the frame is collected within
    (part, kb); rows near a bucket's start prepend a carry: each bucket
    keeps its last n-1 vals (ordered), and the concatenation of the
    LAST n-1 prior buckets' tails provably contains the exact n-1 rows
    preceding the bucket (any row within the global last n-1 is within
    its own bucket's last n-1, and every non-empty bucket holds >= 1
    row, so n-1 buckets back is always far enough). The carry window is
    therefore rows-bounded — prevflat tops out at (n-1)^2 elements per
    bucket no matter how many buckets a partition accumulates — and the
    carries join is left to AQE (one row per (part, bucket) grows with
    the key range, so it is never force-broadcast; the equi-join key is
    the same (part, kb) the frame window just exchanged on).

    Preconditions (asserted / reserved):
    - ``n >= 2`` — n=1 would make the carry frame rowsBetween(0, -1)
      (invalid) and every slice zero-length; a 1-row trailing frame
      needs no stitch, use a plain bounded window.
    - ``key`` must be UNIQUE within each ``part`` — with duplicate
      keys the within-window collect_list tie order and the tails'
      array_sort(struct(key, val)) order can disagree, so the stitched
      frame may differ from the (itself nondeterministic)
      single-window form.
    - The output column ``arr`` is REPLACED if the source already has
      one; intermediate names are ``__sbf_``-prefixed so caller
      columns are never silently clobbered.

    Adversarially equivalence-tested against the single-window form in
    tests/test_window_stitching.py.
    """
    from pyspark.sql import Window

    if n < 2:
        raise ValueError(
            f"stitched_bounded_frames requires n >= 2 (got {n}); a "
            f"1-row trailing frame needs no stitch"
        )

    src = src.withColumn("__sbf_kb", F.expr(f"{key} DIV {span}"))
    wk = (
        Window.partitionBy(part, "__sbf_kb")
        .orderBy(key)
        .rowsBetween(-(n - 1), 0)
    )
    within = src.withColumn("__sbf_arr_w", F.collect_list(val).over(wk))
    # bounded per-(part, bucket) tail table: last n-1 vals in key order
    tails = (
        src.groupBy(part, "__sbf_kb")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(key, val))),
                lambda s: s[val],
            ).alias("__sbf_ordered")
        )
        .select(
            part,
            "__sbf_kb",
            F.slice(
                F.col("__sbf_ordered"),
                F.greatest(F.lit(1), F.size("__sbf_ordered") - (n - 1) + 1),
                n - 1,
            ).alias("__sbf_tail"),
        )
    )
    wc = (
        Window.partitionBy(part)
        .orderBy("__sbf_kb")
        .rowsBetween(-(n - 1), -1)
    )
    # the empty-carry fallback must match the caller's val type — a
    # hardcoded long would fail plan analysis for double/decimal vals
    vt = src.schema[val].dataType.simpleString()
    carries = tails.select(
        part,
        "__sbf_kb",
        F.flatten(
            F.coalesce(
                F.collect_list("__sbf_tail").over(wc),
                F.array().cast(f"array<array<{vt}>>"),
            )
        ).alias("__sbf_prevflat"),
    ).select(
        part,
        "__sbf_kb",
        F.slice(
            F.col("__sbf_prevflat"),
            F.greatest(F.lit(1), F.size("__sbf_prevflat") - (n - 1) + 1),
            n - 1,
        ).alias("__sbf_carry"),
    )
    stitched = within.join(carries, [part, "__sbf_kb"]).withColumn(
        "__sbf_full", F.concat(F.col("__sbf_carry"), F.col("__sbf_arr_w"))
    )
    return (
        stitched.withColumn(
            "arr",
            F.slice(
                F.col("__sbf_full"),
                F.greatest(F.lit(1), F.size("__sbf_full") - n + 1),
                n,
            ),
        )
        .drop(
            "__sbf_kb",
            "__sbf_arr_w",
            "__sbf_tail",
            "__sbf_carry",
            "__sbf_full",
        )
    )


@query(
    "window_ewma_bounded",
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey, o_orderpriority AS priority,
             o_totalprice AS totalprice,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    framed AS (
      SELECT o_orderkey, priority, totalprice,
             list(cents) OVER (PARTITION BY priority ORDER BY o_orderkey
               ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW)
               AS arr
      FROM src
    )
    SELECT o_orderkey, priority, totalprice,
           round(CAST(list_sum(list_transform(range(1, len(arr) + 1),
                       i -> arr[i] * (CAST(1 AS BIGINT) << (i - 1))))
                      AS DOUBLE)
                 / (((CAST(1 AS BIGINT) << len(arr)) - 1) * 100.0), 6)
             AS ewma_b
    FROM framed ORDER BY o_orderkey
    """,
)
def q_window_ewma_bounded(spark, sf_dir: str) -> DataFrame:
    """Truncated exponential moving average as a NATIVE window — the
    100 TB answer to `grouped_pandas_ewma`'s Python boundary when a
    bounded memory horizon is acceptable: pandas' ewm(adjust=True)
    restricted to the last EWMA_WINDOW rows,
    y_t = Σ_j 2^-j·x_{t-j} / Σ_j 2^-j (j=0..15). With α=½ the weight
    2^-j beyond j=15 is ≤ 3·10⁻⁵ of the mass, so the truncation error
    is negligible while the operator stays entirely inside whole-stage
    codegen — no Arrow hop, no whole-group materialization, no
    giant-group straggler (the recursive exact form keeps its pandas
    implementation next door for when the infinite tail matters).

    Cross-engine exactness WITHOUT float-order assumptions: prices
    scale to integer cents (round(x·100) — exact for 2-dp money
    doubles), weights become integer bit-shifts (weight of the row at
    frame position i is 2^(i-1), newest largest), so numerator and
    denominator are EXACT INT64 sums in any order; the single double
    division at the end is IEEE-identical on both engines. The frame
    array is collected oldest→newest on both sides.

    Scale shape (round 9): the 16-row frame is stitched at
    corpus-parallel keys — rows bucket by contiguous o_orderkey range
    (order-aligned with the window's ORDER BY), the frame is collected
    within (priority, bucket), and rows near a bucket's start prepend
    a carry of the preceding rows taken from the bounded per-bucket
    tail table: each bucket keeps its last 15 cents (ordered), and the
    concatenation of the LAST 15 prior buckets' tails provably contains
    the exact 15 rows preceding the bucket (any row within the global
    last 15 is within its own bucket's last 15, and every non-empty
    bucket holds >= 1 row, so 15 buckets back is always far enough), so
    slicing its tail yields a frame bit-identical to the single
    priority-keyed window — which would funnel each priority's entire
    history through one task, and which WindowGroupLimit cannot prune
    (every row keeps its frame). The carry window itself is rows-
    bounded and the carries join is left to AQE (the table grows with
    the key range, so it is never force-broadcast)."""
    src = _scaling_src(spark, sf_dir).withColumn(
        "cents", F.round(F.col("totalprice") * 100).cast("long")
    )
    framed = stitched_bounded_frames(
        src, "priority", "o_orderkey", "cents", EWMA_WINDOW, EWMA_KB_SPAN
    )
    num = F.expr(
        "aggregate(zip_with(arr, sequence(0, size(arr) - 1),"
        " (x, i) -> x * shiftleft(1L, i)), 0L, (a, b) -> a + b)"
    )
    # F.shiftleft only takes a literal bit count — use the SQL form
    # for a column-valued shift.
    den = F.expr("shiftleft(1L, size(arr)) - 1L")
    return (
        framed.select(
            "o_orderkey",
            "priority",
            "totalprice",
            F.round(num.cast("double") / (den * 100.0), 6).alias("ewma_b"),
        )
        .orderBy("o_orderkey")
    )


#: Periodicity probe grid (lags, in days) and the shared day width.
PGRAM_LAGS: tuple[int, ...] = tuple(range(2, 11))
_PGRAM_DAY_US = 86_400_000_000
PGRAM_SCHEMA = (
    "event_type string, n_days long, best_lag long, best_acf_r6 double"
)


def _periodogram_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact-integer ACF sweep for one event type. All moments use
    PYTHON ints (arbitrary precision — n·y products overflow int64 at
    100 TB daily volumes), mirroring the oracle's DECIMAL algebra
    bit-for-bit; only the final num/den division is float."""
    pdf = pdf.sort_values("day")
    y = [int(v) for v in pdf["y"]]
    n, s = len(y), sum(int(v) for v in y)
    z = [n * v - s for v in y]
    den = sum(v * v for v in z)
    best_lag, best_acf = None, None
    for lag in PGRAM_LAGS:
        if lag >= n or den == 0:
            continue
        num = sum(z[t] * z[t + lag] for t in range(n - lag))
        acf = round(float(num) / float(den), 6)
        if best_acf is None or acf > best_acf:
            best_lag, best_acf = lag, acf
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_days": [n],
            "best_lag": [best_lag],
            "best_acf_r6": [best_acf],
        }
    )


@query(
    "grouped_pandas_periodogram",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_PGRAM_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM daily GROUP BY 1
    ),
    z AS (
      SELECT d.event_type, d.day,
             CAST(st.n * d.y - st.s AS DECIMAL(19,0)) AS z, st.n
      FROM daily d JOIN stats st USING (event_type)
    ),
    den AS (
      SELECT event_type, CAST(SUM(z * z) AS DOUBLE) AS den,
             CAST(MAX(n) AS BIGINT) AS n
      FROM z GROUP BY 1
    ),
    num AS (
      {" UNION ALL ".join(
          f'''SELECT event_type, CAST({L} AS BIGINT) AS lag,
             CAST(SUM(zz) AS DOUBLE) AS num
      FROM (SELECT event_type,
                   z * LEAD(z, {L}) OVER (PARTITION BY event_type
                                          ORDER BY day) AS zz
            FROM z) GROUP BY 1'''
          for L in range(2, 11)
      )}
    ),
    acf AS (
      SELECT n2.event_type, n2.lag,
             round(n2.num / d2.den, 6) AS acf_r6,
             ROW_NUMBER() OVER (PARTITION BY n2.event_type
                                ORDER BY round(n2.num / d2.den, 6) DESC,
                                         n2.lag) AS rk
      FROM num n2 JOIN den d2 USING (event_type)
      WHERE n2.lag < d2.n AND d2.den <> 0
    )
    SELECT a.event_type, d3.n AS n_days, a.lag AS best_lag,
           a.acf_r6 AS best_acf_r6
    FROM acf a JOIN den d3 USING (event_type)
    WHERE a.rk = 1 ORDER BY a.event_type
    """,
    tags=("timeseries", "pandas", "beyond"),
)
def q_grouped_pandas_periodogram(spark, sf_dir: str) -> DataFrame:
    """Per-series dominant-period detection: for each event type, the
    lag in 2..10 days whose autocorrelation of the daily-count series
    is highest — the auto-period pass a monitoring platform runs
    before configuring seasonal baselines (window_seasonal_decompose
    hard-codes 7; this measures whether 7 is even right, per series).

    Demonstrates the applyInPandas EXACTNESS contract at the Arrow
    boundary: the group lands in pandas, but every moment is computed
    in arbitrary-precision PYTHON ints (n·y − S products overflow
    int64 at 100 TB daily volumes) mirroring the oracle's DECIMAL
    algebra exactly; only the final num/den division is float, then
    round-6, and the argmax tie-breaks toward the smaller lag on both
    engines.

    Scale: corpus → |types|×|days| bounded table in one combinable
    aggregation; each group ships ~|days| rows through Arrow. The
    group key here is demo-cardinality; at 100 TB you'd key by entity
    (same caveat as grouped_pandas_ewma)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _PGRAM_DAY_US).cast("long").alias("day"),
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    return (
        daily.groupBy("event_type")
        .applyInPandas(_periodogram_group, schema=PGRAM_SCHEMA)
        .orderBy("event_type")
    )
