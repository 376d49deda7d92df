"""Date normalization and calendar functions (SURVEY §2.8).

The reference parses heterogeneous scraped date strings with a Python
row UDF (reference: spark_pipeline/transform_job.py:120-142,178
`normalize_date_udf`) and derives calendar attributes in driver-side
Python (insert_to_postgres.py:96-131). Both are rewritten here as pure
native column expressions — no BatchEvalPython node, whole-stage
codegen stays intact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: The reference's accepted formats (transform_job.py:124-128), in
#: Spark datetime-pattern syntax. Month-name formats ('d MMM-HH:mm')
#: are locale-sensitive and exercised in unit tests, not the oracle.
DATE_FORMATS = ("yyyy-MM-dd", "dd/MM/yyyy", "dd-MM-yyyy")

DEFAULT_DATE = "2000-01-01"


def parse_multiformat_date(col: str | Column, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """First-match-wins multi-format date parse; unparseable → null.

    Native rewrite of `normalize_date_udf`: ``COALESCE(try_to_date(c,
    f1), try_to_date(c, f2), ...)`` — Catalyst evaluates lazily left to
    right, so the common format short-circuits.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_date(c, f) for f in formats])


def with_default_date(col: Column, default: str = DEFAULT_DATE) -> Column:
    """Sentinel date for unparseable input (reference:
    insert_to_postgres.py:10,160-164)."""
    return F.coalesce(col, F.lit(default).cast("date"))


def parse_relative_date(col: str | Column, anchor: Column | None = None) -> Column:
    """'yesterday' / 'N days ago' / 'N hours ago' → absolute date
    (reference: data_extraction/Websites/bayt.py:30-67).

    `anchor` is the "now" timestamp (defaults to current_timestamp);
    pinned to a literal in tests/oracle so results are deterministic.
    """
    c = F.col(col) if isinstance(col, str) else col
    now = anchor if anchor is not None else F.current_timestamp()
    lc = F.lower(F.trim(c))
    n_days = F.regexp_extract(lc, r"^(\d+)\s+days?\s+ago$", 1).try_cast("int")
    n_hours = F.regexp_extract(lc, r"^(\d+)\s+hours?\s+ago$", 1).try_cast("int")
    return (
        F.when(lc == "yesterday", F.date_sub(now.cast("date"), 1))
        .when(n_days.isNotNull(), F.date_sub(now.cast("date"), n_days))
        .when(
            n_hours.isNotNull(),
            (now - n_hours * F.expr("INTERVAL 1 HOUR")).cast("date"),
        )
        .otherwise(F.try_to_date(c))
    )


def calendar_attrs(df: DataFrame, date_col: str) -> DataFrame:
    """Derive the reference's calendar-dimension attributes
    (insert_to_postgres.py:96-131; schema.sql:4-12): year, quarter,
    month, month name, day, year_month int, ISO day-of-week, ISO week,
    dd/mm/yyyy display string.

    Spark's `dayofweek` is 1=Sunday; ISO (1=Monday) is
    ``((dayofweek+5) % 7) + 1``. `weekofyear` is already ISO.
    """
    d = F.col(date_col)
    return df.select(
        d.alias("full_date"),
        F.year(d).cast("long").alias("annee"),
        F.quarter(d).cast("long").alias("trimestre"),
        F.month(d).cast("long").alias("mois"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.dayofmonth(d).cast("long").alias("jour"),
        (F.year(d) * 100 + F.month(d)).cast("long").alias("year_month"),
        (((F.dayofweek(d) + 5) % 7) + 1).cast("long").alias("jour_semaine"),
        F.weekofyear(d).cast("long").alias("week_of_year"),
        F.date_format(d, "dd/MM/yyyy").alias("date_str"),
    )


def calendar_range(df: DataFrame, date_col: str) -> DataFrame:
    """Densified calendar: one row per day between min and max
    (reference: insert_to_postgres.py:113-134). `sequence` + `explode`
    — generated on executors, no shuffle, no driver loop."""
    bounds = df.agg(
        F.min(F.col(date_col).cast("date")).alias("d0"),
        F.max(F.col(date_col).cast("date")).alias("d1"),
    )
    return bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("full_date")
    )


# ---------------------------------------------------------------------------
# Registry queries


@query(
    "fn_date_multiformat",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
               WHEN 2 THEN strftime(o_orderdate, '%d-%m-%Y')
               ELSE 'not a date' END AS date_raw
      FROM orders
    )
    SELECT o_orderkey,
           COALESCE(
             CAST(try_strptime(date_raw, '%Y-%m-%d') AS DATE),
             CAST(try_strptime(date_raw, '%d/%m/%Y') AS DATE),
             CAST(try_strptime(date_raw, '%d-%m-%Y') AS DATE),
             DATE '2000-01-01') AS parsed_date
    FROM raw ORDER BY o_orderkey
    """,
)
def q_fn_date_multiformat(spark, sf_dir: str) -> DataFrame:
    """Multi-format date parse with sentinel default: the testdata
    dates are first *formatted out* into 4 heterogeneous string shapes
    (one per key residue, the 4th garbage), then parsed back."""
    raw = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", "dd-MM-yyyy"))
        .otherwise(F.lit("not a date"))
        .alias("date_raw"),
    )
    # Sort FIRST, parse after: the multi-format parse cascade is the
    # expensive expression, and below the sort's range exchange it
    # would run inside the (row-group-bounded) scan tasks; above it,
    # it runs on every post-shuffle partition. Same single shuffle,
    # same output order — the exchange just carries the raw string
    # instead of the parsed date (1.9 s → ~1.0 s at sf0.1/local[32]).
    return raw.orderBy("o_orderkey").select(
        "o_orderkey",
        with_default_date(parse_multiformat_date("date_raw")).alias("parsed_date"),
    )


@query(
    "fn_relative_date",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 5
               WHEN 0 THEN 'yesterday'
               WHEN 1 THEN CAST(o_orderkey % 30 AS VARCHAR) || ' days ago'
               WHEN 2 THEN CAST(o_orderkey % 48 AS VARCHAR) || ' hours ago'
               WHEN 3 THEN '1 day ago'
               ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_raw
      FROM orders
    ),
    anchor AS (SELECT TIMESTAMP '2025-08-01 00:00:00' AS now)
    SELECT o_orderkey,
           CASE
             WHEN LOWER(TRIM(date_raw)) = 'yesterday'
               THEN CAST(now AS DATE) - 1
             WHEN regexp_extract(LOWER(TRIM(date_raw)), '^(\\d+)\\s+days?\\s+ago$', 1) <> ''
               THEN CAST(now AS DATE)
                    - CAST(regexp_extract(LOWER(TRIM(date_raw)), '^(\\d+)\\s+days?\\s+ago$', 1) AS INTEGER)
             WHEN regexp_extract(LOWER(TRIM(date_raw)), '^(\\d+)\\s+hours?\\s+ago$', 1) <> ''
               THEN CAST(now - to_hours(CAST(regexp_extract(LOWER(TRIM(date_raw)), '^(\\d+)\\s+hours?\\s+ago$', 1) AS BIGINT)) AS DATE)
             ELSE CAST(try_strptime(date_raw, '%Y-%m-%d') AS DATE)
           END AS resolved_date
    FROM raw, anchor ORDER BY o_orderkey
    """,
)
def q_fn_relative_date(spark, sf_dir: str) -> DataFrame:
    """Relative-date resolution against a pinned anchor timestamp."""
    raw = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("yesterday"))
        .when(
            F.col("o_orderkey") % 5 == 1,
            F.concat((F.col("o_orderkey") % 30).cast("string"), F.lit(" days ago")),
        )
        .when(
            F.col("o_orderkey") % 5 == 2,
            F.concat((F.col("o_orderkey") % 48).cast("string"), F.lit(" hours ago")),
        )
        .when(F.col("o_orderkey") % 5 == 3, F.lit("1 day ago"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("date_raw"),
    )
    anchor = F.lit("2025-08-01 00:00:00").cast("timestamp")
    # Sort FIRST, resolve after: the regex branches are the expensive
    # expressions — above the range exchange they evaluate on every
    # post-shuffle partition instead of inside the scan tasks (2.7 s →
    # ~1.5 s at sf0.1/local[32]; same single shuffle, same order).
    return raw.orderBy("o_orderkey").select(
        "o_orderkey",
        parse_relative_date("date_raw", anchor=anchor).alias("resolved_date"),
    )


@query(
    "fn_calendar_attrs",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS fd FROM orders)
    SELECT fd AS full_date,
           year(fd) AS annee,
           quarter(fd) AS trimestre,
           month(fd) AS mois,
           monthname(fd) AS month_name,
           day(fd) AS jour,
           year(fd) * 100 + month(fd) AS year_month,
           isodow(fd) AS jour_semaine,
           weekofyear(fd) AS week_of_year,
           strftime(fd, '%d/%m/%Y') AS date_str
    FROM d ORDER BY full_date
    """,
)
def q_fn_calendar_attrs(spark, sf_dir: str) -> DataFrame:
    """Full calendar-attribute derivation over the distinct date set."""
    dates = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date").alias("fd"))
        .distinct()
    )
    return calendar_attrs(dates, "fd").orderBy("full_date")


@query(
    "fn_calendar_range",
    oracle="""
    WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
                      CAST(MAX(o_orderdate) AS DATE) AS d1 FROM orders)
    SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                       CAST(d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS full_date
    FROM b ORDER BY full_date
    """,
)
def q_fn_calendar_range(spark, sf_dir: str) -> DataFrame:
    """Calendar densification between the fact table's date bounds."""
    return calendar_range(load(spark, sf_dir, "orders"), "o_orderdate").orderBy(
        "full_date"
    )


@query(
    "fn_default_date",
    oracle="""
    SELECT DISTINCT COALESCE(CAST(try_strptime(o_orderstatus, '%Y-%m-%d') AS DATE),
                             DATE '2000-01-01') AS fallback_date
    FROM orders
    """,
)
def q_fn_default_date(spark, sf_dir: str) -> DataFrame:
    """Unparseable input collapses to the sentinel date."""
    return (
        load(spark, sf_dir, "orders")
        .select(
            with_default_date(F.try_to_date("o_orderstatus", "yyyy-MM-dd")).alias(
                "fallback_date"
            )
        )
        .distinct()
    )
