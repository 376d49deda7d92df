"""Deduplication operators (SURVEY §2.3).

The reference deduplicates at three layers: in-Spark exact dedup on the
natural key (transform_job.py:199), scraper-side incremental anti-dedup
against previously-seen URLs (Websites/__init__.py:238-246), and
warehouse-side SELECT-before-INSERT rejection backed by a UNIQUE
constraint (Postgres/_init_postgres.py:103-105, schema.sql:69).

All variants here are shuffle-on-key hash dedups or broadcast/shuffle
anti-joins — the two shapes that survive 100 TB (dedup never needs a
global sort; an anti-join against a small "seen" set broadcasts).

Determinism note: `dropDuplicates` keeps an arbitrary row per key,
which can't hash-match an oracle. Where the *surviving row* matters,
`dedup_keep_min` picks a deterministic winner with one window pass —
same shuffle count as `dropDuplicates`, reproducible output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


def dedup_exact(df: DataFrame, keys: list[str]) -> DataFrame:
    """Exact dedup on a natural key — `dropDuplicates` (reference:
    transform_job.py:199). Arbitrary survivor; cheapest form."""
    return df.dropDuplicates(keys)


def dedup_keep_min(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Deterministic dedup: keep the row with the smallest `order_col`
    per key group. One shuffle on `keys` (window), no join."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_incremental(new_df: DataFrame, seen_df: DataFrame, key: str) -> DataFrame:
    """Anti-join of a new batch against previously-seen keys
    (reference: Websites/__init__.py:238-246 `check_duplicate` — a
    per-record linear scan; here one distributed anti-join. When the
    seen-side is small it broadcasts; at scale AQE picks the strategy)."""
    return new_df.join(seen_df.select(key).distinct(), on=key, how="left_anti")


# ---------------------------------------------------------------------------
# Registry queries


@query(
    "dedup_by_url",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderstatus,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_orderstatus
    FROM ranked WHERE rn = 1 ORDER BY o_custkey
    """,
)
def q_dedup_by_url(spark, sf_dir: str) -> DataFrame:
    """Exact dedup on a natural key, deterministic survivor (first
    order per customer stands in for first scrape of a job_url)."""
    return (
        dedup_keep_min(
            load(spark, sf_dir, "orders").select(
                "o_custkey", "o_orderkey", "o_orderstatus"
            ),
            ["o_custkey"],
            "o_orderkey",
        )
        .orderBy("o_custkey")
    )


@query(
    "dedup_incremental",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      AND NOT EXISTS (
        SELECT 1 FROM orders s
        WHERE s.o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
          AND s.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
)
def q_dedup_incremental(spark, sf_dir: str) -> DataFrame:
    """New-batch vs seen-keys anti-join: orders from 2001 whose
    customer never appeared before 2001."""
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit("2001-01-01 00:00:00").cast("timestamp")
    new_batch = orders.filter(F.col("o_orderdate") >= cutoff)
    seen = orders.filter(F.col("o_orderdate") < cutoff)
    return (
        dedup_incremental(new_batch, seen.select("o_custkey"), "o_custkey")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    )


@query(
    "dedup_load_time",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate < DATE '1996-01-01')
    ORDER BY c_custkey
    """,
)
def q_dedup_load_time(spark, sf_dir: str) -> DataFrame:
    """Warehouse-side duplicate rejection: rows whose key already
    exists in the target table are dropped before append (reference:
    SELECT-before-INSERT probe, _init_postgres.py:103-105). Expressed
    as one anti-join instead of one RPC per row. The "already loaded"
    set is a load SNAPSHOT — orders before the 1996-01-01 cutoff, the
    state of the target after the previous incremental run — which
    also keeps the oracle check non-vacuous: this testdata has
    complete FK coverage, so probing the full orders table made the
    survivor set (and hence the driver's value-hash comparison) empty
    at every gate scale (found by the r14 empty-result audit; ~22%
    of customers survive at each SF with the snapshot probe)."""
    customer = load(spark, sf_dir, "customer")
    existing = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").cast("date")
            < F.lit("1996-01-01").cast("date")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        dedup_incremental(customer, existing, "c_custkey")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "dedup_secondary_date",
    oracle="""
    SELECT e.event_id, e.user_id
    FROM events e
    WHERE e.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events s
        WHERE s.event_type = 'click'
          AND s.user_id = e.user_id
          AND CAST(s.ts AS DATE) = CAST(e.ts AS DATE))
    ORDER BY e.event_id
    """,
)
def q_dedup_secondary_date(spark, sf_dir: str) -> DataFrame:
    """Secondary heuristic dedup on a date key (reference:
    MarocAnn.py:229-234 drops offers whose publication_date already
    seen): purchases with no same-day click by the same user."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("date").alias("d")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    return (
        purchases.join(clicks, on=["user_id", "d"], how="left_anti")
        .select("event_id", "user_id")
        .orderBy("event_id")
    )


@query(
    "dedup_skill_set",
    oracle="""
    SELECT doc_id, COUNT(DISTINCT t.token) AS n_unique_tokens
    FROM documents, unnest(string_split(text, ' ')) AS t(token)
    WHERE t.token <> ''
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_dedup_skill_set(spark, sf_dir: str) -> DataFrame:
    """Per-record set-dedup of extracted items (reference:
    skillner_logic.py:69-80 drops repeated skill names per offer) —
    `array_distinct` on the tokenized text, no explode needed."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.filter(F.split("text", " "), lambda x: x != "")
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(tokens)).cast("long").alias("n_unique_tokens"),
    ).orderBy("doc_id")


@query(
    "dedup_bridge_conflict",
    oracle="""
    SELECT DISTINCT l_orderkey AS id_offer, l_partkey AS id_skill
    FROM lineitem ORDER BY 1, 2
    """,
)
def q_dedup_bridge_conflict(spark, sf_dir: str) -> DataFrame:
    """M:N bridge idempotence (reference: ON CONFLICT DO NOTHING on
    (id_offer, id_skill), insert_to_postgres.py:236-242) — projected
    DISTINCT on the composite key before append."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("id_offer"), F.col("l_partkey").alias("id_skill")
        )
        .distinct()
        .orderBy("id_offer", "id_skill")
    )


def canonicalize_url(col: F.Column) -> F.Column:
    """URL canonicalization for dedup keys (training pipelines dedup
    crawl URLs BEFORE content dedup; the reference's natural key is the
    raw job_url, which misses trivial variants). Steps, all native
    regexp expressions: drop the #fragment, drop utm_* tracking
    params, drop a then-empty '?', strip scheme + 'www.', lowercase
    the host (path case is preserved — it can be significant), strip
    the trailing-slash RUN ('/+$', so canonicalization is idempotent:
    canon(canon(u)) == canon(u), pinned by a hypothesis test).
    Simplification: a utm param sandwiched between other params leaves
    a '&' artifact — acceptable for a dedup KEY (it is applied
    identically to every variant)."""
    u = F.regexp_replace(col, "#.*$", "")
    u = F.regexp_replace(u, "[?&]utm_[^&]*", "")
    u = F.regexp_replace(u, "\\?$", "")
    u = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://(www\\.)?", "")
    u = F.concat(
        F.lower(F.regexp_extract(u, "^[^/]*", 0)),
        F.regexp_replace(u, "^[^/]*", ""),
    )
    return F.regexp_replace(u, "/+$", "")


#: Deterministic URL-variant synthesis shared with the oracle: four
#: scrapes of the same posting differ by trailing slash, utm tracking
#: and fragment; host case varies with the doc id.
_URL_SQL = """
      SELECT doc_id,
             'HTTPS://Jobs.Example.COM/post/' || CAST(doc_id % 125 AS VARCHAR)
             || CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/'
                 WHEN 2 THEN '?utm_source=feed' ELSE '#apply' END AS url
      FROM documents
"""


@query(
    "dedup_url_canonical",
    oracle=f"""
    WITH urls AS ({_URL_SQL}),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               lower(regexp_extract(u4, '^[^/]*'))
                 || regexp_replace(u4, '^[^/]*', ''),
               '/+$', '') AS canonical_url
      FROM (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(url, '#.*$', ''),
                   '[?&]utm_[^&]*', ''),
                 '\\?$', ''),
               '^[a-zA-Z][a-zA-Z0-9+.-]*://(www\\.)?', '') AS u4
        FROM urls)
    )
    SELECT canonical_url,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_doc,
           COUNT(*) AS n_variants
    FROM canon GROUP BY 1 ORDER BY 1
    """,
)
def q_dedup_url_canonical(spark, sf_dir: str) -> DataFrame:
    """URL dedup AFTER canonicalization: four scrape variants of each
    posting (slash / utm / fragment / bare, synthesized
    deterministically) collapse onto one canonical key; survivor =
    min doc_id per key, with the variant count proving all four forms
    merged. One narrow projection + one hash aggregation — no text
    shuffle, scales as a single pass."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("HTTPS://Jobs.Example.COM/post/"),
        (F.col("doc_id") % 125).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(""))
        .when(F.col("doc_id") % 4 == 1, F.lit("/"))
        .when(F.col("doc_id") % 4 == 2, F.lit("?utm_source=feed"))
        .otherwise(F.lit("#apply")),
    )
    return (
        docs.withColumn("canonical_url", canonicalize_url(url))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("survivor_doc"),
            F.count("*").alias("n_variants"),
        )
        .orderBy("canonical_url")
    )
