"""Cleaning / projection / filtering operators (SURVEY §2.2).

Generic, composable ``DataFrame -> DataFrame`` functions implementing
the reference's cleaning stage (reference: spark_pipeline/
transform_job.py:181-233 `clean_data`) plus the Superset-side adhoc
filters. All pure native column expressions — every one of these stays
inside whole-stage codegen and pushes down to the scan where possible.

Each operator also registers a testdata query with a DuckDB oracle.
Testdata has no nulls, so the null-handling queries first *derive* a
deterministic nullable column (CASE on a key) and then clean it — the
cleaning semantics are what the oracle checks.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


# ---------------------------------------------------------------------------
# Reusable operators


def filter_required_fields(df: DataFrame, required: Iterable[str]) -> DataFrame:
    """Drop rows where any required column is null or empty string
    (reference: transform_job.py:192-195)."""
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull() & (F.col(c) != "")
    return df.filter(cond)


def filter_unknown_sentinel(
    df: DataFrame, column: str, sentinels: tuple[str, ...] = ("", "unknown")
) -> DataFrame:
    """Drop rows whose value is empty or a case-insensitive sentinel,
    after trimming (reference: insert_to_postgres.py:67-83)."""
    norm = F.lower(F.trim(F.col(column)))
    return df.filter(F.col(column).isNotNull() & ~norm.isin(*sentinels))


def project_rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Systematic column renames (reference: transform_job.py:198-202,
    222-229 — companie→compagnie, via→source, ...)."""
    return df.withColumnsRenamed(dict(mapping))


def fillna_unspecified(df: DataFrame, value: str = "Unspecified") -> DataFrame:
    """Fill remaining nulls in all string columns with a sentinel
    (reference: transform_job.py:231)."""
    string_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    return df.fillna(value, subset=string_cols)


def split_csv(col: str | Column, sep: str = r",\s*") -> Column:
    """Comma-separated string → trimmed array (reference:
    transform_job.py:205-217)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(F.split(c, sep), lambda x: F.trim(x))


def trim_cast(col: str | Column) -> Column:
    """trim(cast(string)) normalization (reference:
    transform_job.py:218-220)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c.cast("string"))


def lower_norm(col: str | Column) -> Column:
    """lowercase+trim natural-key normalization before dimension
    matching (reference: insert_to_postgres.py:71,81)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


# ---------------------------------------------------------------------------
# Registry queries (testdata + oracle twins)


@query(
    "filter_required_fields",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN NULL
                  WHEN doc_id % 11 = 0 THEN ''
                  ELSE text END AS body,
             lang, source
      FROM documents
    )
    SELECT doc_id, lang, source FROM d
    WHERE body IS NOT NULL AND body <> ''
      AND lang IS NOT NULL AND lang <> ''
      AND source IS NOT NULL AND source <> ''
    ORDER BY doc_id
    """,
)
def q_filter_required_fields(spark, sf_dir: str) -> DataFrame:
    """Required-field row filter over a derived nullable column."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "body",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 11 == 0, F.lit(""))
        .otherwise(F.col("text")),
    )
    return (
        filter_required_fields(docs, ["body", "lang", "source"])
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@query(
    "filter_unknown_sentinel",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN ' Unknown '
                  WHEN doc_id % 5 = 1 THEN ''
                  WHEN doc_id % 5 = 2 THEN 'UNKNOWN'
                  ELSE lang END AS lang_raw
      FROM documents
    )
    SELECT doc_id, lang_raw FROM d
    WHERE lang_raw IS NOT NULL
      AND LOWER(TRIM(lang_raw)) NOT IN ('', 'unknown')
    ORDER BY doc_id
    """,
)
def q_filter_unknown_sentinel(spark, sf_dir: str) -> DataFrame:
    """Sentinel-value filter (case-insensitive, trimmed)."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "lang_raw",
        F.when(F.col("doc_id") % 5 == 0, F.lit(" Unknown "))
        .when(F.col("doc_id") % 5 == 1, F.lit(""))
        .when(F.col("doc_id") % 5 == 2, F.lit("UNKNOWN"))
        .otherwise(F.col("lang")),
    )
    return (
        filter_unknown_sentinel(docs, "lang_raw")
        .select("doc_id", "lang_raw")
        .orderBy("doc_id")
    )


@query(
    "project_rename",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS company,
           c_mktsegment AS sector
    FROM customer ORDER BY customer_id
    """,
)
def q_project_rename(spark, sf_dir: str) -> DataFrame:
    """Systematic renames via withColumnsRenamed."""
    df = project_rename(
        load(spark, sf_dir, "customer"),
        {"c_custkey": "customer_id", "c_name": "company", "c_mktsegment": "sector"},
    )
    return df.select("customer_id", "company", "sector").orderBy("customer_id")


@query(
    "project_drop",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
    FROM orders ORDER BY o_orderkey
    """,
)
def q_project_drop(spark, sf_dir: str) -> DataFrame:
    """Drop replaced columns (reference: transform_job.py:228).
    Catalyst folds the drop into scan-level column pruning."""
    return (
        load(spark, sf_dir, "orders")
        .drop("o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    )


@query(
    "fillna_unspecified",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS source_raw,
             CASE WHEN doc_id % 4 = 0 THEN NULL ELSE lang END AS lang_raw
      FROM documents
    )
    SELECT doc_id,
           COALESCE(source_raw, 'Unspecified') AS source_raw,
           COALESCE(lang_raw, 'Unspecified') AS lang_raw
    FROM d ORDER BY doc_id
    """,
)
def q_fillna_unspecified(spark, sf_dir: str) -> DataFrame:
    """Null → 'Unspecified' across all string columns."""
    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0, None)
            .otherwise(F.col("source"))
            .alias("source_raw"),
            F.when(F.col("doc_id") % 4 == 0, None)
            .otherwise(F.col("lang"))
            .alias("lang_raw"),
        )
    )
    return fillna_unspecified(docs).orderBy("doc_id")


@query(
    "filter_schema_validate",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                    IS NOT NULL
                AND event_type IN ('click','view','purchase','signup','error')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                    IS NULL
                OR event_type NOT IN ('click','view','purchase','signup','error')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
    FROM events
    """,
)
def q_filter_schema_validate(spark, sf_dir: str) -> DataFrame:
    """Schema validation at ingest (reference: jsonschema gate,
    Websites/__init__.py:210-235): parse the JSON payload against a
    declared schema, check required typed fields + enum membership."""
    allowed = ["click", "view", "purchase", "signup", "error"]
    parsed = load(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").try_cast("long")
    )
    valid = F.col("k").isNotNull() & F.col("event_type").isin(allowed)
    return parsed.agg(
        F.sum(F.when(valid, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(~valid, 1).otherwise(0)).alias("n_invalid"),
    )


#: Wide→long metric melt: the lineitem measure columns.
UNPIVOT_METRICS: tuple[str, ...] = (
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
)


@query(
    "project_unpivot_metrics",
    oracle=f"""
    WITH long AS (
      {" UNION ALL ".join(
          f"SELECT '{m}' AS metric, {m} AS value FROM lineitem"
          for m in UNPIVOT_METRICS
      )}
    )
    SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total,
           round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_r6
    FROM long GROUP BY metric ORDER BY metric
    """,
)
def q_project_unpivot_metrics(spark, sf_dir: str) -> DataFrame:
    """Wide→long melt of the lineitem measure columns via the native
    `unpivot` operator (Spark 3.4+), then a per-metric profile — the
    reshape every metrics warehouse does before feeding a generic
    (metric, value) monitoring sink, expressed WITHOUT the 4× scan a
    UNION-ALL-per-column rewrite costs: unpivot is a single-pass
    Expand node, so the table is read once and each row fans out to
    |metrics| rows in the operator, not at the source.

    The oracle IS the union-all rewrite — proving the one-pass Expand
    and the 4-scan union produce identical profiles. Totals are exact
    DECIMAL sums surfaced as doubles; the mean divides exact sums.

    Scale: one scan + one |metrics|-key combinable aggregation; the
    fan-out multiplies rows AFTER column pruning (only the four
    measure columns are read — Expand's input schema is pruned like
    any projection)."""
    long = (
        load(spark, sf_dir, "lineitem")
        .unpivot(
            ids=[],
            values=list(UNPIVOT_METRICS),
            variableColumnName="metric",
            valueColumnName="value",
        )
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_r6"),
        )
        .orderBy("metric")
    )
