"""Data-quality expectation validation + snapshot change capture
(beyond-reference, Deequ-style).

The reference validates records one at a time with jsonschema at the
scrape edge (data_extraction/Websites/__init__.py:210-235) and lets
Postgres constraints (docker-entrypoint-initdb.d/schema.sql:62,69,87)
reject bad rows at load. A production pipeline validates RELATIONS:
declare expectations (domain ranges, key uniqueness, referential
integrity), evaluate them as aggregates over the whole table, and gate
the run on the violation report. That is what `validate_expectations`
expresses.

`cdc_snapshot_diff` is the other warehouse primitive the reference
lacks: given two snapshots of an entity table, derive the
insert/update/delete changeset (the input that merge_cdc_feed /
merge_scd2 consume). The reference instead re-reads everything and
dedups by URL (insert_to_postgres.py:103-105) — O(full reload) per
run; a snapshot diff is the scalable alternative.

Scale shape:
- Expectations over one table collapse into a SINGLE conditional
  aggregation pass (sum(when(...))) — one scan, map-side partials, no
  shuffle beyond the 1-row agg. Referential integrity is a left-anti
  join; at 100 TB the FK side shuffles on the key once (or broadcasts
  when the PK side is a bounded dimension).
- Snapshot diff is one full-outer join on the entity key — the same
  single key-shuffle as any dedup; unchanged rows are filtered
  pre-output so the changeset, not the table, is what moves downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


def expectation_report(rules: dict[str, DataFrame]) -> DataFrame:
    """Union per-rule violation counts into one (rule, violations,
    passed) report relation. Each input DF must be a single row with a
    `violations` bigint column."""
    out = None
    for rule, df in rules.items():
        row = df.select(
            F.lit(rule).alias("rule"),
            F.col("violations").cast("long").alias("violations"),
            (F.col("violations") == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "validate_expectations",
    oracle="""
    SELECT 'lineitem_discount_range' AS rule,
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
               THEN 1 ELSE 0 END) = 0 AS passed
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
               THEN 1 ELSE 0 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'orders_custkey_ref_integrity',
           CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'orders_pk_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           COUNT(*) - COUNT(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'orders_status_domain',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
               THEN 1 ELSE 0 END) = 0
    FROM orders
    ORDER BY rule
    """,
)
def q_validate_expectations(spark, sf_dir: str) -> DataFrame:
    """Declarative expectation suite over orders/lineitem/customer:
    domain ranges, PK uniqueness, status domain, FK integrity. All
    same-table rules share ONE conditional-aggregation scan per table
    (two scans + one anti-join total — not one scan per rule); the
    report is a 5-row relation a pipeline can gate on."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")

    viol = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731

    li = lineitem.agg(
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "discount_range"
        ),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "qty_range"
        ),
    )
    ords = orders.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("pk_unique"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("status_domain"),
    )
    orphans = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count("*").alias("violations"))
    )

    report = expectation_report(
        {
            "lineitem_discount_range": li.select(
                F.col("discount_range").alias("violations")
            ),
            "lineitem_qty_range": li.select(F.col("qty_range").alias("violations")),
            "orders_custkey_ref_integrity": orphans,
            "orders_pk_unique": ords.select(F.col("pk_unique").alias("violations")),
            "orders_status_domain": ords.select(
                F.col("status_domain").alias("violations")
            ),
        }
    )
    return report.orderBy("rule")


def snapshot_diff(old: DataFrame, new: DataFrame, key: str, cmp_cols: list[str]) -> DataFrame:
    """Derive the I/U/D changeset between two entity snapshots via one
    full-outer join on the key. Unchanged rows are dropped before the
    result leaves the join stage, so the output is |changes|, not |table|."""
    o = old.select(
        F.col(key).alias("k"),
        F.lit(True).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in cmp_cols],
    )
    n = new.select(
        F.col(key).alias("k"),
        F.lit(True).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in cmp_cols],
    )
    j = o.join(n, "k", "full_outer")
    changed = F.lit(False)
    for c in cmp_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    # explicit presence markers, not a compare-column null check — a
    # legitimately-null attribute must not be mistaken for a missing row
    old_present = F.col("_old_present").isNotNull()
    new_present = F.col("_new_present").isNotNull()
    return (
        j.withColumn(
            "op",
            F.when(~new_present, F.lit("D"))
            .when(~old_present, F.lit("I"))
            .when(changed, F.lit("U")),
        )
        .filter(F.col("op").isNotNull())
        .withColumnRenamed("k", key)
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH old AS (SELECT c_custkey, c_acctbal FROM customer),
    new AS (
      SELECT CASE WHEN c_custkey % 11 = 0 THEN c_custkey + 10000000
                  ELSE c_custkey END AS c_custkey,
             CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 7 <> 0
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN n.c_custkey IS NULL THEN 'D'
                WHEN o.c_custkey IS NULL THEN 'I'
                ELSE 'U' END AS op,
           o.c_acctbal AS old_c_acctbal,
           n.c_acctbal AS new_c_acctbal
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    WHERE n.c_custkey IS NULL OR o.c_custkey IS NULL
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
    ORDER BY c_custkey, op
    """,
)
def q_cdc_snapshot_diff(spark, sf_dir: str) -> DataFrame:
    """Changeset derivation between two customer snapshots: the new
    snapshot deletes every 7th key, re-keys every 11th (simulated
    inserts) and bumps every 13th balance (updates). One full-outer
    join on the key emits only I/U/D rows — the CDC feed that
    merge_cdc_feed / merge_scd2 consume, computed relationally instead
    of the reference's full-reload-and-dedup."""
    cust = load(spark, sf_dir, "customer")
    old = cust.select("c_custkey", "c_acctbal")
    new = (
        cust.filter(F.col("c_custkey") % 7 != 0)
        .select(
            F.when(
                F.col("c_custkey") % 11 == 0, F.col("c_custkey") + 10000000
            )
            .otherwise(F.col("c_custkey"))
            .alias("c_custkey"),
            F.when(F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
    )
    diff = snapshot_diff(old, new, "c_custkey", ["c_acctbal"])
    return diff.select(
        "c_custkey", "op", "old_c_acctbal", "new_c_acctbal"
    ).orderBy("c_custkey", "op")


@query(
    "filter_outlier_iqr",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                           OR o_totalprice > q3 + 1.5 * (q3 - q1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(MIN(q1 - 1.5 * (q3 - q1)), 6) AS lo_r6,
           round(MIN(q3 + 1.5 * (q3 - q1)), 6) AS hi_r6
    FROM orders, b
    """,
)
def q_filter_outlier_iqr(spark, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier gate on order totals: interquartile range
    computed once (exact interpolated percentiles, identical formula
    on both engines), fences broadcast to the full scan, violation
    count + fences reported. At 100 TB the exact percentile becomes
    approx_percentile with the error contract asserted the way
    agg_sketch_bounds does; the fence-apply stage is unchanged — a
    broadcast of two scalars into a codegen'd filter."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out_cond = (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
    )
    return orders.crossJoin(F.broadcast(bounds)).agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(out_cond, 1).otherwise(0)).cast("long").alias("n_outliers"),
        F.round(F.min(F.col("q1") - 1.5 * iqr), 6).alias("lo_r6"),
        F.round(F.min(F.col("q3") + 1.5 * iqr), 6).alias("hi_r6"),
    )


#: Anonymity threshold: quasi-identifier groups smaller than this are
#: re-identification risks.
K_ANON = 5


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT 'groups_total' AS metric, CAST(COUNT(*) AS BIGINT) AS n FROM g
    UNION ALL
    SELECT 'groups_under_k', CAST(COUNT(*) AS BIGINT)
    FROM g WHERE n < {K_ANON}
    UNION ALL
    SELECT 'rows_at_risk',
           CAST(COALESCE(SUM(CASE WHEN n < {K_ANON} THEN n END), 0) AS BIGINT)
    FROM g
    ORDER BY metric
    """,
)
def q_privacy_k_anonymity(spark, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, segment) quasi-identifier
    pair: how many equivalence classes exist, how many fall under
    k={K_ANON}, and how many individuals those classes expose. One
    groupBy at quasi-identifier cardinality, then a 3-row report —
    the release gate a training-data pipeline runs before shipping
    user-derived tables."""
    g = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    total = g.agg(F.count("*").cast("long").alias("n")).select(
        F.lit("groups_total").alias("metric"), "n"
    )
    under = g.filter(F.col("n") < K_ANON).agg(
        F.count("*").cast("long").alias("n")
    ).select(F.lit("groups_under_k").alias("metric"), "n")
    at_risk = g.agg(
        F.coalesce(F.sum(F.when(F.col("n") < K_ANON, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n")
    ).select(F.lit("rows_at_risk").alias("metric"), "n")
    return total.unionByName(under).unionByName(at_risk).orderBy("metric")


#: Bins for the drift monitor's acctbal histogram.
DRIFT_BINS = 8


@query(
    "monitor_feature_drift",
    oracle=f"""
    WITH binned AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN 'baseline' ELSE 'current' END
               AS snapshot,
             least(greatest(CAST(floor((c_acctbal + 1000.0) / 11000.0
                                       * {DRIFT_BINS}) AS BIGINT), 0),
                   {DRIFT_BINS - 1}) AS bin
      FROM customer
    ),
    counts AS (
      SELECT bin,
             SUM(CASE WHEN snapshot = 'baseline' THEN 1 ELSE 0 END) AS np_bin,
             SUM(CASE WHEN snapshot = 'current' THEN 1 ELSE 0 END) AS nq_bin
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT SUM(np_bin) AS np, SUM(nq_bin) AS nq FROM counts
    )
    SELECT bin,
           CAST(np_bin AS BIGINT) AS n_baseline,
           CAST(nq_bin AS BIGINT) AS n_current,
           round(power(CAST(np_bin AS DOUBLE) / np
                       - CAST(nq_bin AS DOUBLE) / nq, 2)
                 / (CASE WHEN np_bin > 0 THEN CAST(np_bin AS DOUBLE) / np
                         ELSE 0.5 / np END), 6) AS chi2_term_r6
    FROM counts, tot
    ORDER BY bin
    """,
)
def q_monitor_feature_drift(spark, sf_dir: str) -> DataFrame:
    """Feature-drift monitor between two snapshots (hash-split halves
    of customer standing in for week-over-week): equal-width histogram
    of the feature, per-bin chi-square divergence terms. Deliberately
    chi-square, NOT PSI — PSI's ln() rides libm and differs in ulps
    across engines, while chi-square is rational arithmetic that
    hash-matches exactly (same policy as text_quality_model's
    no-sigmoid rule). Two scans collapse to one conditional-agg pass;
    the report is bins-cardinality rows.

    Bins present in EITHER snapshot are reported: a bin with zero
    baseline mass but current mass — the strongest drift signal — gets
    an epsilon-smoothed denominator (pseudo-count 0.5/np, the classic
    continuity correction) instead of being silently dropped."""
    cust = load(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 2 == 0, "baseline")
        .otherwise("current")
        .alias("snapshot"),
        F.least(
            F.greatest(
                F.floor((F.col("c_acctbal") + 1000.0) / 11000.0 * DRIFT_BINS).cast(
                    "long"
                ),
                F.lit(0),
            ),
            F.lit(DRIFT_BINS - 1),
        ).alias("bin"),
    )
    counts = cust.groupBy("bin").agg(
        F.sum(F.when(F.col("snapshot") == "baseline", 1).otherwise(0)).alias("np_bin"),
        F.sum(F.when(F.col("snapshot") == "current", 1).otherwise(0)).alias("nq_bin"),
    )
    totals = counts.agg(
        F.sum("np_bin").alias("np"), F.sum("nq_bin").alias("nq")
    )
    p_frac = F.col("np_bin").cast("double") / F.col("np")
    q_frac = F.col("nq_bin").cast("double") / F.col("nq")
    denom = F.when(F.col("np_bin") > 0, p_frac).otherwise(F.lit(0.5) / F.col("np"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            F.col("np_bin").cast("long").alias("n_baseline"),
            F.col("nq_bin").cast("long").alias("n_current"),
            F.round(F.pow(p_frac - q_frac, 2) / denom, 6).alias("chi2_term_r6"),
        )
        .orderBy("bin")
    )


@query(
    "agg_duplication_profile",
    oracle="""
    WITH clusters AS (
      SELECT md5(text) AS h, COUNT(*) AS sz FROM documents GROUP BY md5(text)
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_redundant
    FROM clusters GROUP BY sz ORDER BY cluster_size
    """,
)
def q_agg_duplication_profile(spark, sf_dir: str) -> DataFrame:
    """Corpus duplication profile — the diagnostic a curation pipeline
    reports BEFORE choosing a dedup strategy: exact-duplicate cluster
    size histogram with per-size document and redundancy counts
    (n_redundant = docs dedup would remove). Two aggregations, both on
    near-uniform keys (content hash, then the tiny size domain); the
    first groupBy is the same single corpus shuffle as dedup_exact_hash
    itself, so profiling costs no more than the dedup it informs."""
    clusters = (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("h"))
        .agg(F.count("*").alias("sz"))
    )
    return (
        clusters.groupBy(F.col("sz").cast("long").alias("cluster_size"))
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            (F.sum("sz") - F.count("*")).cast("long").alias("n_redundant"),
        )
        .orderBy("cluster_size")
    )


def _entropy_one(df: DataFrame, table: str, col: str) -> DataFrame:
    """Shannon entropy of one categorical column as a 1-row frame:
    value counts (bounded key space → map-side combine), then the
    -Σ p·ln p fold over the tiny count table, each term made
    order-independent by an exact-DECIMAL cast before summing."""
    counts = df.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("c"))
    tot = counts.agg(F.sum("c").cast("double").alias("n"))
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "n",
        (
            (F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n"))
        ).cast("decimal(28,14)").alias("t"),
    )
    return terms.groupBy().agg(
        F.lit(f"{table}.{col}").alias("column_name"),
        F.count("*").cast("long").alias("n_distinct"),
        F.round(-F.sum("t").cast("double"), 6).alias("entropy"),
        F.round(
            -F.sum("t").cast("double") / F.log(F.count("*").cast("double")),
            6,
        ).alias("norm_entropy"),
    )


def _entropy_one_sql(table: str, col: str) -> str:
    return f"""
    SELECT '{table}.{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round(-CAST(SUM(CAST((c / n) * ln(c / n) AS DECIMAL(28,14)))
                       AS DOUBLE), 6) AS entropy,
           round(-CAST(SUM(CAST((c / n) * ln(c / n) AS DECIMAL(28,14)))
                       AS DOUBLE) / ln(CAST(COUNT(*) AS DOUBLE)), 6)
             AS norm_entropy
    FROM (
      SELECT c, SUM(c) OVER () * 1.0 AS n FROM (
        SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM {table} GROUP BY {col}
      )
    )"""


@query(
    "profile_column_entropy",
    oracle=f"""
    SELECT * FROM (
      {_entropy_one_sql("events", "event_type")}
      UNION ALL
      {_entropy_one_sql("documents", "lang")}
      UNION ALL
      {_entropy_one_sql("documents", "source")}
    ) ORDER BY column_name
    """,
)
def q_profile_column_entropy(spark, sf_dir: str) -> DataFrame:
    """Shannon entropy (raw + normalized by ln(k)) of the key
    categorical columns — the balance diagnostic a curation pipeline
    runs before choosing mixture weights (a collapsed-entropy column
    flags skewed crawls or broken extraction).

    Each column costs one bounded-key-space aggregation with map-side
    combine; the entropy fold itself runs over k rows (k = distinct
    values), so the per-column cost at 100 TB is the scan, nothing
    else. DECIMAL-cast terms keep the Σ p·ln p order-independent."""
    ev = load(spark, sf_dir, "events")
    docs = load(spark, sf_dir, "documents")
    out = (
        _entropy_one(ev, "events", "event_type")
        .unionByName(_entropy_one(docs, "documents", "lang"))
        .unionByName(_entropy_one(docs, "documents", "source"))
    )
    return out.orderBy("column_name")


@query(
    "privacy_l_diversity",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS qi_priority,
             CAST(year(o_orderdate) AS BIGINT) AS qi_year,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS l,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM orders GROUP BY 1, 2
    )
    SELECT l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_rows,
           CAST(MIN(qi_priority) AS VARCHAR) AS example_priority
    FROM g GROUP BY l ORDER BY l
    """,
)
def q_privacy_l_diversity(spark, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion to `privacy_k_anonymity`:
    k-anonymity bounds GROUP SIZE, but a large group whose sensitive
    attribute (order status) is constant still leaks it; l-diversity
    counts DISTINCT sensitive values per quasi-identifier group
    (priority × order year) and reports the l-histogram. Groups at
    l = 1 are the disclosure risk a release gate must suppress.

    Two bounded aggregations: per-QI distinct count (two-phase, so
    the distinct runs map-side first), then an l-cardinality rollup.
    Nothing after the first aggregation touches corpus-sized data."""
    g = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("qi_priority"),
            F.year("o_orderdate").cast("long").alias("qi_year"),
        )
        .agg(
            F.count_distinct("o_orderstatus").cast("long").alias("l"),
            F.count("*").cast("long").alias("group_size"),
        )
    )
    return (
        g.groupBy("l")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("group_size").cast("long").alias("n_rows"),
            F.min("qi_priority").cast("string").alias("example_priority"),
        )
        .orderBy("l")
    )


#: t-closeness release threshold (variational distance), as an exact
#: rational p/q so the breach flag compares INTEGERS on both engines.
T_CLOSE_NUM, T_CLOSE_DEN = 1, 5  # t = 0.2


@query(
    "privacy_t_closeness",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS p, CAST(year(o_orderdate) AS BIGINT) AS y,
             o_orderstatus AS s, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2, 3
    ),
    g AS (SELECT p, y, CAST(SUM(c) AS BIGINT) AS ng FROM base GROUP BY 1, 2),
    sd AS (SELECT s, CAST(SUM(c) AS BIGINT) AS cs FROM base GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM base),
    x AS (
      SELECT g.p, g.y, g.ng, sd.cs, COALESCE(b.c, 0) AS cgs
      FROM g CROSS JOIN sd
      LEFT JOIN base b ON b.p = g.p AND b.y = g.y AND b.s = sd.s
    ),
    d AS (
      SELECT p, y, ng,
             SUM(abs(CAST(cgs AS DECIMAL(38,0)) * (SELECT n FROM tot)
                     - CAST(cs AS DECIMAL(38,0)) * ng)) AS dsum
      FROM x GROUP BY 1, 2, 3
    )
    SELECT p AS qi_priority, y AS qi_year,
           CAST(ng AS BIGINT) AS group_size,
           round(CAST(dsum AS DOUBLE)
                 / CAST(2 * ng * (SELECT n FROM tot) AS DOUBLE), 6)
             AS t_closeness_r6,
           dsum * {T_CLOSE_DEN} > CAST(2 * {T_CLOSE_NUM} AS DECIMAL(38,0))
             * ng * (SELECT n FROM tot) AS breach
    FROM d ORDER BY qi_priority, qi_year
    """,
)
def q_privacy_t_closeness(spark, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-gate ladder
    (k-anonymity bounds group SIZE, l-diversity bounds sensitive
    CARDINALITY, t-closeness bounds sensitive DISTRIBUTION): a group
    whose status mix deviates from the corpus-wide mix leaks
    attribute information even when large and diverse. Per
    quasi-identifier group (priority × order year), the variational
    distance t = ½·Σ|p_i − q_i| between the group's and the global
    sensitive distribution, with a breach flag at t > 1/5.

    Exactness: the distance is computed on the COMMON DENOMINATOR —
    D = Σ|cnt_gs·N − cnt_s·n_g| is an exact DECIMAL(38,0) integer
    (products reach corpus² at 100 TB, past int64), t = D/(2·n_g·N)
    is one double division for display, and the breach flag compares
    the exact integers D·5 > 2·n_g·N — no float ever decides a gate.

    Scale: one corpus aggregation onto the bounded (QI × status) key
    space; everything after is |groups|×|statuses| rows, with the
    global status mix and total riding broadcast joins (the crossJoin
    is bounded×bounded, planning as a legal BNLJ)."""
    base = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("p"),
            F.year("o_orderdate").cast("long").alias("y"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    g = base.groupBy("p", "y").agg(F.sum("c").cast("long").alias("ng"))
    sd = base.groupBy("s").agg(F.sum("c").cast("long").alias("cs"))
    tot = base.agg(F.sum("c").cast("long").alias("n"))
    x = (
        g.crossJoin(F.broadcast(sd))
        .join(base, ["p", "y", "s"], "left")
        .select(
            "p", "y", "ng", "cs",
            F.coalesce(F.col("c"), F.lit(0)).alias("cgs"),
        )
        .crossJoin(F.broadcast(tot))
    )
    d = x.groupBy("p", "y", "ng", "n").agg(
        F.sum(
            F.abs(
                F.col("cgs").cast("decimal(38,0)") * F.col("n")
                - F.col("cs").cast("decimal(38,0)") * F.col("ng")
            )
        ).alias("dsum")
    )
    return d.select(
        F.col("p").alias("qi_priority"),
        F.col("y").alias("qi_year"),
        F.col("ng").alias("group_size"),
        F.round(
            F.col("dsum").cast("double")
            / (F.lit(2) * F.col("ng") * F.col("n")).cast("double"),
            6,
        ).alias("t_closeness_r6"),
        (
            F.col("dsum") * T_CLOSE_DEN
            > F.lit(2 * T_CLOSE_NUM).cast("decimal(38,0)")
            * F.col("ng")
            * F.col("n")
        ).alias("breach"),
    ).orderBy("qi_priority", "qi_year")


@query(
    "profile_fd_violations",
    oracle="""
    WITH pairs AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, lang, n,
             row_number() OVER (PARTITION BY source
                                ORDER BY n DESC, lang) AS rk,
             SUM(n) OVER (PARTITION BY source) AS tot,
             COUNT(*) OVER (PARTITION BY source) AS n_rhs
      FROM pairs
    )
    SELECT source, CAST(n_rhs AS BIGINT) AS n_langs,
           lang AS majority_lang,
           CAST(tot - n AS BIGINT) AS n_violations,
           round(CAST(tot - n AS DOUBLE) / tot, 6) AS violation_rate_r6
    FROM ranked WHERE rk = 1 AND n_rhs > 1
    ORDER BY source
    """,
)
def q_profile_fd_violations(spark, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: does `source` determine `lang`?
    For every LHS value with more than one RHS value, report the
    majority RHS (deterministic (count desc, value) tie-break) and how
    many rows deviate from it — the minimum edits to make the FD hold.
    This is the profiling query that decides whether a column is safe
    to use as a partition/dedup key at 100 TB.

    One corpus scan reduces to the (lhs, rhs) pair table — bounded by
    the attribute domains, not the corpus — and the ranking windows
    run on that bounded table partitioned by lhs. All outputs are
    exact counts or ratios of them."""
    pairs = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wsrc = Window.partitionBy("source")
    ranked = pairs.select(
        "source",
        "lang",
        "n",
        F.row_number()
        .over(wsrc.orderBy(F.desc("n"), "lang"))
        .alias("rk"),
        F.sum("n").over(wsrc).alias("tot"),
        F.count("*").over(wsrc).alias("n_rhs"),
    )
    return (
        ranked.filter((F.col("rk") == 1) & (F.col("n_rhs") > 1))
        .select(
            "source",
            F.col("n_rhs").cast("long").alias("n_langs"),
            F.col("lang").alias("majority_lang"),
            (F.col("tot") - F.col("n")).cast("long").alias("n_violations"),
            F.round(
                (F.col("tot") - F.col("n")).cast("double") / F.col("tot"), 6
            ).alias("violation_rate_r6"),
        )
        .orderBy("source")
    )


#: Pseudonymization salt — a deployment secret in production; a fixed
#: literal here so the oracle can replay the mapping.
PSEUDO_SALT = "jmrs-pseudo-v1"


@query(
    "privacy_pseudonymize_join",
    oracle=f"""
    WITH c AS (
      SELECT c_mktsegment,
             ('0x' || substr(md5('{PSEUDO_SALT}' || CAST(c_custkey AS VARCHAR)),
                             1, 15))::BIGINT AS pid
      FROM customer
    ),
    o AS (
      SELECT ('0x' || substr(md5('{PSEUDO_SALT}' || CAST(o_custkey AS VARCHAR)),
                             1, 15))::BIGINT AS pid
      FROM orders
    ),
    pseudo AS (
      SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders_pseudo
      FROM o JOIN c USING (pid) GROUP BY 1
    ),
    raw AS (
      SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders_raw
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT p.c_mktsegment, p.n_orders_pseudo, r.n_orders_raw,
           p.n_orders_pseudo = r.n_orders_raw AS integrity_ok
    FROM pseudo p JOIN raw r USING (c_mktsegment)
    ORDER BY c_mktsegment
    """,
)
def q_privacy_pseudonymize_join(spark, sf_dir: str) -> DataFrame:
    """Consistent pseudonymization with referential integrity: replace
    the customer key in BOTH tables with a salted 60-bit hash
    pseudonym, then prove the pseudonymized join reproduces the raw
    join exactly (per-segment order counts equal). This is the release
    pattern for sharing joinable datasets without raw identifiers —
    the pseudonym is deterministic per key (joins keep working) but
    unlinkable without the salt.

    The mapping is a map-side expression (no lookup table to leak or
    shuffle); the audit costs the same two joins the consumer would
    run. Hash collisions would surface as integrity_ok = false — the
    audit IS the collision check (~n²/2^61 odds)."""
    salted = lambda col: F.concat(F.lit(PSEUDO_SALT), F.col(col).cast("string"))
    pid = lambda col: F.conv(F.substring(F.md5(salted(col)), 1, 15), 16, 10).cast(
        "long"
    )
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    c = cust.select("c_mktsegment", pid("c_custkey").alias("pid"))
    o = orders.select(pid("o_custkey").alias("pid"))
    pseudo = (
        o.join(c, "pid")
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("n_orders_pseudo"))
    )
    raw = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("n_orders_raw"))
    )
    return (
        pseudo.join(raw, "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_orders_pseudo",
            "n_orders_raw",
            (F.col("n_orders_pseudo") == F.col("n_orders_raw")).alias(
                "integrity_ok"
            ),
        )
        .orderBy("c_mktsegment")
    )


#: DP-release knobs: epsilon for a sensitivity-1 count query, and the
#: versioned seed salt (bump to rotate the noise draw).
DP_EPSILON = 1.0
DP_SALT = "dp-v1#"


@query(
    "privacy_dp_count_release",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    seeded AS (
      SELECT event_type, n,
             (CAST(('0x' || substr(md5('{DP_SALT}' || event_type), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0 - 0.5 AS u
      FROM g
    )
    SELECT event_type, n,
           round(-(1.0 / {DP_EPSILON}) * sign(u)
                 * ln(1.0 - 2.0 * abs(u)), 6) AS noise_r6,
           CAST(round(n + round(-(1.0 / {DP_EPSILON}) * sign(u)
                 * ln(1.0 - 2.0 * abs(u)), 6)) AS BIGINT) AS released
    FROM seeded ORDER BY event_type
    """,
    tags=("privacy", "beyond"),
)
def q_privacy_dp_count_release(spark, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release harness: per-event_type counts
    plus Laplace(1/ε) noise drawn by inverse-CDF from a SEEDED uniform
    (md5 of salt+key → u ∈ (-½,½) → noise = -(1/ε)·sign(u)·ln(1-2|u|)).

    HONESTY NOTE: a noise draw an adversary can recompute from the
    group key is NOT differentially private — this query is the
    replayable test harness for the release PIPELINE (correct
    sensitivity-1 scale, correct inverse-CDF shape, correct
    post-processing to integer counts), with the oracle proving both
    engines draw bit-identical noise. Production swaps the seeded
    uniform for a CSPRNG draw per release; everything else is
    unchanged. The +0.5 offset keeps u strictly inside (-½,½), so
    ln(1-2|u|) can never hit -inf.

    Scale shape: one map-side-combinable count over the corpus
    (|event_type| keys), then pure per-row expressions — the noise adds
    nothing to the shuffle. Noise is rounded to 6 dp before the
    released integer is formed, so the ln() libm ulp gap between
    engines cannot flip the release."""
    from job_market_research_spark.ml.neardup import portable_hash

    g = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    u = (
        (portable_hash(F.concat(F.lit(DP_SALT), F.col("event_type"))) + 0.5)
        / 4294967296.0
        - 0.5
    ).alias("u")
    seeded = g.select("event_type", "n", u)
    noise = F.round(
        -(1.0 / DP_EPSILON)
        * F.signum(F.col("u"))
        * F.log(1.0 - 2.0 * F.abs(F.col("u"))),
        6,
    )
    return (
        seeded.withColumn("noise_r6", noise)
        .select(
            "event_type",
            "n",
            "noise_r6",
            F.round(F.col("n") + F.col("noise_r6")).cast("long").alias("released"),
        )
        .orderBy("event_type")
    )


#: Benford audit: integer-cents scaling guard and chi-square rounding.
BENFORD_SCALE = 100


@query(
    "profile_benford_audit",
    oracle=f"""
    WITH ints AS (
      SELECT CAST(floor(abs(value) * {BENFORD_SCALE}) AS BIGINT) AS i
      FROM events WHERE value IS NOT NULL
    ),
    digits AS (
      SELECT CAST(substr(CAST(i AS VARCHAR), 1, 1) AS INT) AS digit
      FROM ints WHERE i > 0
    ),
    counts AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts),
    spine AS (SELECT g AS digit FROM generate_series(1, 9) AS s(g))
    SELECT s.digit,
           COALESCE(c.n, 0) AS n,
           round(ln(1.0 + 1.0 / s.digit) / ln(10.0), 6) AS benford_p,
           round(pow(COALESCE(c.n, 0)
                     - t.total * (ln(1.0 + 1.0 / s.digit) / ln(10.0)), 2)
                 / (t.total * (ln(1.0 + 1.0 / s.digit) / ln(10.0))), 6)
             AS chi_term
    FROM spine s LEFT JOIN counts c USING (digit) CROSS JOIN tot t
    ORDER BY s.digit
    """,
    tags=("profiling", "beyond"),
)
def q_profile_benford_audit(spark, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over `events.value` — the
    classic fabricated-data / pipeline-corruption detector (naturally
    occurring amounts follow P(d) = log10(1+1/d); uniform or truncated
    generators don't). Emits the per-digit observed count, the Benford
    expectation and the chi-square contribution; a spiked chi_term row
    points at the digit band where the data deviates.

    Determinism across engines: the first digit is taken from the
    STRING of an exact integer — values scale to integer cents with
    floor(abs(v)·100) (double multiply + floor: both IEEE-identical),
    and integer-to-string rendering is engine-stable, unlike
    double-to-string or pow(10, floor(log10(v))) digit extraction
    (libm pow/log10 ulp gaps can flip a boundary digit). Benford
    expectations are computed as ln-ratios identically on both sides
    and every reported double is round-6.

    Scale shape: one map-side digit projection + a 9-key count (pure
    partial aggregation), the total as a broadcast 1-row agg, the
    digit spine generated — nothing after the scan exceeds 9 rows."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ints = ev.select(
        F.floor(F.abs(F.col("value")) * BENFORD_SCALE).cast("long").alias("i")
    ).filter(F.col("i") > 0)
    digits = ints.select(
        F.substring(F.col("i").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    p = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return (
        spine.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.round(p, 6).alias("benford_p"),
            F.round(
                F.pow(F.coalesce(F.col("n"), F.lit(0)) - F.col("total") * p, 2)
                / (F.col("total") * p),
                6,
            ).alias("chi_term"),
        )
        .orderBy("digit")
    )


#: Rate-shift alert threshold (two-sample Poisson z).
RATE_Z_ALERT = 3.0


@query(
    "monitor_rate_shift",
    oracle=f"""
    WITH bounds AS (
      SELECT min(ts) AS lo, max(ts) AS hi FROM events
    ),
    halves AS (
      SELECT event_type,
             CASE WHEN epoch_us(ts) * 2 <= epoch_us(b.lo) + epoch_us(b.hi)
                  THEN 0 ELSE 1 END AS half
      FROM events CROSS JOIN bounds b
    ),
    counts AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM halves GROUP BY event_type
    )
    SELECT event_type, n1, n2,
           round((n1 - n2) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6) AS z_r6,
           abs((n1 - n2) / sqrt(CAST(n1 + n2 AS DOUBLE))) > {RATE_Z_ALERT}
             AS alert
    FROM counts ORDER BY event_type
    """,
    tags=("monitoring", "beyond"),
)
def q_monitor_rate_shift(spark, sf_dir: str) -> DataFrame:
    """Event-rate shift monitor: per type, a two-sample Poisson test
    between the first and second half of the observed time range —
    z = (n₁−n₂)/√(n₁+n₂), the conditional binomial test that flags a
    pipeline suddenly emitting (or dropping) events, complementary to
    the value-distribution monitors (`monitor_feature_drift`,
    `window_zscore_anomaly` watch VALUES; this watches VOLUME).

    The midpoint test is exact integer arithmetic
    (2·epoch_µs(ts) ≤ lo+hi — no float timestamp division), counts are
    one conditional-agg scan with the bounds riding a broadcast 1-row
    aggregate, and the z statistic is one sqrt+divide over exact
    integers, round-6. |types| rows after the scan."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    )
    halves = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        (
            F.unix_micros("ts") * 2
            <= F.unix_micros("lo") + F.unix_micros("hi")
        ).alias("first_half"),
    )
    counts = halves.groupBy("event_type").agg(
        F.sum(F.when(F.col("first_half"), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(~F.col("first_half"), 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    z = (F.col("n1") - F.col("n2")) / F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
    )
    return counts.select(
        "event_type",
        "n1",
        "n2",
        F.round(z, 6).alias("z_r6"),
        (F.abs(z) > RATE_Z_ALERT).alias("alert"),
    ).orderBy("event_type")


#: Clipping bound for the DP mean release (sensitivity of the sum).
DP_CLIP = 100.0


@query(
    "privacy_dp_mean_release",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(least(greatest(value, 0.0), {DP_CLIP})
                           AS DECIMAL(28,10))) AS DOUBLE) AS csum
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    seeded AS (
      SELECT event_type, n, csum,
             (CAST(('0x' || substr(md5('{DP_SALT}s#' || event_type), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0 - 0.5 AS us,
             (CAST(('0x' || substr(md5('{DP_SALT}c#' || event_type), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0 - 0.5 AS uc
      FROM g
    ),
    noised AS (
      SELECT event_type, n,  csum,
             round(-({DP_CLIP} / {DP_EPSILON}) * sign(us)
                   * ln(1.0 - 2.0 * abs(us)), 6) AS noise_sum_r6,
             round(-(1.0 / {DP_EPSILON}) * sign(uc)
                   * ln(1.0 - 2.0 * abs(uc)), 6) AS noise_cnt_r6
      FROM seeded
    )
    SELECT event_type, n, noise_sum_r6, noise_cnt_r6,
           round((csum + noise_sum_r6) / (n + noise_cnt_r6), 6)
             AS released_mean_r6
    FROM noised ORDER BY event_type
    """,
    tags=("privacy", "beyond"),
)
def q_privacy_dp_mean_release(spark, sf_dir: str) -> DataFrame:
    """Laplace-mechanism MEAN release harness (clipped-sum over noisy
    count — the standard composition): values are clipped to
    [0, {DP_CLIP}] so the sum's sensitivity is the clip bound, the
    sum gets Laplace({DP_CLIP}/ε) noise, the count gets Laplace(1/ε),
    and the released mean is their ratio. Same HONESTY NOTE as
    privacy_dp_count_release: the seeded inverse-CDF draw makes the
    harness replayable cross-engine; production swaps in a CSPRNG and
    keeps the sensitivity/clip/ratio algebra.

    Exactness: the clipped sum is an exact DECIMAL aggregate (clip is
    a pure least/greatest), both noise draws are round-6 before any
    composition, and ONLY O(1)-magnitude columns are emitted — the
    released mean's ratio cancels the corpus-scale exponent that
    makes round-6 of a raw sum ulp-unsafe (the large-value-round
    hazard).

    Scale: one map-side-combinable aggregation to |event_type| rows;
    noise is a per-row expression."""
    from job_market_research_spark.ml.neardup import portable_hash

    g = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(DP_CLIP))
                .cast("decimal(28,10)")
            )
            .cast("double")
            .alias("csum"),
        )
    )
    def _u(tag):
        return (
            (
                portable_hash(
                    F.concat(F.lit(DP_SALT + tag + "#"), F.col("event_type"))
                )
                + 0.5
            )
            / 4294967296.0
            - 0.5
        )

    def _lap(u, scale):
        return F.round(
            -(scale / DP_EPSILON) * F.signum(u) * F.log(1.0 - 2.0 * F.abs(u)),
            6,
        )

    noised = g.select(
        "event_type",
        "n",
        "csum",
        _lap(_u("s"), DP_CLIP).alias("noise_sum_r6"),
        _lap(_u("c"), 1.0).alias("noise_cnt_r6"),
    )
    return noised.select(
        "event_type",
        "n",
        "noise_sum_r6",
        "noise_cnt_r6",
        F.round(
            (F.col("csum") + F.col("noise_sum_r6"))
            / (F.col("n") + F.col("noise_cnt_r6")),
            6,
        ).alias("released_mean_r6"),
    ).orderBy("event_type")


@query(
    "monitor_psi_stability",
    oracle=f"""
    WITH binned AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN 0 ELSE 1 END AS snap,
             least(greatest(CAST(floor((c_acctbal + 1000.0) / 11000.0
                                       * {DRIFT_BINS}) AS BIGINT), 0),
                   {DRIFT_BINS - 1}) AS bin
      FROM customer
    ),
    counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS np_bin,
             CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nq_bin
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(np_bin) AS np, SUM(nq_bin) AS nq FROM counts),
    terms AS (
      -- 0.5-count smoothing on empty bins (the standard PSI fix) so
      -- ln never sees zero; fixed shape on both engines
      SELECT CAST(round(
               ((nq_bin + 0.5) / (nq + 0.5 * {DRIFT_BINS})
                - (np_bin + 0.5) / (np + 0.5 * {DRIFT_BINS}))
               * ln(((nq_bin + 0.5) / (nq + 0.5 * {DRIFT_BINS}))
                    / ((np_bin + 0.5) / (np + 0.5 * {DRIFT_BINS}))), 9)
             AS DECIMAL(28,9)) AS t
      FROM counts CROSS JOIN tot
    ),
    s AS (SELECT CAST(SUM(t) AS DOUBLE) AS psi FROM terms)
    SELECT (SELECT CAST(np AS BIGINT) FROM tot) AS n_baseline,
           (SELECT CAST(nq AS BIGINT) FROM tot) AS n_current,
           CAST((SELECT COUNT(*) FROM counts) AS BIGINT) AS n_bins,
           round(psi, 6) AS psi_r6,
           CASE WHEN psi >= 0.25 THEN 'major'
                WHEN psi >= 0.1 THEN 'moderate'
                ELSE 'stable' END AS verdict
    FROM s
    """,
    tags=("monitoring", "drift", "beyond"),
)
def q_monitor_psi_stability(spark, sf_dir: str) -> DataFrame:
    """Population Stability Index between the baseline/current
    snapshot halves of the account-balance distribution — the
    industry-standard one-number drift gate (credit-risk lineage)
    with its canonical thresholds baked in: PSI < 0.1 stable,
    0.1–0.25 moderate shift, ≥ 0.25 major shift (retrain/investigate).
    Complements monitor_feature_drift, which reports per-bin χ² terms
    — PSI is the summary number on-call dashboards alert on:
    Σ (q_b − p_b)·ln(q_b/p_b) over fixed literal bins, with 0.5-count
    smoothing on empty bins so the log is total.

    Per-bin terms are fixed-shape doubles over exact integer counts,
    rounded 9 and DECIMAL-summed over the DRIFT_BINS-row table; the
    verdict compares the same double to literal thresholds on both
    engines.

    Scale: one combinable aggregation to DRIFT_BINS rows."""
    binned = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 2).alias("snap"),
        F.least(
            F.greatest(
                F.floor((F.col("c_acctbal") + 1000.0) / 11000.0 * DRIFT_BINS)
                .cast("long"),
                F.lit(0),
            ),
            F.lit(DRIFT_BINS - 1),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast("long")
        .alias("np_bin"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nq_bin"),
    )
    tot = counts.agg(
        F.sum("np_bin").cast("long").alias("np"),
        F.sum("nq_bin").cast("long").alias("nq"),
        F.count("*").cast("long").alias("n_bins"),
    )
    p = (F.col("np_bin") + 0.5) / (F.col("np") + 0.5 * DRIFT_BINS)
    q = (F.col("nq_bin") + 0.5) / (F.col("nq") + 0.5 * DRIFT_BINS)
    terms = counts.crossJoin(F.broadcast(tot)).select(
        F.round((q - p) * F.log(q / p), 9).cast("decimal(28,9)").alias("t")
    )
    s = terms.agg(F.sum("t").cast("double").alias("psi"))
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("np").alias("n_baseline"),
        F.col("nq").alias("n_current"),
        "n_bins",
        F.round(F.col("psi"), 6).alias("psi_r6"),
        F.when(F.col("psi") >= 0.25, "major")
        .when(F.col("psi") >= 0.1, "moderate")
        .otherwise("stable")
        .alias("verdict"),
    )


#: Adversarial-validation banding of the balance domain.
ADV_BANDS = 256


@query(
    "monitor_adversarial_auc",
    oracle=f"""
    WITH scored AS (
      SELECT least(greatest(CAST(floor((c_acctbal + 1000.0) / 11000.0
                                        * {ADV_BANDS}) AS BIGINT), 0),
                   {ADV_BANDS - 1}) AS band,
             CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END AS y
      FROM customer
    ),
    b AS (
      SELECT band,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
      FROM scored GROUP BY band
    ),
    cum AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cneg
      FROM b
    ),
    s AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_cur,
             CAST(SUM(neg) AS BIGINT) AS n_base,
             CAST(SUM(CAST(pos AS DECIMAL(38,0))
                      * CAST(2 * cneg + neg AS DECIMAL(38,0)))
                  AS DOUBLE) AS num2
      FROM cum
    )
    SELECT n_base AS n_baseline, n_cur AS n_current,
           round(num2 / (2.0 * (CAST(n_cur AS DOUBLE) * n_base)), 6)
             AS adv_auc_r6,
           round(abs(num2 / (2.0 * (CAST(n_cur AS DOUBLE) * n_base))
                     - 0.5) * 2, 6) AS separability_r6
    FROM s
    """,
    tags=("monitoring", "drift", "beyond"),
)
def q_monitor_adversarial_auc(spark, sf_dir: str) -> DataFrame:
    """Adversarial-validation drift check: the tie-corrected AUC of
    the feature itself at separating the baseline snapshot from the
    current one (custkey-parity halves of the balance distribution).
    AUC ≈ 0.5 means no classifier could tell the snapshots apart —
    the strongest practical 'no drift' certificate, and the method
    competition/industry pipelines use when per-bin tests disagree;
    separability = 2·|AUC−0.5| rescales it to a 0..1 drift score
    comparable across features. Completes the drift panel:
    per-bin χ² terms (monitor_feature_drift), summary index
    (monitor_psi_stability), exact-distribution D (stat_ks_two_sample),
    and now model-style separability.

    Same bounded integer machinery as ml_eval_auc_roc — per-band
    pos/neg counts, DECIMAL pair numerator, one closing division —
    over ADV_BANDS fixed literal bands of the feature domain.

    Scale: one combinable aggregation to ADV_BANDS rows; the
    cumulative runs on that bounded table (allowlisted)."""
    scored = load(spark, sf_dir, "customer").select(
        F.least(
            F.greatest(
                F.floor((F.col("c_acctbal") + 1000.0) / 11000.0 * ADV_BANDS)
                .cast("long"),
                F.lit(0),
            ),
            F.lit(ADV_BANDS - 1),
        ).alias("band"),
        (F.col("c_custkey") % 2).cast("int").alias("y"),
    )
    b = scored.groupBy("band").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("neg"),
    )
    from pyspark.sql import Window as W

    w = W.orderBy("band").rowsBetween(W.unboundedPreceding, -1)
    cum = b.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("cneg"),
    )
    s = cum.agg(
        F.sum("pos").cast("long").alias("n_cur"),
        F.sum("neg").cast("long").alias("n_base"),
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (2 * F.col("cneg") + F.col("neg")).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("num2"),
    )
    auc = F.col("num2") / (
        2.0 * (F.col("n_cur").cast("double") * F.col("n_base"))
    )
    return s.select(
        F.col("n_base").alias("n_baseline"),
        F.col("n_cur").alias("n_current"),
        F.round(auc, 6).alias("adv_auc_r6"),
        F.round(F.abs(auc - 0.5) * 2, 6).alias("separability_r6"),
    )


#: The warehouse's FK edges: (child table, fk col, parent table, pk).
_RI_EDGES: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "profile_ref_integrity",
    oracle=f"""
    WITH edges AS (
      {" UNION ALL ".join(
          f'''SELECT '{c}.{fk}->{p}.{pk}' AS edge,
             CAST((SELECT COUNT(*) FROM {c}) AS BIGINT) AS n_child,
             CAST((SELECT COUNT(*) FROM {c}
                   WHERE {fk} IS NOT NULL
                     AND {fk} NOT IN (SELECT {pk} FROM {p})) AS BIGINT)
               AS n_orphans,
             CAST((SELECT COUNT(*) FROM {c} WHERE {fk} IS NULL) AS BIGINT)
               AS n_null_fk'''
          for c, fk, p, pk in _RI_EDGES
      )}
    )
    SELECT edge, n_child, n_orphans, n_null_fk,
           CASE WHEN n_orphans = 0 THEN 1 ELSE 0 END AS intact
    FROM edges ORDER BY edge
    """,
    tags=("profiling", "quality", "beyond"),
)
def q_profile_ref_integrity(spark, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over EVERY foreign-key edge of the
    warehouse in one report: per edge, the child row count, the
    orphan count (non-null FK with no parent), the null-FK count
    (tracked separately — a null FK is a modeling choice, an orphan
    is corruption), and an intact flag. The first report any
    warehouse QA suite runs after a load, and the one that catches
    partial-load/late-dimension races at 100 TB.

    r14 restructure: ONE pass per child table, not two per edge. The
    old shape scanned each child twice per edge (anti-join leg +
    stats leg) — 21 scans across the 7 edges, with lineitem read six
    times; at 100 TB that is 6× the IO of the warehouse's biggest
    table for one QA report. Now each child is scanned once,
    LEFT-joined to every parent's key projection in sequence
    (parents are PRIMARY keys, so row counts are preserved and a
    null parent key ≡ the anti-join's orphan; broadcast when the
    projection fits, shuffle-hash otherwise under AQE), and every
    edge's orphan/null counts come out of one conditional
    aggregation, unpivoted to the per-edge report. Census: 21→12
    scans (5 child passes + 7 parent projections), report size =
    |edges|."""
    groups: dict[str, list[tuple[str, str, str]]] = {}
    for child, fk, parent, pk in _RI_EDGES:
        groups.setdefault(child, []).append((fk, parent, pk))
    frames = []
    for child, edges in groups.items():
        df = load(spark, sf_dir, child).select(*[fk for fk, _, _ in edges])
        for i, (fk, parent, pk) in enumerate(edges):
            par = load(spark, sf_dir, parent).select(
                F.col(pk).alias(f"__pk{i}")
            )
            df = df.join(par, F.col(fk) == F.col(f"__pk{i}"), "left")
        aggs = [F.count("*").cast("long").alias("n_child")]
        for i, (fk, _parent, _pk) in enumerate(edges):
            aggs.append(
                F.sum(
                    F.when(
                        F.col(fk).isNotNull() & F.col(f"__pk{i}").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"n_orphans_{i}")
            )
            aggs.append(
                F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"n_null_fk_{i}")
            )
        stats = df.agg(*aggs)
        per_edge = F.array(
            *[
                F.struct(
                    F.lit(f"{child}.{fk}->{parent}.{pk}").alias("edge"),
                    F.col(f"n_orphans_{i}").alias("n_orphans"),
                    F.col(f"n_null_fk_{i}").alias("n_null_fk"),
                )
                for i, (fk, parent, pk) in enumerate(edges)
            ]
        )
        frames.append(
            stats.select("n_child", F.explode(per_edge).alias("e")).select(
                F.col("e.edge").alias("edge"),
                "n_child",
                F.col("e.n_orphans").alias("n_orphans"),
                F.col("e.n_null_fk").alias("n_null_fk"),
                F.when(F.col("e.n_orphans") == 0, 1)
                .otherwise(0)
                .alias("intact"),
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.orderBy("edge")


#: EMD binning resolution over the balance domain.
EMD_BINS = 64


@query(
    "monitor_emd_wasserstein",
    oracle=f"""
    WITH binned AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN 0 ELSE 1 END AS snap,
             least(greatest(CAST(floor((c_acctbal + 1000.0) / 11000.0
                                       * {EMD_BINS}) AS BIGINT), 0),
                   {EMD_BINS - 1}) AS bin
      FROM customer
    ),
    counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS np_bin,
             CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nq_bin
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(np_bin) AS np, SUM(nq_bin) AS nq FROM counts),
    cum AS (
      SELECT bin,
             SUM(np_bin) OVER (ORDER BY bin) AS cp,
             SUM(nq_bin) OVER (ORDER BY bin) AS cq
      FROM counts
    ),
    s AS (
      -- integer EMD numerator: Σ |cp·Nq − cq·Np| over bins
      SELECT CAST(SUM(CAST(abs(cp * tot.nq - cq * tot.np) AS DECIMAL(38,0)))
                  AS DOUBLE) AS num,
             CAST(MAX(tot.np) AS BIGINT) AS np,
             CAST(MAX(tot.nq) AS BIGINT) AS nq
      FROM cum CROSS JOIN tot
    )
    SELECT np AS n_baseline, nq AS n_current,
           CAST({EMD_BINS} AS BIGINT) AS n_bins,
           round(num / (CAST(np AS DOUBLE) * nq) / {EMD_BINS}, 6)
             AS emd_norm_r6
    FROM s
    """,
    tags=("monitoring", "drift", "beyond"),
)
def q_monitor_emd_wasserstein(spark, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between the
    baseline/current snapshot histograms — the drift metric that
    WEIGHS HOW FAR mass moved, which PSI and KS cannot (shift every
    value by one bin and by ten bins: KS reports the same D, EMD
    reports 10× — exactly the property that matters for a numeric
    feature feeding a model). On a shared binning, W₁ = mean over
    bins of |cdfP − cdfQ|, normalized here to [0, 1] by the bin
    count.

    Exactness: the CDF-gap sum runs in INTEGERS (|cp·Nq − cq·Np|,
    DECIMAL-summed — no per-bin float CDFs), one closing fixed-shape
    division.

    Scale: one combinable aggregation to EMD_BINS rows; cumulative on
    that bounded table (allowlisted). Completes the drift panel:
    per-bin χ², PSI, KS-D, adversarial AUC, and now the
    metric-space distance."""
    binned = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 2).alias("snap"),
        F.least(
            F.greatest(
                F.floor((F.col("c_acctbal") + 1000.0) / 11000.0 * EMD_BINS)
                .cast("long"),
                F.lit(0),
            ),
            F.lit(EMD_BINS - 1),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast("long")
        .alias("np_bin"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nq_bin"),
    )
    tot = counts.agg(
        F.sum("np_bin").cast("long").alias("np"),
        F.sum("nq_bin").cast("long").alias("nq"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        F.sum("np_bin").over(w).alias("cp"),
        F.sum("nq_bin").over(w).alias("cq"),
    )
    s = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.abs(
                F.col("cp") * F.col("nq") - F.col("cq") * F.col("np")
            ).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("num"),
        F.max("np").cast("long").alias("np"),
        F.max("nq").cast("long").alias("nq"),
    )
    return s.select(
        F.col("np").alias("n_baseline"),
        F.col("nq").alias("n_current"),
        F.lit(EMD_BINS).cast("long").alias("n_bins"),
        F.round(
            F.col("num")
            / (F.col("np").cast("double") * F.col("nq"))
            / EMD_BINS,
            6,
        ).alias("emd_norm_r6"),
    )


#: Declared primary keys of the warehouse tables.
_PK_DECLS: tuple[tuple[str, str], ...] = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
)


@query(
    "profile_pk_uniqueness",
    oracle=f"""
    WITH checks AS (
      {" UNION ALL ".join(
          f'''SELECT '{t}.{k}' AS pk,
             CAST((SELECT COUNT(*) FROM {t}) AS BIGINT) AS n_rows,
             CAST((SELECT COUNT(DISTINCT {k}) FROM {t}) AS BIGINT)
               AS n_distinct,
             CAST((SELECT COUNT(*) FROM {t} WHERE {k} IS NULL) AS BIGINT)
               AS n_null'''
          for t, k in _PK_DECLS
      )}
    )
    SELECT pk, n_rows, n_distinct, n_null,
           CAST(n_rows - n_distinct AS BIGINT) AS n_dup_rows,
           CASE WHEN n_rows = n_distinct AND n_null = 0 THEN 1 ELSE 0 END
             AS unique_ok
    FROM checks ORDER BY pk
    """,
    tags=("profiling", "quality", "beyond"),
)
def q_profile_pk_uniqueness(spark, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit over every declared key in the
    warehouse: rows vs distinct key values plus the null-key count,
    one report row per table — the partner check to
    profile_ref_integrity (orphans corrupt joins; duplicate or null
    PRIMARY keys corrupt every aggregate silently, usually from a
    double-applied ingest batch). unique_ok = exact row/distinct
    equality with zero nulls.

    Scale: per table one combinable count + one two-phase distinct
    (the same shape the dedup family shuffles on); the report is
    |tables| rows. At 100 TB swap the exact distinct for HLL and
    alert on estimate < rows·(1−ε) — the plan is otherwise
    identical."""
    frames = []
    for t, k in _PK_DECLS:
        df = load(spark, sf_dir, t).select(F.col(k).alias("k"))
        frames.append(
            df.agg(
                F.count("*").cast("long").alias("n_rows"),
                F.count_distinct("k").cast("long").alias("n_distinct"),
                F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
            ).select(
                F.lit(f"{t}.{k}").alias("pk"),
                "n_rows",
                "n_distinct",
                "n_null",
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.select(
        "pk",
        "n_rows",
        "n_distinct",
        "n_null",
        (F.col("n_rows") - F.col("n_distinct")).cast("long").alias(
            "n_dup_rows"
        ),
        F.when(
            (F.col("n_rows") == F.col("n_distinct")) & (F.col("n_null") == 0),
            1,
        )
        .otherwise(0)
        .alias("unique_ok"),
    ).orderBy("pk")
