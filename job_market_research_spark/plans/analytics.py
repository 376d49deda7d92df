"""The analytical query surface (SURVEY §2.4-§2.6, §3.3).

The reference's end-user query surface is the set of Superset chart /
dataset SQL queries over its Postgres star schema (reference:
superset/dashboard_export_20250807T121001.zip → datasets/PostgreSQL/
*.yaml, charts/*.yaml). Each is re-expressed here as a declarative
DataFrame plan over the driver's star-shaped testdata:

  fact tables  : orders, lineitem (the offre fact + offre_skill bridge)
  dimensions   : customer, nation, region, part, supplier

Catalyst broadcast-joins every dimension automatically (all are far
below the 10 MB auto-broadcast threshold at any scale factor; at 100 TB
the fact side scales but dimensions stay broadcastable). Aggregations
are partial (map-side combine) before the single hash shuffle on the
group keys — no extra shuffle is introduced anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.exact import (
    ORACLE_AVG,
    ORACLE_REVENUE,
    ORACLE_SUM,
    exact_avg,
    exact_sum,
    revenue_sum,
)
from job_market_research_spark.io import load
from job_market_research_spark.registry import query


@query(
    "join_sector_count",
    oracle="""
    SELECT c_mktsegment AS sector, COUNT(*) AS n_offers
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY sector
    """,
)
def join_sector_count(spark, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim grouped by a dim attribute (reference:
    zip:datasets/PostgreSQL/metrics.yaml:9 — fact_offre ⋈ dim_compagnie
    GROUP BY secteur). Flagship query: dim side broadcasts, one shuffle
    on the group key with map-side partial counts."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("sector"))
        .agg(F.count("*").alias("n_offers"))
        .orderBy("sector")
    )


@query(
    "agg_count_by_sector",
    oracle="""
    SELECT c_mktsegment AS sector, COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment ORDER BY sector
    """,
)
def agg_count_by_sector(spark, sf_dir: str) -> DataFrame:
    """COUNT(*) GROUP BY one key (reference: metrics.yaml:9)."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("sector"))
        .agg(F.count("*").alias("n"))
        .orderBy("sector")
    )


@query(
    "agg_count_2keys",
    oracle="""
    SELECT l_returnflag AS type_skill, l_linestatus AS nom, COUNT(*) AS occurrences
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def agg_count_2keys(spark, sf_dir: str) -> DataFrame:
    """2-level hierarchy counts (reference sunburst:
    zip:datasets/PostgreSQL/KPI-Categories_de_competences.yaml:9 —
    COUNT(*) GROUP BY type_skill, nom)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("type_skill"),
            F.col("l_linestatus").alias("nom"),
        )
        .agg(F.count("*").alias("occurrences"))
        .orderBy("type_skill", "nom")
    )


@query(
    "agg_matrix",
    oracle="""
    SELECT n_name AS row_dim, c_mktsegment AS col_dim, COUNT(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def agg_matrix(spark, sf_dir: str) -> DataFrame:
    """dim × dim count matrix (reference heatmap:
    zip:datasets/PostgreSQL/KPI-Competences_Profils.yaml:9)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("row_dim"), F.col("c_mktsegment").alias("col_dim"))
        .agg(F.count("*").alias("n"))
        .orderBy("row_dim", "col_dim")
    )


@query(
    "agg_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS n_customers FROM orders",
)
def agg_count_distinct(spark, sf_dir: str) -> DataFrame:
    """COUNT_DISTINCT KPI big-number (reference:
    zip:charts/Nombre_total_doffres_Data_5.yaml, COUNT_DISTINCT(id_offer)).
    Exact here; `agg_approx_count_distinct` is the 100 TB-scale twin."""
    return load(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers_exact,
           TRUE AS approx_within_2pct
    FROM orders
    """,
)
def agg_approx_count_distinct(spark, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the scale path for the
    COUNT_DISTINCT KPI. The sketch value itself is engine-specific, so
    the checkable shape is: the exact count plus a Spark-side assertion
    that the HLL estimate lands within 2% of it (the oracle emits the
    exact count and TRUE).

    The exact and approx aggregates run as SEPARATE single-aggregate
    plans joined on their 1-row results (broadcast) — the same split
    agg_sketch_prod uses. Mixing a distinct and a non-distinct
    aggregate in one agg forces Spark onto the two-phase distinct
    strategy for BOTH (measured 3× slower at sf0.1: 2.53 s combined
    vs 0.85 s split); separately, the exact side plans as a partial
    distinct and the sketch side as a plain partial agg. At 100 TB
    only the sketch side would run at all — it replaces the exact
    distinct's full shuffle with constant-size mergeable state."""
    orders = load(spark, sf_dir, "orders")
    exact = orders.agg(F.countDistinct("o_custkey").alias("n_customers_exact"))
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx")
    )
    return exact.crossJoin(F.broadcast(approx)).select(
        "n_customers_exact",
        (
            F.abs(F.col("approx") - F.col("n_customers_exact"))
            <= 0.02 * F.col("n_customers_exact")
        ).alias("approx_within_2pct"),
    )


@query(
    "agg_monthly_growth",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_offers,
           {ORACLE_SUM.format(col="o_totalprice")} AS total_value
    FROM orders GROUP BY 1 ORDER BY month
    """,
)
def agg_monthly_growth(spark, sf_dir: str) -> DataFrame:
    """Month-grain rollup ordered by month (reference:
    zip:charts/Croissance_Mensuelle_7.yaml, time_grain_sqla P1M)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count("*").alias("n_offers"),
            exact_sum("o_totalprice", "total_value"),
        )
        .orderBy("month")
    )


@query(
    "agg_by_dimension",
    oracle="""
    SELECT o_orderpriority AS dim_value, COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY n DESC, dim_value
    """,
)
def agg_by_dimension(spark, sf_dir: str) -> DataFrame:
    """Count by a categorical dimension, sorted by metric desc
    (reference bar/pie charts: zip:charts/Sources_de_recrutement_9.yaml,
    Repartition_par_type_de_contrat_11.yaml — order_desc: true)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("dim_value"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "dim_value")
    )


@query(
    "agg_case_when_flag",
    oracle="""
    SELECT o_orderpriority AS dim_value,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_open
    FROM orders GROUP BY 1 ORDER BY dim_value
    """,
)
def agg_case_when_flag(spark, sf_dir: str) -> DataFrame:
    """Conditional-count metric (reference:
    zip:datasets/PostgreSQL/join1.yaml:9 — CASE WHEN id_niveau_experience
    IS NOT NULL THEN 1 ELSE 0 END summed as avec_experience_requise)."""
    flag = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("dim_value"))
        .agg(
            F.sum(flag).alias("n_finished"),
            F.sum(F.lit(1) - flag).alias("n_open"),
        )
        .orderBy("dim_value")
    )


@query(
    "agg_minmax_dates",
    oracle="""
    SELECT CAST(MIN(o_orderdate) AS DATE) AS min_date,
           CAST(MAX(o_orderdate) AS DATE) AS max_date
    FROM orders
    """,
)
def agg_minmax_dates(spark, sf_dir: str) -> DataFrame:
    """min/max of the date column bounding the calendar dimension
    (reference: insert_to_postgres.py:86-114)."""
    return load(spark, sf_dir, "orders").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_date"),
    )


@query(
    "join_star_wide",
    oracle=f"""
    SELECT r_name AS region, n_name AS nation, c_mktsegment AS segment,
           COUNT(*) AS n_lines,
           {ORACLE_REVENUE} AS revenue,
           CAST(SUM(CASE WHEN p_partkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS with_part
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey  = s_suppkey
    LEFT JOIN part ON l_partkey = p_partkey AND p_size > 25
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def join_star_wide(spark, sf_dir: str) -> DataFrame:
    """7-way star equi-join — 6 INNER + 1 LEFT with derived metrics
    (reference: zip:datasets/PostgreSQL/join1.yaml:9, the flat `join1`
    view: fact_offre ⋈ 6 dims INNER + dim_niveau_experience LEFT).

    Broadcast hints only on the genuinely bounded dims (region: 5 rows,
    nation: 25 rows — fixed regardless of scale factor). customer /
    supplier / part GROW with scale factor, so they carry no hint:
    Catalyst/AQE broadcasts them while they fit under
    autoBroadcastJoinThreshold and falls back to shuffle join at 100×
    scale instead of OOMing on a forced broadcast. At 100 TB the
    fact⋈orders join is the large one — orders co-partitions with
    lineitem on orderkey in real deployments (bucketing); here AQE picks
    shuffle strategy."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    supplier = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part")

    wide = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(
            part,
            (li.l_partkey == part.p_partkey) & (part.p_size > 25),
            "left",
        )
    )
    return (
        wide.groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("*").alias("n_lines"),
            revenue_sum("revenue"),
            F.sum(F.when(F.col("p_partkey").isNotNull(), 1).otherwise(0)).alias(
                "with_part"
            ),
        )
        .orderBy("region", "nation", "segment")
    )


@query(
    "join_skill_bridge",
    oracle="""
    SELECT p_brand AS skill, COUNT(*) AS occurrences
    FROM lineitem
    JOIN part   ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def join_skill_bridge(spark, sf_dir: str) -> DataFrame:
    """fact ⋈ bridge ⋈ dim (M:N resolution; reference:
    zip:datasets/PostgreSQL/KPI-Categories_de_competences.yaml:9 —
    offre_skill bridge joined to dim_skill and fact_offre). lineitem
    plays the bridge; part the skill dimension."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("p_brand").alias("skill"))
        .agg(F.count("*").alias("occurrences"))
        .orderBy("skill")
    )


@query(
    "join_skill_profile",
    oracle="""
    SELECT p_brand AS skill, c_mktsegment AS profile, COUNT(*) AS n
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def join_skill_profile(spark, sf_dir: str) -> DataFrame:
    """4-way join powering the skills×titles heatmap (reference:
    zip:datasets/PostgreSQL/KPI-Competences_Profils.yaml:9)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("p_brand").alias("skill"), F.col("c_mktsegment").alias("profile"))
        .agg(F.count("*").alias("n"))
        .orderBy("skill", "profile")
    )


@query(
    "join_skill_experience",
    oracle="""
    SELECT p_brand AS source, o_orderpriority AS target, COUNT(*) AS value
    FROM lineitem
    JOIN part   ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def join_skill_experience(spark, sf_dir: str) -> DataFrame:
    """4-way sankey source/target/value (reference:
    zip:datasets/PostgreSQL/KPI-Competences_Niveau_dexperience.yaml:9)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("p_brand").alias("source"), F.col("o_orderpriority").alias("target"))
        .agg(F.count("*").alias("value"))
        .orderBy("source", "target")
    )


@query(
    "topk_hard_skills",
    oracle="""
    SELECT p_brand AS skill, COUNT(*) AS occurrences
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'STANDARD'
    GROUP BY 1
    ORDER BY occurrences DESC, skill
    LIMIT 20
    """,
)
def topk_hard_skills(spark, sf_dir: str) -> DataFrame:
    """Filtered top-20 by occurrence count (reference:
    zip:datasets/PostgreSQL/KPI-Top_20_skills_techniques_hard.yaml:9 —
    WHERE type_skill='hard' ORDER BY occurrences DESC LIMIT 20).
    Deterministic tie-break on the key so the oracle hash matches.
    The p_type filter pushes down into the broadcast dim scan."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("skill"))
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), "skill")
        .limit(20)
    )


@query(
    "topk_companies",
    oracle="""
    SELECT c_name AS company, COUNT(*) AS n_offers
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY n_offers DESC, company LIMIT 20
    """,
)
def topk_companies(spark, sf_dir: str) -> DataFrame:
    """Top-20 entities by activity (reference:
    zip:charts/Top_20_des_entreprises_qui_recrutent_le_plus_8.yaml)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_name").alias("company"))
        .agg(F.count("*").alias("n_offers"))
        .orderBy(F.desc("n_offers"), "company")
        .limit(20)
    )


@query(
    "filter_metric_threshold",
    oracle="""
    SELECT n_nationkey AS nation_id, COUNT(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1 HAVING COUNT(*) >= 5 ORDER BY 1
    """,
)
def filter_metric_threshold(spark, sf_dir: str) -> DataFrame:
    """HAVING-style post-aggregation filter (reference:
    zip:charts/Repartition_par_secteur_6.yaml — adhoc filter count >= 5)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nation_id"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
        .orderBy("nation_id")
    )


@query(
    "filter_skill_type",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part WHERE p_type = 'ECONOMY' ORDER BY p_partkey
    """,
)
def filter_skill_type(spark, sf_dir: str) -> DataFrame:
    """Simple typed predicate before downstream top-k (reference:
    zip:datasets/PostgreSQL/KPI-Top_20_skills_techniques_hard.yaml:9 —
    WHERE type_skill = 'hard'). Pushed into the parquet scan."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


@query(
    "filter_temporal_range",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
)
def filter_temporal_range(spark, sf_dir: str) -> DataFrame:
    """Temporal-range predicate (reference: Superset TEMPORAL_RANGE
    adhoc filter on full_date, zip:charts/Croissance_Mensuelle_7.yaml).
    The timestamp bounds push down to the parquet row-group stats."""
    return (
        load(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "sort_row_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_row_limit(spark, sf_dir: str) -> DataFrame:
    """Generic chart row cap: ORDER BY metric LIMIT n (reference:
    zip:charts/Sources_de_recrutement_9.yaml row_limit). Spark executes
    this as TakeOrderedAndProject — no global sort materialized."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {ORACLE_SUM.format(col="l_quantity")} AS sum_qty,
           {ORACLE_SUM.format(col="l_extendedprice")} AS sum_base_price,
           {ORACLE_REVENUE} AS sum_disc_price,
           {ORACLE_AVG.format(col="l_quantity")} AS avg_qty,
           {ORACLE_AVG.format(col="l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2002-01-01 00:00:00'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def agg_pricing_summary(spark, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary — the canonical scan-heavy
    aggregate a Spark analytics engine is judged by: one full fact
    scan, map-side partial aggregation into a handful of groups, all
    money math in exact decimal (`exact.py` policy). The date predicate
    pushes to the parquet row-group stats."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2002-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            revenue_sum("sum_disc_price"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    qs AS (
      SELECT quantile_cont(epoch(last_order), 0.5) AS r_med,
             quantile_cont(freq, 0.5) AS f_med,
             quantile_cont(monetary, 0.5) AS m_med
      FROM rfm
    ),
    scored AS (
      SELECT CAST(epoch(r.last_order) > q.r_med AS INT) AS r_hi,
             CAST(r.freq > q.f_med AS INT) AS f_hi,
             CAST(r.monetary > q.m_med AS INT) AS m_hi,
             r.monetary
      FROM rfm r CROSS JOIN qs q
    )
    SELECT r_hi, f_hi, m_hi,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(CAST(SUM(CAST(monetary AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_monetary
    FROM scored GROUP BY 1, 2, 3 ORDER BY r_hi, f_hi, m_hi
    """,
)
def q_agg_rfm_segmentation(spark, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary per
    customer, each split at its corpus median → 8 segments with
    population and average spend (the classic CRM cube).

    One customer-keyed aggregation builds the RFM table; the three
    medians are ONE t-digest-swappable aggregate broadcast as a 1-row
    crossJoin; scoring is a map-side comparison and the final rollup
    is 8 rows. Recency compares epoch seconds (integer) so both
    engines threshold identically."""
    rfm = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("long").alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    rfm = rfm.withColumn(
        "last_epoch", F.unix_timestamp(F.col("last_order")).cast("double")
    )
    qs = rfm.agg(
        F.percentile("last_epoch", F.lit(0.5)).alias("r_med"),
        F.percentile("freq", F.lit(0.5)).alias("f_med"),
        F.percentile("monetary", F.lit(0.5)).alias("m_med"),
    )
    scored = rfm.crossJoin(F.broadcast(qs)).select(
        (F.col("last_epoch") > F.col("r_med")).cast("int").alias("r_hi"),
        (F.col("freq") > F.col("f_med")).cast("int").alias("f_hi"),
        (F.col("monetary") > F.col("m_med")).cast("int").alias("m_hi"),
        "monetary",
    )
    return (
        scored.groupBy("r_hi", "f_hi", "m_hi")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(
                F.sum(F.col("monetary").cast("decimal(18,4)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_monetary"),
        )
        .orderBy("r_hi", "f_hi", "m_hi")
    )


#: Basket-affinity report bounds. Support 3 (not 5): pair
#: co-occurrence DILUTES with scale in this testdata (more orders but
#: proportionally more parts — max support is 5 at sf0.01 and only 3
#: at sf0.1), so a floor of 5 made the report empty at the benchmark
#: scale and the oracle comparison vacuous (r14 empty-result audit).
#: At 3 the report is non-empty at every SF (433/63/2 qualifying
#: pairs at sf0.001/0.01/0.1) and the TOP cut bounds the output.
BASKET_MIN_SUPPORT = 3
BASKET_TOP = 25


def staged_basket_arrays(spark, sf_dir: str) -> DataFrame:
    """Persisted per-order basket table (ok, sorted distinct parts
    array) — the materialized form every market-basket pipeline writes
    out first (see q_agg_basket_affinity's docstring). Module-level
    (r17) so the BENCH_ALL sweep can front the build as its own
    `stage:` row."""
    from job_market_research_spark.staging import staged_frame

    return staged_frame(spark, "basket_arrays", sf_dir,
        lambda: (
            load(spark, sf_dir, "lineitem")
            .select(
                F.col("l_orderkey").alias("ok"),
                F.col("l_partkey").alias("part"),
            )
            # collect_SET dedupes inside the aggregation, so the build
            # is ONE shuffle on ok (a separate distinct() would add a
            # (ok, part) shuffle first — measured 1.25-2.7 s vs
            # 0.76-1.05 s cold at sf0.1, r14)
            .groupBy("ok")
            .agg(F.sort_array(F.collect_set("part")).alias("parts"))
        ),
    )


@query(
    "agg_basket_affinity",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
    isup AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS s FROM items GROUP BY part
    ),
    pairs AS (
      SELECT a.part AS part_a, b.part AS part_b,
             CAST(COUNT(*) AS BIGINT) AS s_ab
      FROM items a JOIN items b ON a.ok = b.ok AND a.part < b.part
      GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, p.s_ab,
           round(CAST(p.s_ab AS DOUBLE) * n.n_orders
                 / (sa.s * sb.s), 6) AS lift
    FROM pairs p
    JOIN isup sa ON sa.part = p.part_a
    JOIN isup sb ON sb.part = p.part_b
    CROSS JOIN n
    WHERE p.s_ab >= {BASKET_MIN_SUPPORT}
    ORDER BY lift DESC, part_a, part_b LIMIT {BASKET_TOP}
    """,
)
def q_agg_basket_affinity(spark, sf_dir: str) -> DataFrame:
    """Market-basket affinity: co-occurrence counts and lift
    (P(ab)·N / (s_a·s_b)) for part pairs appearing in the same order
    — "frequently bought together".

    Scale shape (r14, A/B'd 0.72x warm vs the ok-keyed self-join at
    sf0.1, value-identical at sf0.01): the staged frame IS the basket
    table — per-order sorted arrays of distinct parts, the
    materialized form every market-basket pipeline writes out first.
    Pair enumeration is then a NARROW per-row array combination
    (explode × higher-order filter), items² fan-out bounded by basket
    size (≤7 lineitems in this schema; a df-cap on pathological
    baskets is the `GRAM_DF_CAP` pattern) — no self-join, so the only
    corpus shuffle left is the pair aggregation itself. Basket count N
    is a row count of the staged table (no distinct shuffle); item
    supports are vocabulary-sized (broadcast); N rides a 1-row
    broadcast; the support floor prunes the pair table before the
    lift join. Same algebra as `text_pmi_collocations` on a different
    domain — lift is exp(PMI)."""

    baskets = staged_basket_arrays(spark, sf_dir)
    n = baskets.agg(F.count("*").cast("long").alias("n_orders"))
    isup = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count("*").cast("long").alias("s"))
    )
    pairs = (
        baskets.select(F.explode("parts").alias("part_a"), "parts")
        .select(
            "part_a",
            F.explode(
                # parts is sorted+distinct, so strict > emits each
                # unordered pair exactly once
                F.filter("parts", lambda x: x > F.col("part_a"))
            ).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("s_ab"))
        .filter(F.col("s_ab") >= BASKET_MIN_SUPPORT)
    )
    sa = isup.select(F.col("part").alias("part_a"), F.col("s").alias("s_a"))
    sb = isup.select(F.col("part").alias("part_b"), F.col("s").alias("s_b"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "s_ab",
            F.round(
                F.col("s_ab").cast("double") * F.col("n_orders")
                / (F.col("s_a") * F.col("s_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(BASKET_TOP)
    )


@query(
    "join_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
)
def q_join_shipping_priority(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped orders of one
    market segment by discounted revenue — the canonical
    filter→join→aggregate→top-k OLAP plan, included so the engine's
    benchmark-classic surface is explicit next to the domain queries.

    Plan notes at scale: both filters push to their parquet scans
    BEFORE the joins (segment on customer, dates on orders/lineitem),
    the customer side shrinks to one segment (broadcastable), orders ⋈
    lineitem co-partitions on orderkey, revenue sums in exact DECIMAL
    reduced to scale 4 (`exact.revenue_sum` rationale), and the top-10
    is TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1995-03-15").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate")
        > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(revenue_sum("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "join_local_supplier_volume",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, nation
    """,
)
def q_join_local_supplier_volume(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation where the
    customer and supplier share a nation, one region only — the
    benchmark's classic multi-join with a non-key equality
    (c_nationkey = s_nationkey) folded into the supplier join.

    Scale notes: region/nation broadcast (fixed cardinality); the
    region filter prunes the nation dimension BEFORE the big joins;
    orders ⋈ lineitem co-partitions on orderkey; the extra nationkey
    equality rides the supplier hash join as a second key, not a
    post-filter. Revenue in exact DECIMAL, scale-4 reduced."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(revenue_sum("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )
