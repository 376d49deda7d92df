"""Dimensional-ETL join operators (SURVEY §2.4).

The reference's warehouse loader resolves every dimension value with a
per-row SELECT-probe + INSERT round-trip ("get_or_create",
insert_to_postgres.py:47-83) — its scalability cliff. Here the same
semantics are one `distinct` + window surrogate-key assignment per
dimension and a broadcast equi-join to key the fact — map-side only,
no RPCs, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


def build_dimension(df: DataFrame, natural_key: str, id_col: str, value_col: str) -> DataFrame:
    """Distinct natural keys + dense surrogate ids (reference
    get_or_create, insert_to_postgres.py:47-64, done set-wise).

    `row_number` over a global ordering of the distinct key set — the
    distinct output is tiny (it's a dimension), so the single-partition
    window is not a bottleneck even at 100 TB fact scale.
    """
    w = Window.orderBy(F.col(value_col))
    return (
        df.select(F.col(natural_key).alias(value_col))
        .filter(F.col(value_col).isNotNull())
        .distinct()
        .withColumn(id_col, F.row_number().over(w).cast("long"))
        .select(id_col, value_col)
    )


def global_row_number(
    df: DataFrame, order_col: str, rn_col: str = "rn", partitions: int | None = None
) -> DataFrame:
    """Scale-safe dense global row numbers over a (unique, numeric)
    order key.

    ``row_number().over(Window.orderBy(k))`` moves EVERY row to one
    task — the single-reducer sort that caps at one machine's memory.
    This is the distributed equivalent: bucket rows by approximate
    key quantiles, number rows WITHIN each bucket (partitioned
    window), and add each bucket's broadcast cumulative offset.
    Output values are identical to the global window — bucket
    boundaries only decide WHERE a row is numbered, never WHAT number
    it gets — so a ROW_NUMBER() OVER (ORDER BY k) oracle replays it.

    The boundaries are computed ONCE (a single approxQuantile pass)
    and embedded as PLAN LITERALS, making the bucket id a pure
    function of the key. This matters: `repartitionByRange` re-SAMPLES
    boundaries per physical subtree (seeded by RDD id), so the offsets
    branch and the output branch of this very plan can disagree on
    partition contents — observed as duplicate rns at sf0.01. Literal
    boundaries cannot disagree.

    Costs: one quantile pass + one tiny offsets job (|buckets| rows —
    the unpartitioned cumulative-offset window is bounded by cluster
    config, not data). The order key must be unique (with duplicates
    any global row_number is tie-ambiguous) and numeric (approxQuantile
    contract); pass boundaries yourself via a pre-bucketed column if
    you need string keys.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    qs = [i / n for i in range(1, n)]
    bounds = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
    b_arr = F.array(*[F.lit(float(b)) for b in bounds])
    pid = F.size(
        F.filter(b_arr, lambda b: b < F.col(order_col).cast("double"))
    ).alias("__pid")
    p = df.withColumn("__pid", pid)
    offs = (
        p.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    return (
        p.join(F.broadcast(offs), "__pid")
        .withColumn(rn_col, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )


def key_fact_against_dimension(
    fact: DataFrame, dim: DataFrame, natural_key: str, value_col: str, id_col: str
) -> DataFrame:
    """Replace the fact's natural key with the dimension surrogate id
    via broadcast join (the designed-in speedup over the reference's
    row-at-a-time probe loop)."""
    return (
        fact.join(
            F.broadcast(dim), fact[natural_key] == dim[value_col], "left"
        )
        .drop(value_col)
    )


@query(
    "join_lookup_upsert",
    oracle="""
    WITH dim AS (
      SELECT ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS id_segment,
             c_mktsegment AS segment
      FROM (SELECT DISTINCT c_mktsegment FROM customer)
    )
    SELECT d.id_segment, d.segment, COUNT(*) AS n_customers
    FROM customer c JOIN dim d ON c.c_mktsegment = d.segment
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def q_join_lookup_upsert(spark, sf_dir: str) -> DataFrame:
    """get_or_create as set-wise dimension build + broadcast re-key."""
    customer = load(spark, sf_dir, "customer")
    dim = build_dimension(customer, "c_mktsegment", "id_segment", "segment")
    keyed = customer.join(
        F.broadcast(dim), customer.c_mktsegment == dim.segment, "inner"
    )
    return (
        keyed.groupBy("id_segment", "segment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("id_segment")
    )


@query(
    "join_positional_zip",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
      FROM orders WHERE o_orderstatus = 'F'
    ),
    b AS (
      SELECT o_orderkey AS bk, o_orderpriority,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT a.o_orderkey, a.o_totalprice, b.o_orderpriority
    FROM a JOIN b ON a.rn = b.rn ORDER BY a.o_orderkey
    """,
)
def q_join_positional_zip(spark, sf_dir: str) -> DataFrame:
    """Positional zip-merge of two equally-ordered datasets (reference:
    zip(batch, processed), pipline.py:184-187). The reference's
    positional contract is fragile; here each side gets an explicit
    dense index over a total order and the join is keyed — same
    semantics, restart-safe. (SURVEY §7 hard-point (d).) The index
    comes from `global_row_number` (range-partition + per-partition
    window + broadcast offsets), NOT a partitionBy-less window — both
    sides here are fact-sized, and a global-window formulation would
    funnel the whole table through one task."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    a = global_row_number(
        orders.select("o_orderkey", "o_totalprice"), "o_orderkey"
    )
    b = global_row_number(
        orders.select(F.col("o_orderkey").alias("bk"), "o_orderpriority"), "bk"
    )
    return (
        a.join(b, "rn")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@query(
    "join_key_fallback",
    oracle="""
    WITH src AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS sector,
             CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment ELSE NULL END AS domaine
      FROM customer
    )
    SELECT COALESCE(sector, domaine, 'Unspecified') AS sector_key,
           COUNT(*) AS n
    FROM src GROUP BY 1 ORDER BY 1
    """,
)
def q_join_key_fallback(spark, sf_dir: str) -> DataFrame:
    """Coalescing key variants across source schemas (reference:
    `secteur` or `domaine`, `company_name` or `companie` —
    insert_to_postgres.py:172-201, utils__init__.py:211-226)."""
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("sector"),
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_mktsegment")).alias("domaine"),
    )
    return (
        customer.select(
            F.coalesce("sector", "domaine", F.lit("Unspecified")).alias("sector_key")
        )
        .groupBy("sector_key")
        .agg(F.count("*").alias("n"))
        .orderBy("sector_key")
    )


@query(
    "join_semi_probe",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
)
def q_join_semi_probe(spark, sf_dir: str) -> DataFrame:
    """EXISTS-style probe as left-semi join (reference: SELECT 1 FROM
    dim_calendar WHERE date_id=%s, insert_to_postgres.py:94,117)."""
    customer = load(spark, sf_dir, "customer")
    open_orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return (
        customer.join(
            open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_null_safe",
    oracle="""
    WITH fact AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer
    ),
    dim AS (
      SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 'construction'
                  ELSE lower(c_mktsegment) END AS seg_label
      FROM customer
    )
    SELECT d.seg_label, CAST(COUNT(*) AS BIGINT) AS n
    FROM fact f JOIN dim d ON f.seg IS NOT DISTINCT FROM d.seg
    GROUP BY d.seg_label ORDER BY seg_label
    """,
)
def q_join_null_safe(spark, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the
    dimension lookup where NULL is a legitimate key value ("segment
    unknown") that must match its dimension row instead of silently
    dropping — the exact failure mode of the reference's
    get_or_create loader when a natural key is missing
    (insert_to_postgres.py:67-72 skips the row entirely). A null-safe
    equality is still hash-partitionable (NULLs hash to one partition
    per side), so the plan stays a hash join, not a cartesian."""
    cust = load(spark, sf_dir, "customer")
    fact = cust.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    dim = cust.select(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_mktsegment") == "BUILDING", F.lit("construction"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg_label"),
    ).distinct()
    return (
        fact.join(dim, fact.seg.eqNullSafe(dim.seg), "inner")
        .groupBy("seg_label")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("seg_label")
    )


#: Spatial grid-join constants: derived planar coords in [0, 100),
#: search radius, and the grid cell edge (> radius, so the 3×3
#: neighborhood provably covers every qualifying pair).
GRID_RADIUS2 = 2.25  # radius 1.5, compared as squared distance
GRID_CELL = 2.0
GRID_TOPK = 20
#: Deterministic coordinate recipe: two co-prime multipliers mod 1000
#: (the synthetic tables carry no geo columns). Single source for the
#: Spark side, the oracle, and the sf0.001 non-vacuity probe.
COORD_MULT_X = 7919
COORD_MULT_Y = 104729


def spatial_grid_ctes() -> str:
    """pts/cells/probes CTE text shared by the `join_spatial_grid`
    oracle and its sf0.001 non-vacuity probe (tests/oracle_utils.py's
    _probe_spatial_grid) — one source for the coordinate recipe and
    GRID_CELL, so tuning a constant cannot leave the probe comparing
    a different grid than the query (the drift gram_pairs_ctes was
    introduced to eliminate for the n-gram family)."""
    return f"""pts AS (
      SELECT c_custkey AS k,
             CAST((c_custkey * {COORD_MULT_X}) % 1000 AS DOUBLE) / 10.0 AS x,
             CAST((c_custkey * {COORD_MULT_Y}) % 1000 AS DOUBLE) / 10.0 AS y
      FROM customer
    ),
    cells AS (
      SELECT k, x, y,
             CAST(floor(x / {GRID_CELL}) AS BIGINT) AS cx,
             CAST(floor(y / {GRID_CELL}) AS BIGINT) AS cy
      FROM pts
    ),
    probes AS (
      SELECT c.k, c.x, c.y, c.cx + dx.i AS jx, c.cy + dy.j AS jy
      FROM cells c, (VALUES (-1), (0), (1)) dx(i),
                    (VALUES (-1), (0), (1)) dy(j)
    )"""


def _spatial_d2():
    """Squared pair distance over the candidate frame's column names."""
    return (F.col("ax") - F.col("x")) * (F.col("ax") - F.col("x")) + (
        F.col("ay") - F.col("y")
    ) * (F.col("ay") - F.col("y"))


def spatial_grid_candidates(spark, sf_dir: str):
    """Adjacent-cell candidate pairs BEFORE the distance predicate —
    the grid join's bounded candidate generator (columns ak/ax/ay from
    the probe side, k/x/y/cx/cy from the build side). Shared by
    `join_spatial_grid` and its sf0.001 non-vacuity probe
    (tests/oracle_utils.py): at the 150-customer smoke scale no pair
    falls within the radius, so the gate proves THIS frame's row count
    against the oracle instead of comparing empty-vs-empty."""
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") * COORD_MULT_X) % 1000).cast("double").alias("xr"),
        ((F.col("c_custkey") * COORD_MULT_Y) % 1000).cast("double").alias("yr"),
    ).select(
        "k",
        (F.col("xr") / 10.0).alias("x"),
        (F.col("yr") / 10.0).alias("y"),
    )
    cells = pts.select(
        "k",
        "x",
        "y",
        F.floor(F.col("x") / GRID_CELL).cast("long").alias("cx"),
        F.floor(F.col("y") / GRID_CELL).cast("long").alias("cy"),
    )
    probes = cells.select(
        "k",
        "x",
        "y",
        "cx",
        "cy",
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), i ->"
                " transform(sequence(-1, 1), j -> struct(i, j))))"
            )
        ).alias("o"),
    ).select(
        F.col("k").alias("ak"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.col("cx") + F.col("o.i")).alias("jx"),
        (F.col("cy") + F.col("o.j")).alias("jy"),
    )
    return probes.join(
        cells,
        (F.col("cx") == F.col("jx"))
        & (F.col("cy") == F.col("jy"))
        & (F.col("ak") < F.col("k")),
    )


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH {spatial_grid_ctes()},
    pairs AS (
      SELECT a.k AS a_custkey, b.k AS b_custkey,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM probes a
      JOIN cells b ON b.cx = a.jx AND b.cy = a.jy AND a.k < b.k
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= {GRID_RADIUS2}
    )
    SELECT a_custkey, b_custkey, round(sqrt(d2), 6) AS dist_r6
    FROM pairs
    ORDER BY d2, a_custkey, b_custkey
    LIMIT {GRID_TOPK}
    """,
)
def q_join_spatial_grid(spark, sf_dir: str) -> DataFrame:
    """Grid-bucketed SPATIAL self-join — the closest-pairs query
    ("which customers are within radius r of each other") done the
    way a 100 TB geo pipeline must: never all-pairs. Each point lands
    in one grid cell of edge > r; the probe side fans out to its 3×3
    cell neighborhood (a bounded 9× map-side explode) and the join is
    a plain EQUI-join on the cell id, so candidate pairs are only
    points in adjacent cells — O(n · local density), with the
    distance predicate applied per candidate and a < b dedup giving
    each pair exactly once. Coordinates are derived deterministically
    from the key (two co-prime multipliers mod 1000 — the synthetic
    tables carry no geo columns; the recipe is shared with the
    oracle, the JOIN GEOMETRY is the operator under test).

    Determinism: coords are integer-derived doubles; squared
    distances are the same IEEE expression on both engines; ordering
    ties break on the key pair.

    Scale: the cell key is the shuffle key — density skew (a hot
    city) is the known hazard and is bounded here by cell size;
    at extreme skew, sub-split hot cells (salt on a finer grid)
    exactly like any hot-key join. Top-k is TakeOrdered, no global
    sort."""
    d2 = _spatial_d2()
    pairs = (
        spatial_grid_candidates(spark, sf_dir)
        .filter(d2 <= GRID_RADIUS2)
        .select(
            F.col("ak").alias("a_custkey"),
            F.col("k").alias("b_custkey"),
            d2.alias("d2"),
        )
    )
    return (
        pairs.orderBy("d2", "a_custkey", "b_custkey")
        .limit(GRID_TOPK)
        .select(
            "a_custkey",
            "b_custkey",
            F.round(F.sqrt("d2"), 6).alias("dist_r6"),
        )
    )
