"""The reference's SECOND star schema, plus the reconciliation operator.

The reference maintains TWO divergent warehouse stars over the same
offers: the French `schema.sql` star Superset queries (plans/star.py)
and the English star `insert_to_postgres.py` populates (reference:
insert_to_postgres.py:27-40 — dim_calendar, dim_contract,
dim_work_type, dim_location, dim_company, dim_profile, dim_skill,
dim_sector, dim_education, dim_experience, fact_offer,
fact_offer_skill). They diverge in

- naming/language (dim_contrat.contrat vs dim_contract.contract_type),
- normalization: v2 lowercases+trims every dim value before keying
  (get_or_create_dim, insert_to_postgres.py:71-76); v1 keeps raw case,
- sentinel policy: v2 maps ''/'unknown' to a NULL foreign key
  (insert_to_postgres.py:72-73), v1 drops the dim row,
- calendar grain: natural `date_id` date key + English attributes
  (insert_to_postgres.py:96-134) vs surrogate `id_date` + French,
- fact grain: first-sector FK on the fact (insert_to_postgres.py:199-204)
  vs sector carried on dim_compagnie,
- date fallback: unparseable publication dates land on the sentinel
  2000-01-01 row (insert_to_postgres.py:10,162-164) instead of NULL.

SURVEY §7(b) flags the divergence as the reference's #1 documented
defect; `harmonize_dims` below is the reconciliation the reference
never wrote: a full-outer crosswalk between a v1 dim and its v2
counterpart on the v2 normalization, with a conformed surrogate key.

Execution shape matches plans/star.py: dims are distinct + map-side
HASH surrogate keys (see star.surrogate_id — no partitionBy-less
windows anywhere in the build), the fact keys via broadcast LEFT
joins (map-side, zero fact shuffle), so at 100 TB the fact scan
dominates and nothing else grows. Hash ids also preserve the
reference's get_or_create stability (insert_to_postgres.py:47-64)
across re-ingest, which sequential ids never did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.functions.dates import calendar_range
from job_market_research_spark.io import load
from job_market_research_spark.plans.star import surrogate_id
from job_market_research_spark.registry import query

#: insert_to_postgres.py:10 — unparseable dates key to this row.
DEFAULT_DATE = "2000-01-01"

_SENTINELS = ("", "unknown")


def _norm(col: F.Column) -> F.Column:
    """v2 value normalization (insert_to_postgres.py:71-76):
    trim + lowercase; ''/'unknown' and NULL become NULL."""
    v = F.lower(F.trim(col))
    return F.when(v.isin(*_SENTINELS), F.lit(None)).otherwise(v)


def _loc_key(city: F.Column, country: F.Column) -> F.Column:
    """Composite natural key for dim_location with a NULL marker
    (chr(31), a control char that cannot appear in normalized values)
    so (NULL,'x') and ('x',NULL) hash to DIFFERENT ids. Oracle twin:
    ``coalesce(city, chr(31)) || '|' || coalesce(country, chr(31))``."""
    nul = F.lit("\x1f")
    return F.concat_ws("|", F.coalesce(city, nul), F.coalesce(country, nul))


def _dim_v2(df: DataFrame, expr: F.Column, id_col: str, value_col: str) -> DataFrame:
    """distinct normalized values + deterministic hash surrogate key
    (map-side projection; no single-partition window)."""
    vals = (
        df.select(_norm(expr).alias(value_col))
        .filter(F.col(value_col).isNotNull())
        .distinct()
    )
    return vals.withColumn(id_col, surrogate_id(F.col(value_col))).select(
        id_col, value_col
    )


def calendar_attrs_v2(df: DataFrame, date_col: str) -> DataFrame:
    """The v2 calendar attributes — ENGLISH names over the natural date
    key (insert_to_postgres.py:119-131), where v1 uses French names and
    a surrogate (functions/dates.calendar_attrs)."""
    d = F.col(date_col)
    return df.select(
        d.alias("date_id"),
        F.year(d).cast("long").alias("year"),
        F.quarter(d).cast("long").alias("quarter"),
        F.month(d).cast("long").alias("month_number"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.dayofmonth(d).cast("long").alias("day"),
        (F.year(d) * 100 + F.month(d)).cast("long").alias("year_month"),
        (((F.dayofweek(d) + 5) % 7) + 1).cast("long").alias("day_of_week"),
        F.weekofyear(d).cast("long").alias("week_of_year"),
        F.date_format(d, "dd/MM/yyyy").alias("date_str"),
    )


def build_star_v2(offers: DataFrame) -> dict[str, DataFrame]:
    """ENRICHED_SCHEMA-shaped offers → the insert_to_postgres star.

    Columns the scraped sources don't always carry (type_travail,
    profile, seniority, ville/region) are picked when present and NULL
    otherwise — mirroring the reference's dict-get fallbacks
    (insert_to_postgres.py:166-201). Returns {table: DataFrame}.
    """
    cols = set(offers.columns)

    def pick(*names: str) -> F.Column:
        present = [F.col(n) for n in names if n in cols]
        return F.coalesce(*present) if present else F.lit(None).cast("string")

    src = offers.select(
        "job_url",
        F.col("titre").alias("title"),
        pick("source", "via").alias("source"),
        F.col("date_publication").alias("pub_date"),
        pick("contrat").alias("contract_type"),
        pick("type_travail").alias("work_type"),
        pick("compagnie", "companie", "company_name").alias("company_name"),
        pick("profile").alias("profile"),
        pick("niveau_etudes", "education_level").alias("education_level"),
        pick("niveau_experience", "seniority").alias("seniority"),
        pick("ville", "city").alias("city"),
        pick("country", "region").alias("country"),
        # first sector or NULL (insert_to_postgres.py:199-204
        # `sector_list[0] if sector_list else None`); try_element_at
        # tolerates the empty array under ANSI mode
        F.try_element_at(pick_array(offers, "secteur"), F.lit(1)).alias("sector"),
        pick_array(offers, "skills").alias("skills"),
    )

    dims = {
        "dim_contract": _dim_v2(src, F.col("contract_type"), "contract_id", "contract_type"),
        "dim_work_type": _dim_v2(src, F.col("work_type"), "work_type_id", "work_type"),
        "dim_company": _dim_v2(src, F.col("company_name"), "company_id", "company_name"),
        "dim_profile": _dim_v2(src, F.col("profile"), "profile_id", "profile"),
        "dim_education": _dim_v2(
            src, F.col("education_level"), "education_id", "education_level"
        ),
        "dim_experience": _dim_v2(src, F.col("seniority"), "experience_id", "seniority"),
        "dim_sector": _dim_v2(src, F.col("sector"), "sector_id", "sector"),
    }

    # dim_location keys on the (city, country) pair
    # (insert_to_postgres.py:186-196 — a dict-valued get_or_create).
    loc_vals = (
        src.select(_norm(F.col("city")).alias("city"), _norm(F.col("country")).alias("country"))
        .filter(F.col("city").isNotNull() | F.col("country").isNotNull())
        .distinct()
    )
    dims["dim_location"] = loc_vals.withColumn(
        "location_id", surrogate_id(_loc_key(F.col("city"), F.col("country")))
    ).select("location_id", "city", "country")

    # dim_skill: (skill, skill_type), lowercased (get_or_create_skill,
    # insert_to_postgres.py:79-88).
    skill_vals = (
        src.select(F.explode("skills").alias("s"))
        .select(_norm(F.col("s.nom")).alias("skill"), F.col("s.type_skill").alias("skill_type"))
        .filter(F.col("skill").isNotNull() & F.col("skill_type").isin("hard", "soft"))
        .groupBy("skill")
        .agg(F.min("skill_type").alias("skill_type"))
    )
    dims["dim_skill"] = skill_vals.withColumn(
        "skill_id", surrogate_id(F.col("skill"))
    ).select("skill_id", "skill", "skill_type")

    # dim_calendar: densified span + the DEFAULT_DATE sentinel row,
    # keyed by the natural date (insert_to_postgres.py:96-134).
    cal = calendar_range(src.filter(F.col("pub_date").isNotNull()), "pub_date")
    cal = cal.unionByName(
        offers.sparkSession.range(1).select(
            F.lit(DEFAULT_DATE).cast("date").alias("full_date")
        )
    ).distinct()
    dims["dim_calendar"] = calendar_attrs_v2(cal, "full_date")

    # fact_offer: surrogate offer_id; every dim FK attached via
    # broadcast LEFT join on the normalized value (NULL value → NULL
    # FK, the v2 sentinel policy); date falls back to DEFAULT_DATE.
    # offer_id is a map-side hash of the natural key (job_url): the
    # global row_number this replaces was a single-reducer sort at
    # fact cardinality — the documented 100 TB scale-killer.
    fact = src.withColumn("offer_id", surrogate_id(F.col("job_url"))).withColumn(
        "date_id",
        F.coalesce(F.col("pub_date"), F.lit(DEFAULT_DATE).cast("date")),
    )

    def attach(fact_df: DataFrame, dim: DataFrame, val_col: str, id_col: str) -> DataFrame:
        keyed = dim.select(id_col, F.col(dim.columns[1]).alias("__v"))
        return (
            fact_df.withColumn("__v", _norm(F.col(val_col)))
            .join(F.broadcast(keyed), on="__v", how="left")
            .drop("__v")
        )

    fact = attach(fact, dims["dim_contract"], "contract_type", "contract_id")
    fact = attach(fact, dims["dim_work_type"], "work_type", "work_type_id")
    fact = attach(fact, dims["dim_company"], "company_name", "company_id")
    fact = attach(fact, dims["dim_profile"], "profile", "profile_id")
    fact = attach(fact, dims["dim_education"], "education_level", "education_id")
    fact = attach(fact, dims["dim_experience"], "seniority", "experience_id")
    fact = attach(fact, dims["dim_sector"], "sector", "sector_id")
    # NULL-SAFE equality on the composite key: a country-only location
    # (city NULL) must still key to its dim row — the reference's
    # lookup breaks here (WHERE city = NULL never matches,
    # insert_to_postgres.py:52-56, minting a duplicate dim row per
    # offer); eqNullSafe is the repair, not a faithful copy of the bug.
    loc = F.broadcast(
        dims["dim_location"].select(
            "location_id",
            F.col("city").alias("__dc"),
            F.col("country").alias("__dk"),
        )
    )
    fact = (
        fact.withColumn("__c", _norm(F.col("city")))
        .withColumn("__k", _norm(F.col("country")))
        .join(
            loc,
            F.col("__c").eqNullSafe(F.col("__dc"))
            & F.col("__k").eqNullSafe(F.col("__dk")),
            how="left",
        )
        .drop("__c", "__k", "__dc", "__dk")
    )

    fact_offer = fact.select(
        "offer_id",
        "source",
        "job_url",
        "title",
        "date_id",
        "contract_id",
        "work_type_id",
        "location_id",
        "company_id",
        "profile_id",
        "education_id",
        "experience_id",
        "sector_id",
    )

    bridge = (
        fact.select("offer_id", F.explode("skills").alias("s"))
        .select("offer_id", _norm(F.col("s.nom")).alias("skill"))
        .filter(F.col("skill").isNotNull())
        .join(F.broadcast(dims["dim_skill"].select("skill_id", "skill")), on="skill")
        .select("offer_id", "skill_id")
        .distinct()
    )

    return {**dims, "fact_offer": fact_offer, "fact_offer_skill": bridge}


def pick_array(offers: DataFrame, name: str) -> F.Column:
    """Column if present, else an empty array of the right rough shape
    (string array for secteur, struct array for skills)."""
    if name in offers.columns:
        return F.col(name)
    if name == "skills":
        return F.array().cast("array<struct<nom:string,type_skill:string>>")
    return F.array().cast("array<string>")


def harmonize_dims(
    v1_dim: DataFrame,
    v1_id: str,
    v1_val: str,
    v2_dim: DataFrame,
    v2_id: str,
    v2_val: str,
) -> DataFrame:
    """Reconcile a v1 dim with its v2 counterpart — the operator the
    reference is missing (its two stars silently drift apart).

    Full-outer crosswalk on the v2 normalization (lower+trim of the v1
    value == the already-normalized v2 value), emitting one row per
    conformed value: both surrogate ids (NULL where absent), a
    `presence` flag (both / v1_only / v2_only), and a deterministic
    `conformed_id` = hash of the conformed value (map-side, stable
    across re-runs — no window at all). Both inputs are
    dimension-sized, so the full-outer join is bounded regardless of
    fact scale.
    """
    a = v1_dim.select(
        F.col(v1_id).alias("v1_id"), F.col(v1_val).alias("__v1_val")
    ).withColumn("__k", F.lower(F.trim(F.col("__v1_val"))))
    b = v2_dim.select(F.col(v2_id).alias("v2_id"), F.col(v2_val).alias("__k"))
    j = a.join(b, on="__k", how="full_outer")
    out = j.select(
        F.col("__k").alias("conformed_value"),
        "v1_id",
        "v2_id",
        F.when(F.col("v1_id").isNotNull() & F.col("v2_id").isNotNull(), F.lit("both"))
        .when(F.col("v1_id").isNotNull(), F.lit("v1_only"))
        .otherwise(F.lit("v2_only"))
        .alias("presence"),
    )
    return out.withColumn(
        "conformed_id", surrogate_id(F.col("conformed_value"))
    ).select("conformed_id", "conformed_value", "v1_id", "v2_id", "presence")


# ---------------------------------------------------------------------------
# Testdata-analog registry queries (driver-provable oracle twins).
# ---------------------------------------------------------------------------

#: Oracle twin of star.surrogate_id (portable_hash60 of a string expr).
_ORACLE_SID = "CAST(('0x' || substr(md5({v}), 1, 15)) AS BIGINT)"
#: Oracle twin of _loc_key(city, country).
_ORACLE_LOC = "coalesce(city, chr(31)) || '|' || coalesce(country, chr(31))"


@query(
    "star2_dim_location",
    oracle=f"""
    SELECT {_ORACLE_SID.format(v=_ORACLE_LOC)} AS location_id,
           city, country
    FROM (SELECT DISTINCT lower(n_name) AS city, lower(r_name) AS country
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey)
    ORDER BY location_id
    """,
)
def q_star2_dim_location(spark, sf_dir: str) -> DataFrame:
    """The v2 composite-key dimension build (dim_location analog;
    insert_to_postgres.py:186-196): distinct normalized (city, country)
    pairs + deterministic surrogate. customer⋈nation⋈region plays the
    scraped location; nation/region broadcast (bounded), the distinct
    is dimension-sized."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    pairs = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.lower(F.col("n_name")).alias("city"),
            F.lower(F.col("r_name")).alias("country"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "location_id", surrogate_id(_loc_key(F.col("city"), F.col("country")))
        )
        .select("location_id", "city", "country")
        .orderBy("location_id")
    )


@query(
    "star2_fact_offer",
    oracle=f"""
    WITH seg AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'unknown'
                  ELSE lower(c_mktsegment) END AS segment_v,
             lower(n_name) AS city, lower(r_name) AS country
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    ),
    dim_segment AS (
      SELECT {_ORACLE_SID.format(v="segment_v")} AS segment_id, segment_v
      FROM (SELECT DISTINCT segment_v FROM seg
            WHERE segment_v NOT IN ('', 'unknown'))
    ),
    dim_location AS (
      SELECT {_ORACLE_SID.format(v=_ORACLE_LOC)} AS location_id, city, country
      FROM (SELECT DISTINCT city, country FROM seg)
    )
    SELECT o_orderkey AS offer_id,
           lower(o_orderpriority) AS contract_type,
           ds.segment_id, dl.location_id,
           CAST(o_orderdate AS DATE) AS date_id
    FROM orders
    JOIN seg ON o_custkey = seg.c_custkey
    LEFT JOIN dim_segment ds ON seg.segment_v = ds.segment_v
    LEFT JOIN dim_location dl
           ON seg.city = dl.city AND seg.country = dl.country
    WHERE o_orderkey % 7 = 0
    ORDER BY offer_id
    """,
)
def q_star2_fact_offer(spark, sf_dir: str) -> DataFrame:
    """The v2 fact-keying pattern (fact_offer analog;
    insert_to_postgres.py:203-231): every FK attached by broadcast
    LEFT join on the NORMALIZED value, with the sentinel policy —
    'unknown' (here: negative-balance customers' segment) keys to a
    NULL FK instead of a sentinel dim row. Dims are dimension-sized so
    every attach broadcasts; the fact never shuffles."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    orders = load(spark, sf_dir, "orders")

    seg = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, F.lit("unknown"))
            .otherwise(F.lower(F.col("c_mktsegment")))
            .alias("segment_v"),
            F.lower(F.col("n_name")).alias("city"),
            F.lower(F.col("r_name")).alias("country"),
        )
    )
    dim_segment = _dim_v2(seg, F.col("segment_v"), "segment_id", "segment_v")
    dim_location = (
        seg.select("city", "country")
        .distinct()
        .withColumn(
            "location_id", surrogate_id(_loc_key(F.col("city"), F.col("country")))
        )
    )
    fact = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .join(seg, orders.o_custkey == seg.c_custkey)
        .join(F.broadcast(dim_segment), on="segment_v", how="left")
        .join(F.broadcast(dim_location), on=["city", "country"], how="left")
    )
    # no trailing sort: the output is fact-sized and the driver's
    # value hash is order-insensitive — a presentational orderBy here
    # is a pure range-shuffle tax.
    return fact.select(
        F.col("o_orderkey").alias("offer_id"),
        F.lower(F.col("o_orderpriority")).alias("contract_type"),
        "segment_id",
        "location_id",
        F.col("o_orderdate").cast("date").alias("date_id"),
    )


@query(
    "star2_harmonize_dims",
    oracle=f"""
    WITH v1 AS (SELECT DISTINCT p_type AS val FROM part
                WHERE p_size > 25),
         v2 AS (SELECT DISTINCT lower(p_type) AS val FROM part
                WHERE p_retailprice > 1200),
         v1k AS (SELECT {_ORACLE_SID.format(v="val")} AS v1_id, val FROM v1),
         v2k AS (SELECT {_ORACLE_SID.format(v="val")} AS v2_id, val FROM v2)
    SELECT {_ORACLE_SID.format(v="COALESCE(lower(v1k.val), v2k.val)")}
             AS conformed_id,
           COALESCE(lower(v1k.val), v2k.val) AS conformed_value,
           v1k.v1_id, v2k.v2_id,
           CASE WHEN v1k.v1_id IS NOT NULL AND v2k.v2_id IS NOT NULL
                  THEN 'both'
                WHEN v1k.v1_id IS NOT NULL THEN 'v1_only'
                ELSE 'v2_only' END AS presence
    FROM v1k FULL OUTER JOIN v2k ON lower(v1k.val) = v2k.val
    ORDER BY conformed_id
    """,
)
def q_star2_harmonize_dims(spark, sf_dir: str) -> DataFrame:
    """`harmonize_dims` end-to-end: a v1-style dim (raw-case part
    types of large parts) reconciled with a v2-style dim (lowercased
    types of expensive parts) — two stars populated from different
    ingest slices, exactly how the reference's stars drift. The
    crosswalk carries both surrogate keys, a presence flag with
    genuine v1_only/v2_only rows, and the conformed key."""
    part = load(spark, sf_dir, "part")
    v1 = (
        part.filter(F.col("p_size") > 25)
        .select(F.col("p_type").alias("ptype"))
        .distinct()
        .withColumn("v1_id", surrogate_id(F.col("ptype")))
    )
    v2 = (
        part.filter(F.col("p_retailprice") > 1200)
        .select(F.lower(F.col("p_type")).alias("ptype"))
        .distinct()
        .withColumn("v2_id", surrogate_id(F.col("ptype")))
    )
    return harmonize_dims(v1, "v1_id", "ptype", v2, "v2_id", "ptype").orderBy(
        "conformed_id"
    )
