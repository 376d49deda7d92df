"""Star-schema builder (SURVEY §1.1, FIXTURES.md §A4).

Builds the reference's authoritative warehouse star (docker-entrypoint-
initdb.d/schema.sql:4-95 — the schema Superset actually queries) from a
cleaned offer frame: 7 dimensions + dim_date, fact_offre, and the
offre_skill bridge. SURVEY §7 hard-point (b): the reference carries a
second, divergent star (insert_to_postgres.py:27-40); we build the
schema.sql one and expose the extra dims (location/work_type) as
optional derivations.

Execution shape (SURVEY §4 physical notes): each dimension is a
`distinct` (one shuffle of dimension cardinality, not fact
cardinality) with a HASH surrogate key — a pure projection, no window,
no single-partition sort; the fact is keyed with broadcast joins only
(map-side, zero fact shuffle); the bridge is explode + broadcast join;
dim_date is sequence+explode keyed by days-since-epoch (no shuffle).
At 100 TB the fact scan dominates and nothing else grows.

Surrogate-key policy: `surrogate_id(value)` — the md5-portable 60-bit
hash (ml/neardup.portable_hash60). This preserves the reference's
get_or_create stability (insert_to_postgres.py:47-64: the same natural
key must always map to the same id) STRICTLY better than sequential
ids do — a hash id survives re-ingest, retries and partial loads,
where row_number ids depend on what else arrived. The previous
`row_number().over(Window.orderBy(...))` build was a partitionBy-less
window: every id funneled through ONE task — harmless for bounded
dims, a genuine scale-killer for the fact-cardinality offer id.
Collision risk at 60 bits is ~n²/2^61 (≈5e-8 at 10k dim values);
`assert_unique_surrogates` makes the check explicit, and dim_date uses
the naturally-dense days-since-epoch key instead of a hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from job_market_research_spark.functions.dates import calendar_attrs, calendar_range
from job_market_research_spark.ml.neardup import portable_hash60
from job_market_research_spark.operators.cleaning import filter_unknown_sentinel


def surrogate_id(value: Column) -> Column:
    """Deterministic 60-bit hash surrogate for a natural key — stable
    across loads (get_or_create semantics), computed map-side, and
    replayable by the DuckDB oracle
    (``('0x' || substr(md5(v), 1, 15))::BIGINT``)."""
    return portable_hash60(value.cast("string"))


def assert_unique_surrogates(star: dict[str, DataFrame]) -> None:
    """Collision check: every id column must be as distinct as its
    table's natural key. One tiny agg per table (dimension-sized for
    dims; for the fact it is the same count-distinct you would run as
    a load-audit anyway). Call from tests/load-validation, not the
    build hot path."""
    keys = {
        "fact_offre": ("id_offer", "job_url"),
        "offre_skill": (None, None),
    }
    for name, df in star.items():
        id_col = keys.get(name, (df.columns[0], None))[0]
        if id_col is None or not id_col.startswith("id"):
            continue
        row = df.agg(
            F.count_distinct(F.col(id_col)).alias("ids"),
            F.count("*").alias("rows"),
        ).first()
        assert row["ids"] == row["rows"], (
            f"{name}: surrogate collision ({row['ids']} ids for "
            f"{row['rows']} rows)"
        )


def _dim(df: DataFrame, expr, id_col: str, value_col: str) -> DataFrame:
    """distinct + hash surrogate key, skipping empty/'unknown'
    sentinels (reference: insert_to_postgres.py:67-83 skips those)."""
    vals = df.select(expr.alias(value_col)).filter(F.col(value_col).isNotNull())
    vals = filter_unknown_sentinel(vals, value_col).distinct()
    return vals.withColumn(id_col, surrogate_id(F.col(value_col))).select(
        id_col, value_col
    )


def build_star(offers: DataFrame) -> dict[str, DataFrame]:
    """Cleaned offers (ENRICHED_SCHEMA shape) → the schema.sql star.

    Returns {table_name: DataFrame}; persist with df.write per table
    (parquet staging or `write_jdbc_star` for a warehouse).
    """
    dims = {
        "dim_source": _dim(offers, F.col("source"), "id_source", "via"),
        "dim_contrat": _dim(offers, F.col("contrat"), "id_contrat", "contrat"),
        "dim_titre": _dim(offers, F.col("titre"), "id_titre", "titre"),
        "dim_niveau_etudes": _dim(
            offers, F.col("niveau_etudes"), "id_niveau_etudes", "niveau_etudes"
        ),
        "dim_niveau_experience": _dim(
            offers,
            F.col("niveau_experience"),
            "id_niveau_experience",
            "niveau_experience",
        ),
    }

    # dim_compagnie carries the company's (first) sector attribute
    # (schema.sql:37-41; first-sector rule insert_to_postgres.py:197-201).
    compagnie_vals = (
        offers.select(
            F.col("compagnie").alias("compagnie"),
            F.element_at(F.col("secteur"), 1).alias("secteur"),
        )
        .filter(F.col("compagnie").isNotNull())
        .groupBy("compagnie")
        .agg(F.min("secteur").alias("secteur"))
    )
    dims["dim_compagnie"] = compagnie_vals.withColumn(
        "id_compagnie", surrogate_id(F.col("compagnie"))
    ).select("id_compagnie", "compagnie", "secteur")

    # dim_skill from the exploded skills arrays (schema.sql:59-63).
    skill_vals = (
        offers.select(F.explode("skills").alias("s"))
        .select(F.col("s.nom").alias("nom"), F.col("s.type_skill").alias("type_skill"))
        .filter(F.col("nom").isNotNull() & F.col("type_skill").isin("hard", "soft"))
        .groupBy("nom")
        .agg(F.min("type_skill").alias("type_skill"))
    )
    dims["dim_skill"] = skill_vals.withColumn(
        "id_skill", surrogate_id(F.col("nom"))
    ).select("id_skill", "nom", "type_skill")

    # dim_date: densified calendar over the observed span + the
    # sentinel date row (insert_to_postgres.py:10,96-134).
    cal = calendar_range(
        offers.filter(F.col("date_publication").isNotNull()), "date_publication"
    )
    cal = cal.unionByName(
        offers.sparkSession.range(1).select(
            F.lit("2000-01-01").cast("date").alias("full_date")
        )
    ).distinct()
    # Days-since-epoch: naturally dense, deterministic, zero-shuffle —
    # the one dimension whose natural key already IS an integer.
    dim_date = calendar_attrs(cal, "full_date").withColumn(
        "id_date",
        F.datediff(F.col("full_date"), F.lit("1970-01-01").cast("date")).cast("long"),
    )
    dims["dim_date"] = dim_date.select(
        "id_date",
        "full_date",
        "jour",
        "mois",
        "trimestre",
        "annee",
        "jour_semaine",
        "month_name",
        "year_month",
        "week_of_year",
        "date_str",
    )

    # fact_offre: broadcast-join every surrogate key onto the offers.
    # INNER-equivalent via required fields; id_niveau_experience stays
    # nullable (LEFT; schema.sql:76). The offer id is a map-side hash
    # of the natural key (job_url) — the previous global row_number
    # here was a single-reducer sort at FACT cardinality, the worst
    # plan in the repo at 100 TB.
    fact = offers.withColumn("id_offer", surrogate_id(F.col("job_url")))

    def attach(fact_df, dim_df, fact_col, dim_val, dim_id):
        return fact_df.join(
            F.broadcast(dim_df.select(dim_id, F.col(dim_val).alias(fact_col))),
            on=fact_col,
            how="left",
        )

    fact = fact.join(
        F.broadcast(
            dims["dim_date"].select("id_date", F.col("full_date").alias("date_publication"))
        ),
        on="date_publication",
        how="left",
    )
    fact = attach(fact, dims["dim_source"], "source", "via", "id_source")
    fact = attach(fact, dims["dim_contrat"], "contrat", "contrat", "id_contrat")
    fact = attach(fact, dims["dim_titre"], "titre", "titre", "id_titre")
    fact = fact.join(
        F.broadcast(dims["dim_compagnie"].select("id_compagnie", "compagnie")),
        on="compagnie",
        how="left",
    )
    fact = attach(
        fact, dims["dim_niveau_etudes"], "niveau_etudes", "niveau_etudes",
        "id_niveau_etudes",
    )
    fact = attach(
        fact,
        dims["dim_niveau_experience"],
        "niveau_experience",
        "niveau_experience",
        "id_niveau_experience",
    )

    fact_offre = fact.select(
        "id_offer",
        "job_url",
        "id_date",
        "id_source",
        "id_contrat",
        "id_titre",
        "id_compagnie",
        "id_niveau_etudes",
        "id_niveau_experience",
        "description",
        F.array_join(
            F.transform("skills", lambda s: s.getField("nom")), ", "
        ).alias("competences"),
        F.array_join("secteur", ", ").alias("secteur"),
    )

    # offre_skill bridge: explode + broadcast dim join + composite-key
    # distinct (ON CONFLICT DO NOTHING; schema.sql:84-88).
    bridge = (
        fact.select("id_offer", F.explode("skills").alias("s"))
        .select("id_offer", F.col("s.nom").alias("nom"))
        .join(F.broadcast(dims["dim_skill"].select("id_skill", "nom")), on="nom")
        .select("id_offer", "id_skill")
        .distinct()
    )

    return {**dims, "fact_offre": fact_offre, "offre_skill": bridge}
