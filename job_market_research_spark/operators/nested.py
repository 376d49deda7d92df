"""Nested-data operators: arrays / structs / explode (SURVEY §2.9).

The reference's second Python UDF flattens the skills struct
(transform_job.py:145-176); its bridge-table population explodes
per-offer skill lists in a driver loop (insert_to_postgres.py:232-254).
Both are native here: `transform`+`concat` build the flat
array<struct>, `explode` generates the bridge rows on executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


def flatten_skills(hard: Column, soft: Column) -> Column:
    """struct<hard:array,soft:array> → array<struct<nom,type_skill>>
    with nulls dropped (native rewrite of flatten_skills_udf,
    transform_job.py:145-176)."""
    tag = lambda arr, label: F.transform(  # noqa: E731
        arr, lambda x: F.struct(x.alias("nom"), F.lit(label).alias("type_skill"))
    )
    combined = F.concat(
        tag(F.coalesce(hard, F.array()), "hard"),
        tag(F.coalesce(soft, F.array()), "soft"),
    )
    return F.filter(combined, lambda s: s.getField("nom").isNotNull())


@query(
    "nested_flatten_skills",
    oracle="""
    SELECT p_partkey, p_brand AS nom, 'hard' AS type_skill FROM part
    UNION ALL
    SELECT p_partkey, p_type AS nom, 'soft' AS type_skill FROM part
    ORDER BY p_partkey, type_skill, nom
    """,
)
def q_nested_flatten_skills(spark, sf_dir: str) -> DataFrame:
    """Build the tagged skills array from two per-row arrays, then
    explode to verifiable rows. p_brand plays hard_skills, p_type
    soft_skills."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.array("p_brand").alias("hard"),
        F.array("p_type").alias("soft"),
    )
    flat = part.select(
        "p_partkey",
        F.explode(flatten_skills(F.col("hard"), F.col("soft"))).alias("skill"),
    )
    return flat.select(
        "p_partkey",
        F.col("skill.nom").alias("nom"),
        F.col("skill.type_skill").alias("type_skill"),
    ).orderBy("p_partkey", "type_skill", "nom")


@query(
    "nested_explode_skills",
    oracle="""
    SELECT doc_id, t.token
    FROM documents, unnest(string_split(text, ' ')) AS t(token)
    WHERE t.token <> ''
    ORDER BY doc_id, token
    """,
)
def q_nested_explode_skills(spark, sf_dir: str) -> DataFrame:
    """One row per (record, array element) — the bridge-table
    generator (reference: insert_to_postgres.py:232-254). Explode runs
    on executors; output partitioning follows the input."""
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("token"),
        )
        .orderBy("doc_id", "token")
    )


@query(
    "nested_first_element",
    oracle="""
    SELECT doc_id, string_split(text, ' ')[1] AS first_sector
    FROM documents ORDER BY doc_id
    """,
)
def q_nested_first_element(spark, sf_dir: str) -> DataFrame:
    """First array element only (reference: insert_to_postgres.py:
    197-201 keeps sector_list[0] for the dimension)."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.element_at(F.split("text", " "), 1).alias("first_sector"))
        .orderBy("doc_id")
    )


@query(
    "nested_struct_access",
    oracle="""
    SELECT event_id, event_type AS etype, user_id AS uid
    FROM events ORDER BY event_id
    """,
)
def q_nested_struct_access(spark, sf_dir: str) -> DataFrame:
    """Nested field access (reference: location.city / location.country,
    insert_to_postgres.py:186-195): pack columns into a struct, read
    them back via dotted paths. Catalyst prunes the struct away."""
    packed = load(spark, sf_dir, "events").select(
        "event_id",
        F.struct(
            F.col("event_type").alias("type"), F.col("user_id").alias("uid")
        ).alias("location"),
    )
    return packed.select(
        "event_id",
        F.col("location.type").alias("etype"),
        F.col("location.uid").alias("uid"),
    ).orderBy("event_id")


@query(
    "nested_collect_skills",
    oracle="""
    SELECT l_orderkey AS id_offer,
           string_agg(DISTINCT CAST(l_partkey AS VARCHAR), ','
                      ORDER BY CAST(l_partkey AS VARCHAR)) AS skills_csv
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def q_nested_collect_skills(spark, sf_dir: str) -> DataFrame:
    """Inverse of explode: group bridge rows back into a per-record
    sorted list (reference round-trip exemple.json ↔ schema.sql).
    Emitted as a joined string so the hash is array-encoding-agnostic."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("id_offer"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_set(F.col("l_partkey").cast("string"))), ","
            ).alias("skills_csv")
        )
        .orderBy("id_offer")
    )
