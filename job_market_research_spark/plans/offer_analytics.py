"""The dashboard query surface over the job-offer star (SURVEY §3.3).

Every Superset chart/dataset query from the reference's dashboard
export (superset/dashboard_export_20250807T121001.zip), re-expressed as
a function over the star tables `build_star` produces. These run as
`spark.sql`-equivalent DataFrame plans; the testdata-analog versions of
the same shapes (plans/analytics.py) carry the DuckDB oracles — these
carry the real schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def join1_wide_view(star: dict[str, DataFrame]) -> DataFrame:
    """The flat analytical view `join1` (zip:datasets/PostgreSQL/
    join1.yaml:9): fact ⋈ 6 dims INNER + dim_niveau_experience LEFT,
    with derived lengths and the experience flag."""
    f = star["fact_offre"]
    out = (
        f.join(F.broadcast(star["dim_date"]), "id_date")
        .join(F.broadcast(star["dim_source"]), "id_source")
        .join(F.broadcast(star["dim_contrat"]), "id_contrat")
        .join(F.broadcast(star["dim_titre"]), "id_titre")
        .join(F.broadcast(star["dim_compagnie"].withColumnRenamed("secteur", "secteur_compagnie")), "id_compagnie")
        .join(F.broadcast(star["dim_niveau_etudes"]), "id_niveau_etudes")
        .join(F.broadcast(star["dim_niveau_experience"]), "id_niveau_experience", "left")
    )
    return out.select(
        "id_offer",
        "job_url",
        "full_date",
        "via",
        "contrat",
        "titre",
        "compagnie",
        "secteur",
        "niveau_etudes",
        "niveau_experience",
        F.length("description").alias("description_length"),
        F.length("competences").alias("competences_length"),
        F.when(F.col("id_niveau_experience").isNotNull(), 1)
        .otherwise(0)
        .alias("avec_experience_requise"),
    )


def total_offers_kpi(star: dict[str, DataFrame]) -> DataFrame:
    """COUNT_DISTINCT(id_offer) big number (Nombre_total_doffres)."""
    return star["fact_offre"].agg(F.countDistinct("id_offer").alias("n_offres"))


def repartition_par_secteur(star: dict[str, DataFrame], min_count: int = 5) -> DataFrame:
    """Offers per sector with the >= min_count adhoc filter
    (Repartition_par_secteur_6; metrics.yaml)."""
    f = star["fact_offre"]
    return (
        f.join(F.broadcast(star["dim_compagnie"]), "id_compagnie")
        .groupBy("secteur")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "secteur")
    )


def croissance_mensuelle(star: dict[str, DataFrame]) -> DataFrame:
    """Monthly offer growth (Croissance_Mensuelle_7, P1M grain)."""
    f = star["fact_offre"]
    return (
        f.join(F.broadcast(star["dim_date"]), "id_date")
        .groupBy(F.date_trunc("month", "full_date").cast("date").alias("month"))
        .agg(F.count("*").alias("nb_offres"))
        .orderBy("month")
    )


def top_skills(star: dict[str, DataFrame], type_skill: str = "hard", k: int = 20) -> DataFrame:
    """Top-k skills of a type (KPI-Top_20_skills_techniques_hard)."""
    return (
        star["offre_skill"]
        .join(F.broadcast(star["dim_skill"]), "id_skill")
        .filter(F.col("type_skill") == type_skill)
        .groupBy("nom")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), "nom")
        .limit(k)
    )


def categories_competences(star: dict[str, DataFrame]) -> DataFrame:
    """type_skill → skill sunburst counts (KPI-Categories_de_competences)."""
    return (
        star["offre_skill"]
        .join(F.broadcast(star["dim_skill"]), "id_skill")
        .groupBy("type_skill", "nom")
        .agg(F.count("*").alias("n"))
        .orderBy("type_skill", "nom")
    )


def competences_profils(star: dict[str, DataFrame]) -> DataFrame:
    """skill × title heatmap (KPI-Competences_Profils)."""
    return (
        star["offre_skill"]
        .join(F.broadcast(star["dim_skill"]), "id_skill")
        .join(star["fact_offre"].select("id_offer", "id_titre"), "id_offer")
        .join(F.broadcast(star["dim_titre"]), "id_titre")
        .groupBy("nom", "titre")
        .agg(F.count("*").alias("n"))
        .orderBy("nom", "titre")
    )


def competences_experience(star: dict[str, DataFrame]) -> DataFrame:
    """skill × experience sankey (KPI-Competences_Niveau_dexperience)."""
    return (
        star["offre_skill"]
        .join(F.broadcast(star["dim_skill"]), "id_skill")
        .join(
            star["fact_offre"].select("id_offer", "id_niveau_experience"), "id_offer"
        )
        .join(F.broadcast(star["dim_niveau_experience"]), "id_niveau_experience")
        .groupBy(F.col("nom").alias("source"), F.col("niveau_experience").alias("target"))
        .agg(F.count("*").alias("value"))
        .orderBy("source", "target")
    )


def sources_de_recrutement(star: dict[str, DataFrame]) -> DataFrame:
    """Offers per source site (Sources_de_recrutement_9)."""
    return (
        star["fact_offre"]
        .join(F.broadcast(star["dim_source"]), "id_source")
        .groupBy("via")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "via")
    )


def repartition_par_contrat(star: dict[str, DataFrame]) -> DataFrame:
    """Offers per contract type (Repartition_par_type_de_contrat_11)."""
    return (
        star["fact_offre"]
        .join(F.broadcast(star["dim_contrat"]), "id_contrat")
        .groupBy("contrat")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "contrat")
    )


def top_companies(star: dict[str, DataFrame], k: int = 20) -> DataFrame:
    """Top-k recruiting companies (Top_20_des_entreprises_8)."""
    return (
        star["fact_offre"]
        .join(F.broadcast(star["dim_compagnie"]), "id_compagnie")
        .groupBy("compagnie")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "compagnie")
        .limit(k)
    )


def repartition_par_experience(star: dict[str, DataFrame]) -> DataFrame:
    """Offers per experience level (Repartition_par_niveau_dexperience_10)."""
    return (
        star["fact_offre"]
        .join(F.broadcast(star["dim_niveau_experience"]), "id_niveau_experience")
        .groupBy("niveau_experience")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "niveau_experience")
    )
