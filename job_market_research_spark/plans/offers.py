"""The job-offer cleaning pipeline — the engine's domain core.

Re-implements the reference's Spark stage `clean_data`
(spark_pipeline/transform_job.py:181-233) end to end, with both of its
Python row UDFs replaced by native expressions:

  required-field filter → natural-key dedup → renames → csv splits →
  trims → multi-format date normalization (was normalize_date_udf,
  transform_job.py:120-142,178) → skills flatten (was
  flatten_skills_udf, transform_job.py:145-176) → fillna sentinel

plus the cross-source key coalescing the reference does downstream in
Python (insert_to_postgres.py:172-201): companie/compagnie,
secteur/domaine, region/ville.

The whole pipeline is one narrow chain of column expressions over a
single scan with exactly one shuffle (the dedup) — at 100 TB it
parallelizes trivially and whole-stage codegen covers everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.functions.dates import (
    parse_multiformat_date,
)
from job_market_research_spark.operators.cleaning import (
    fillna_unspecified,
    filter_required_fields,
    split_csv,
    trim_cast,
)
from job_market_research_spark.operators.dedup import dedup_keep_min
from job_market_research_spark.operators.nested import flatten_skills

REQUIRED_FIELDS = ("job_url", "titre", "via", "publication_date")

#: The reference additionally accepts '%d %b-%H:%M' / '%d %B-%H:%M'
#: (MarocAnnonces '1 May-12:53') with the implicit year backfilled to
#: the current year (transform_job.py:134-137).
MONTHNAME_FORMATS = ("d MMM-HH:mm", "d MMMM-HH:mm")


def normalize_publication_date(col=None) -> F.Column:
    """Full multi-format date normalization, including the year-less
    month-name formats with current-year backfill. Emits `DateType`
    (the reference kept 'YYYY-MM-DD' strings; typed dates subsume that
    — format back with date_format where strings are required)."""
    if col is None:
        col = F.col("publication_date")
    base = parse_multiformat_date(col)
    monthname = F.coalesce(
        *[F.try_to_date(F.trim(col), f) for f in MONTHNAME_FORMATS]
    )
    # try_to_date on a year-less pattern lands in year 1900 (Spark's
    # missing-field default era differs from Python's strptime but the
    # backfill rule is the same: replace with the current year).
    backfilled = F.when(
        monthname.isNotNull(),
        F.make_date(
            F.year(F.current_date()), F.month(monthname), F.dayofmonth(monthname)
        ),
    )
    return F.coalesce(base, backfilled)


def clean_offers(df: DataFrame) -> DataFrame:
    """`clean_data` re-expressed (reference: transform_job.py:181-233).

    Input: SPARK_INPUT_SCHEMA-shaped frame (NER-stage output).
    Output: ENRICHED_SCHEMA-shaped frame.
    """
    df = filter_required_fields(df, REQUIRED_FIELDS)
    # Deterministic survivor (reference dropDuplicates keeps an
    # arbitrary row; keep-min on the natural key is reproducible).
    df = dedup_keep_min(df, ["job_url"], "job_url")

    df = df.select(
        "job_url",
        normalize_publication_date().alias("date_publication"),
        F.col("via").alias("source"),
        trim_cast("contrat").alias("contrat"),
        F.trim("titre").alias("titre"),
        F.col("description"),
        F.coalesce(F.col("companie")).alias("compagnie"),
        split_csv("secteur").alias("secteur"),
        trim_cast("niveau_etudes").alias("niveau_etudes"),
        trim_cast("niveau_experience").alias("niveau_experience"),
        flatten_skills(
            F.col("skills.hard_skills"), F.col("skills.soft_skills")
        ).alias("skills"),
    )
    return fillna_unspecified(df)


def coalesce_source_variants(df: DataFrame) -> DataFrame:
    """Unify the per-source key variants of OFFER_SCHEMA into the
    cleaning-stage columns (reference: insert_to_postgres.py:172-201,
    utils__init__.py:211-226 dict fallbacks)."""
    cols = set(df.columns)

    def pick(*names: str):
        present = [F.col(n) for n in names if n in cols]
        return F.coalesce(*present) if present else F.lit(None).cast("string")

    return df.select(
        "job_url",
        "titre",
        pick("companie", "company_name", "compagnie").alias("companie"),
        pick("description", "intro").alias("description"),
        pick("secteur", "domaine", "sector").alias("secteur"),
        pick("region", "ville", "country").alias("region"),
        pick("competences").alias("competences"),
        "niveau_etudes",
        "niveau_experience",
        "contrat",
        "via",
        "publication_date",
    )
