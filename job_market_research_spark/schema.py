"""Canonical job-offer schemas (SURVEY §1, FIXTURES.md §A).

One wide `OFFER_SCHEMA` unions every per-source record variant
(reference: data_extraction/Websites/Job_schema.json:1-23 plus the
Bayt/MarocAnnonces extras) so multi-source ingest is a single schema'd
read with nulls for absent fields — no dynamic dict fallbacks.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Union of all scraped-source variants (reference: Job_schema.json;
#: emploi.py:236-248; Rekrute.py:131-143; bayt.py:243-251;
#: MarocAnn.py:72-129). Required-at-ingest: job_url, titre, via,
#: publication_date (Job_schema.json:22).
OFFER_SCHEMA = T.StructType(
    [
        T.StructField("job_url", T.StringType()),
        T.StructField("titre", T.StringType()),
        T.StructField("companie", T.StringType()),  # reference spelling
        T.StructField("description", T.StringType()),
        T.StructField("intro", T.StringType()),  # Bayt segmentation extra
        T.StructField("competences", T.StringType()),
        T.StructField("niveau_etudes", T.StringType()),
        T.StructField("niveau_experience", T.StringType()),
        T.StructField("contrat", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("ville", T.StringType()),  # MarocAnnonces extra
        T.StructField("secteur", T.StringType()),
        T.StructField("domaine", T.StringType()),  # MarocAnnonces secteur variant
        T.StructField("fonction", T.StringType()),
        T.StructField("salaire", T.StringType()),  # int-or-string in source; string here
        T.StructField("extra", T.StringType()),
        T.StructField("via", T.StringType()),
        T.StructField("publication_date", T.StringType()),
    ]
)

#: Spark cleaning-stage input (reference: transform_job.py:15-38
#: `global_schema` — the one explicit schema in the reference).
SPARK_INPUT_SCHEMA = T.StructType(
    [
        T.StructField("job_url", T.StringType()),
        T.StructField("publication_date", T.StringType()),
        T.StructField("via", T.StringType()),
        T.StructField("contrat", T.StringType()),
        T.StructField("titre", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("companie", T.StringType()),
        T.StructField("secteur", T.StringType()),
        T.StructField("niveau_etudes", T.StringType()),
        T.StructField("niveau_experience", T.StringType()),
        T.StructField(
            "skills",
            T.StructType(
                [
                    T.StructField("hard_skills", T.ArrayType(T.StringType())),
                    T.StructField("soft_skills", T.ArrayType(T.StringType())),
                ]
            ),
        ),
    ]
)

#: Cleaned/enriched output record (reference: init_groq.py:29-48
#: contract; output/exemple.json golden shape).
ENRICHED_SCHEMA = T.StructType(
    [
        T.StructField("job_url", T.StringType()),
        T.StructField("date_publication", T.DateType()),
        T.StructField("source", T.StringType()),
        T.StructField("contrat", T.StringType()),
        T.StructField("titre", T.StringType()),
        T.StructField("compagnie", T.StringType()),
        T.StructField("secteur", T.ArrayType(T.StringType())),
        T.StructField("niveau_etudes", T.StringType()),
        T.StructField("niveau_experience", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField(
            "skills",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("nom", T.StringType()),
                        T.StructField("type_skill", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)
