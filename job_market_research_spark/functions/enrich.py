"""LLM enrichment operator (SURVEY §2.10 `text_llm_enrich`).

The reference enriches each offer with a per-record Groq call —
1 offer/call, 1 s pause, 3 retries + exponential backoff, deterministic
rule fallback on failure (enrechissement_process/init_groq.py:103-264,
pipline.py:112-149). That throughput ceiling (~0.2 offers/s) is the
design to beat: here enrichment is an Arrow-batched `mapInPandas`
stage, so concurrency = partitions × batch, rate limiting is partition
count, and the external client is injectable.

The default client is the reference's own deterministic rule fallback
(init_groq.py:164-228) expressed in pandas — making the operator fully
testable offline. A real LLM client plugs in with `enrich_offers(df,
client=...)`; the plan shape does not change.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

ENRICH_OUTPUT_SCHEMA = (
    "job_url string, titre string, titre_homogene string, secteur_infere string, "
    "niveau_qualification int, enrich_source string"
)

#: Ordered keyword → label rules (reference: init_groq.py:164-228's
#: rule-based fallback classification).
SECTOR_RULES: list[tuple[str, str]] = [
    ("data", "Data & AI"),
    ("engineer", "Engineering"),
    ("market", "Marketing"),
    ("finance", "Finance"),
    ("developer", "IT"),
]

TITLE_NORMALIZATIONS: list[tuple[str, str]] = [
    (r"\bsr\.?\b|\bsenior\b", "senior"),
    (r"\bjr\.?\b|\bjunior\b", "junior"),
    (r"\s+", " "),
]


def rule_based_enrich(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic enrichment: normalized title, keyword-inferred
    sector, 1-5 qualification from seniority keywords."""
    titles = pdf["titre"].fillna("").str.lower().str.strip()
    homog = titles
    for pat, repl in TITLE_NORMALIZATIONS:
        homog = homog.str.replace(pat, repl, regex=True)

    def sector_of(t: str) -> str:
        for kw, label in SECTOR_RULES:
            if kw in t:
                return label
        return "Autre"

    def qual_of(t: str) -> int:
        if "senior" in t or "lead" in t:
            return 4
        if "junior" in t or "stagiaire" in t:
            return 2
        return 3

    return pd.DataFrame(
        {
            "job_url": pdf["job_url"],
            "titre": pdf["titre"],
            "titre_homogene": homog,
            "secteur_infere": titles.map(sector_of),
            "niveau_qualification": titles.map(qual_of).astype("int32"),
            "enrich_source": "rule_fallback",
        }
    )


def enrich_offers(
    df: DataFrame,
    client: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Batch enrichment as mapInPandas. `client` maps a pandas batch of
    offers to the enriched batch; defaults to the rule fallback. The
    join back to the input is KEYED on job_url, not positional —
    SURVEY §7 hard-point (d): the reference zips LLM output back by
    list position (pipline.py:184-187), which breaks on partial
    batches; a keyed merge cannot."""
    fn = client or rule_based_enrich

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            missing = set(
                c.split(" ")[0] for c in ENRICH_OUTPUT_SCHEMA.split(", ")
            ) - set(out.columns)
            if missing:  # fall back per batch, like the reference's retry tail
                out = rule_based_enrich(pdf)
            yield out

    src = df.select("job_url", "titre")
    if batch_partitions:
        src = src.repartition(batch_partitions)
    return src.mapInPandas(run, schema=ENRICH_OUTPUT_SCHEMA)
