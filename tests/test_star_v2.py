"""Second-star (insert_to_postgres variant) + harmonization tests.

Covers the v2-specific semantics the schema.sql star does NOT have
(reference: insert_to_postgres.py): lowercased dim values, ''/'unknown'
→ NULL foreign key, the 2000-01-01 date fallback, the composite
(city, country) location key, the first-sector FK on the fact — and
the harmonize_dims crosswalk reconciling the two stars.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from job_market_research_spark.plans.star_v2 import (
    DEFAULT_DATE,
    build_star_v2,
    harmonize_dims,
)


@pytest.fixture(scope="module")
def offers_v2(spark):
    rows = [
        # full row, mixed case values that must lowercase in the dims
        dict(
            job_url="u1",
            titre="Data Engineer",
            source="Rekrute",
            date_publication=datetime.date(2025, 3, 10),
            contrat="CDI",
            compagnie="Acme",
            ville="Casablanca",
            country="Morocco",
            secteur=["IT", "Data"],
            skills=[("Python", "hard"), ("Teamwork", "soft")],
        ),
        # 'unknown' contract → NULL FK; no location at all
        dict(
            job_url="u2",
            titre="Analyst",
            source="Bayt",
            date_publication=datetime.date(2025, 3, 12),
            contrat="unknown",
            compagnie="ACME",  # same company, different case → same id
            ville=None,
            country=None,
            secteur=[],
            skills=[("python", "hard")],
        ),
        # unparseable date → DEFAULT_DATE fallback; country-only location
        dict(
            job_url="u3",
            titre="Dev",
            source="Maroc_annonces",
            date_publication=None,
            contrat="CDD",
            compagnie=None,
            ville=None,
            country="Morocco",
            secteur=["Telecom"],
            skills=[],
        ),
    ]
    schema = (
        "job_url string, titre string, source string, date_publication date,"
        " contrat string, compagnie string, ville string, country string,"
        " secteur array<string>,"
        " skills array<struct<nom:string,type_skill:string>>"
    )
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows], schema
    )
    return df


@pytest.fixture(scope="module")
def star2(offers_v2):
    s = build_star_v2(offers_v2)
    for df in s.values():
        df.cache().count()
    return s


def test_v2_dims_lowercase_and_dedupe(star2):
    contracts = {r.contract_type for r in star2["dim_contract"].collect()}
    assert contracts == {"cdi", "cdd"}  # 'unknown' excluded, lowercased
    companies = star2["dim_company"].collect()
    assert [r.company_name for r in companies] == ["acme"]  # case-merged


def test_v2_sentinel_null_fk(star2):
    fact = {r.job_url: r for r in star2["fact_offer"].collect()}
    assert fact["u2"].contract_id is None  # 'unknown' → NULL FK
    assert fact["u1"].contract_id is not None
    assert fact["u3"].company_id is None  # missing company


def test_v2_date_fallback(star2):
    fact = {r.job_url: r for r in star2["fact_offer"].collect()}
    assert fact["u3"].date_id == datetime.date(2000, 1, 1)
    assert fact["u1"].date_id == datetime.date(2025, 3, 10)
    cal_dates = {r.date_id for r in star2["dim_calendar"].collect()}
    assert datetime.date(*map(int, DEFAULT_DATE.split("-"))) in cal_dates


def test_v2_location_composite_key(star2):
    locs = {(r.city, r.country): r.location_id for r in star2["dim_location"].collect()}
    assert set(locs) == {("casablanca", "morocco"), (None, "morocco")}
    fact = {r.job_url: r for r in star2["fact_offer"].collect()}
    assert fact["u2"].location_id is None  # fully-missing location
    # country-only location keys NULL-SAFELY to its dim row (the
    # reference mints a duplicate dim row here instead)
    assert fact["u3"].location_id == locs[(None, "morocco")]
    assert fact["u1"].location_id == locs[("casablanca", "morocco")]


def test_v2_sector_on_fact(star2):
    # v2 keys the FIRST sector on the fact (v1 carries it on the dim)
    fact = {r.job_url: r for r in star2["fact_offer"].collect()}
    sectors = {r.sector_id: r.sector for r in star2["dim_sector"].collect()}
    assert sectors[fact["u1"].sector_id] == "it"
    assert fact["u2"].sector_id is None  # empty sector list


def test_v2_skill_bridge(star2):
    sk = {(r.skill, r.skill_type) for r in star2["dim_skill"].collect()}
    assert sk == {("python", "hard"), ("teamwork", "soft")}
    # u1's Python and u2's python converge on one skill_id
    bridge = star2["fact_offer_skill"]
    py_id = star2["dim_skill"].filter(F.col("skill") == "python").first().skill_id
    assert bridge.filter(F.col("skill_id") == py_id).count() == 2


def test_harmonize_dims_crosswalk(spark):
    v1 = spark.createDataFrame(
        [(1, "CDI"), (2, "CDD"), (3, "Stage")], "id1 long, contrat string"
    )
    v2 = spark.createDataFrame(
        [(10, "cdi"), (11, "cdd"), (12, "freelance")],
        "id2 long, contract_type string",
    )
    out = harmonize_dims(v1, "id1", "contrat", v2, "id2", "contract_type").collect()
    by_val = {r.conformed_value: r for r in out}
    assert by_val["cdi"].presence == "both"
    assert by_val["cdi"].v1_id == 1 and by_val["cdi"].v2_id == 10
    assert by_val["stage"].presence == "v1_only" and by_val["stage"].v2_id is None
    assert by_val["freelance"].presence == "v2_only"
    ids = [r.conformed_id for r in out]
    assert len(set(ids)) == len(out) and all(i is not None for i in ids)
    # deterministic: conformed_id is a pure function of the value
    out2 = harmonize_dims(v1, "id1", "contrat", v2, "id2", "contract_type").collect()
    assert {r.conformed_value: r.conformed_id for r in out2} == {
        r.conformed_value: r.conformed_id for r in out
    }
