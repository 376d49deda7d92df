"""Retry/backoff endpoint wrapper for LLM enrichment.

Re-expresses the reference's per-call resilience
(enrechissement_process/pipline.py:112-149: pause between calls,
3 retries + exponential backoff, rule fallback on exhaustion) as an
executor-side batch client, and proves the distributed mapInPandas
path end-to-end with a fake endpoint.
"""

from __future__ import annotations

import pandas as pd
import pytest

from job_market_research_spark.functions.enrich import (
    endpoint_client,
    enrich_offers,
    rule_based_enrich,
)


def _batch(urls_titles):
    return pd.DataFrame(
        {"job_url": [u for u, _ in urls_titles], "titre": [t for _, t in urls_titles]}
    )


def test_retry_then_success_with_exponential_backoff():
    calls, sleeps = [], []
    fails = {"u1": 2}  # fail twice, succeed on 3rd attempt

    def flaky(rec):
        calls.append(rec["job_url"])
        if fails.get(rec["job_url"], 0) > 0:
            fails[rec["job_url"]] -= 1
            raise ConnectionError("transient")
        return {"secteur_infere": "FromEndpoint", "niveau_qualification": 5}

    client = endpoint_client(
        flaky, retries=3, backoff_s=1.0, backoff_mult=2.0, sleep=sleeps.append
    )
    out = client(_batch([("u1", "Senior Data Engineer")]))
    assert out.loc[0, "enrich_source"] == "endpoint"
    assert out.loc[0, "secteur_infere"] == "FromEndpoint"
    assert out.loc[0, "niveau_qualification"] == 5
    # titre_homogene came from the rule fallback (partial response)
    assert out.loc[0, "titre_homogene"] == "senior data engineer"
    assert calls == ["u1"] * 3
    assert sleeps == [1.0, 2.0]  # exponential, stops once it succeeds


def test_exhausted_retries_degrade_per_record():
    def hard_fail(rec):
        if rec["job_url"] == "bad":
            raise TimeoutError("down")
        return {"secteur_infere": "FromEndpoint"}

    client = endpoint_client(hard_fail, retries=2, sleep=lambda s: None)
    out = client(_batch([("ok", "Junior Developer"), ("bad", "Data Analyst")]))
    by_url = out.set_index("job_url")
    assert by_url.loc["ok", "enrich_source"] == "endpoint"
    assert by_url.loc["bad", "enrich_source"] == "rule_fallback"
    # the degraded record equals the pure rule output
    fb = rule_based_enrich(_batch([("bad", "Data Analyst")]))
    assert by_url.loc["bad", "secteur_infere"] == fb.loc[0, "secteur_infere"]
    assert by_url.loc["bad", "niveau_qualification"] == fb.loc[0, "niveau_qualification"]


def test_pause_rate_limits_between_calls():
    sleeps = []
    client = endpoint_client(
        lambda rec: {"niveau_qualification": 1},
        pause_s=0.5,
        sleep=sleeps.append,
    )
    client(_batch([("a", "x"), ("b", "y"), ("c", "z")]))
    assert sleeps == [0.5, 0.5]  # between calls, not before the first


def test_non_dict_response_counts_as_failure():
    client = endpoint_client(lambda rec: "not json", retries=1, sleep=lambda s: None)
    out = client(_batch([("u", "Finance Manager")]))
    assert out.loc[0, "enrich_source"] == "rule_fallback"


def _spark_fake_endpoint(rec: dict) -> dict:
    # module-level so the mapInPandas closure pickles
    if int(rec["job_url"]) % 2 == 0:
        raise ValueError("down for even urls")
    return {"secteur_infere": "FromEndpoint", "niveau_qualification": 5}


def test_enrich_offers_distributed_with_endpoint(spark):
    df = spark.range(10).selectExpr(
        "CAST(id AS STRING) AS job_url", "concat('Senior Analyst ', id) AS titre"
    )
    client = endpoint_client(_spark_fake_endpoint, retries=1, sleep=lambda s: None)
    out = enrich_offers(df, client=client, batch_partitions=3)
    rows = {r.job_url: r for r in out.collect()}
    assert len(rows) == 10
    for url, r in rows.items():
        if int(url) % 2 == 0:
            assert r.enrich_source == "rule_fallback"
            assert r.niveau_qualification == 4  # 'senior' rule
        else:
            assert r.enrich_source == "endpoint"
            assert r.niveau_qualification == 5


def test_malformed_field_degrades_only_that_record():
    """A response that IS a dict but whose field cannot be coerced
    (e.g. niveau_qualification='senior' from an LLM) must degrade that
    one record to the rule row — not raise int() out of the batch and
    fail the whole mapInPandas task."""

    def endpoint(rec):
        if rec["job_url"] == "bad":
            return {"niveau_qualification": "senior"}  # un-int-able
        return {"secteur_infere": "FromEndpoint"}

    client = endpoint_client(endpoint, retries=0, backoff_s=0.0, sleep=lambda s: None)
    out = client(_batch([("bad", "Lead Dev"), ("ok", "Junior Analyst")]))
    by_url = out.set_index("job_url")
    assert by_url.loc["bad", "enrich_source"] == "rule_fallback"
    assert by_url.loc["ok", "enrich_source"] == "endpoint"
    # the degraded record still carries the full rule enrichment
    assert by_url.loc["bad", "niveau_qualification"] == 4  # 'lead' → 4
