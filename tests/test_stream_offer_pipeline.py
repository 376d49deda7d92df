"""End-to-end streaming offer pipeline (SURVEY §2.11 + §3.1).

The reference's Celery chain (scrape → upload → clean → load) as one
Structured Streaming pipeline: raw offer JSON files arrive in a stage
directory, each micro-batch is cleaned with the SAME `clean_offers`
plan the batch path uses, idempotently appended to the warehouse
(anti-join on job_url — the reference's SELECT-before-INSERT), and the
star schema is built from the drained warehouse. Overlapping arrival
batches prove the new-URL gate; re-running the whole stream proves
idempotence.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from job_market_research_spark.plans.offers import clean_offers
from job_market_research_spark.plans.star import build_star
from job_market_research_spark.schema import SPARK_INPUT_SCHEMA
from job_market_research_spark.sources.readers import scratch_dir


def _offer(job_url, date="2025-03-10", **kw):
    base = {
        "job_url": job_url,
        "publication_date": date,
        "via": "Rekrute",
        "contrat": "CDI",
        "titre": "Data Engineer",
        "description": "desc",
        "companie": "Acme",
        "secteur": "IT, Data",
        "niveau_etudes": "Master",
        "niveau_experience": "junior",
        "skills": {"hard_skills": ["python", "spark"], "soft_skills": ["teamwork"]},
    }
    base.update(kw)
    return base


@pytest.fixture(scope="module")
def pipeline_dirs(spark):
    root = scratch_dir("stream_offer_pipeline")
    src = os.path.join(root, "arrivals")
    target = os.path.join(root, "warehouse")
    os.makedirs(src, exist_ok=True)
    # Batch 1: u1..u3. Batch 2: u3 again (duplicate across batches,
    # different title — must NOT replace), u4, u5, plus an invalid row.
    batches = [
        [_offer("u1"), _offer("u2", date="15/04/2025"), _offer("u3")],
        [
            _offer("u3", titre="DUPLICATE ARRIVED LATE"),
            _offer("u4", date="1 May-12:53", via="Maroc_annonces"),
            _offer("u5", companie="Beta"),
            _offer("u6", titre=None),  # missing required field → dropped
        ],
    ]
    for i, batch in enumerate(batches):
        with open(os.path.join(src, f"batch_{i}.json"), "w") as f:
            f.write("\n".join(json.dumps(o) for o in batch))
    return src, target


def _run_pipeline(spark, src, target):
    empty = spark.createDataFrame([], SPARK_INPUT_SCHEMA)
    clean_offers(empty).limit(0).write.mode("overwrite").parquet(target)

    def load_batch(batch_df, epoch_id):
        cleaned = clean_offers(batch_df)
        existing = batch_df.sparkSession.read.parquet(target)
        fresh = cleaned.join(
            existing.select("job_url"), "job_url", "left_anti"
        )
        fresh.write.mode("append").parquet(target)

    stream = (
        spark.readStream.schema(SPARK_INPUT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = stream.writeStream.foreachBatch(load_batch).trigger(availableNow=True).start()
    q.awaitTermination()


def test_streaming_pipeline_end_to_end(spark, pipeline_dirs):
    src, target = pipeline_dirs
    _run_pipeline(spark, src, target)

    warehouse = spark.read.parquet(target)
    rows = {r.job_url: r for r in warehouse.collect()}
    # u6 dropped (missing title); u1..u5 present exactly once
    assert sorted(rows) == ["u1", "u2", "u3", "u4", "u5"]
    # the duplicate arrival did not overwrite the first u3
    assert rows["u3"].titre == "Data Engineer"
    # multi-format dates normalized by the shared cleaning plan
    assert str(rows["u2"].date_publication) == "2025-04-15"

    # star build on the streamed warehouse
    star = build_star(warehouse)
    assert star["fact_offre"].count() == 5
    bridge = star["offre_skill"]
    assert bridge.count() == bridge.distinct().count()

    # idempotence: replaying the whole stream (no checkpoint, so every
    # file reprocesses) adds nothing — the anti-join gate holds
    before = warehouse.count()

    def rerun():
        def load_batch(batch_df, epoch_id):
            cleaned = clean_offers(batch_df)
            existing = batch_df.sparkSession.read.parquet(target)
            fresh = cleaned.join(existing.select("job_url"), "job_url", "left_anti")
            fresh.write.mode("append").parquet(target)

        stream = (
            spark.readStream.schema(SPARK_INPUT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        q = (
            stream.writeStream.foreachBatch(load_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    rerun()
    assert spark.read.parquet(target).count() == before
