"""events.ts generation-variant handling in io.load.

The synthetic `events` table has shipped with three different parquet
physical types for `ts` across testdata generations; `io.load` must
normalize all of them to identical TIMESTAMP (naive-UTC) values:

- TIMESTAMP(NANOS)                → nanosAsLong scan → exact div 1000
- plain INT64 (no logical type)   → taken as already-microseconds
- TIMESTAMP(MICROS, naive)        → NTZ scan → cast under UTC session tz

The unit now comes from the parquet FOOTER (metadata-only, memoized per
path) — no full-column magnitude-probe job, and no misclassification of
small-magnitude ns epochs.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from job_market_research_spark import io

#: Two microsecond epochs: one modern, one pre-1973 (magnitude below the
#: old 1e17 probe threshold even in NANOS — the case the footer fixes).
MICROS = [1_700_000_000_000_000, 50_000_000_000_000]
EXPECTED = [
    datetime.datetime.utcfromtimestamp(us / 1_000_000).replace(
        microsecond=us % 1_000_000
    )
    for us in MICROS
]


def _write_events(tmp_path, arr: pa.Array) -> str:
    sf_dir = str(tmp_path)
    table = pa.table({"event_id": pa.array([1, 2], pa.int64()), "ts": arr})
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"), version="2.6")
    return sf_dir


def _load_ts(spark, sf_dir: str) -> list[datetime.datetime]:
    df = io.load(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    return [r["ts"] for r in df.orderBy("event_id").collect()]


def test_nanos_generation(spark, tmp_path):
    arr = pa.array([us * 1000 for us in MICROS], pa.timestamp("ns"))
    sf_dir = _write_events(tmp_path, arr)
    assert _load_ts(spark, sf_dir) == EXPECTED
    # footer resolved the unit — no magnitude-probe Spark job ran
    assert io._TS_UNIT_CACHE[io.table_path(sf_dir, "events")] == "ns"
    assert io.table_path(sf_dir, "events") not in io._TS_PROBE_CACHE


def test_plain_int64_generation(spark, tmp_path):
    arr = pa.array(MICROS, pa.int64())
    sf_dir = _write_events(tmp_path, arr)
    assert _load_ts(spark, sf_dir) == EXPECTED
    assert io._TS_UNIT_CACHE[io.table_path(sf_dir, "events")] == "int64"


def test_micros_ntz_generation(spark, tmp_path):
    arr = pa.array(MICROS, pa.timestamp("us"))
    sf_dir = _write_events(tmp_path, arr)
    assert _load_ts(spark, sf_dir) == EXPECTED


def test_pre1973_nanos_not_misclassified(spark, tmp_path):
    """A 1971 ns epoch (5e16 ns) sits below the old 1e17 magnitude
    threshold; the footer-based dispatch must still divide by 1000."""
    us = MICROS[1]
    arr = pa.array([us * 1000, us * 1000], pa.timestamp("ns"))
    sf_dir = _write_events(tmp_path, arr)
    got = _load_ts(spark, sf_dir)
    assert got == [EXPECTED[1], EXPECTED[1]]


def test_unit_probe_is_memoized(spark, tmp_path):
    arr = pa.array(MICROS, pa.timestamp("ns"))
    sf_dir = _write_events(tmp_path, arr)
    path = io.table_path(sf_dir, "events")
    io.load(spark, sf_dir, "events")
    io._TS_UNIT_CACHE[path] = "sentinel"  # second load must hit the cache
    io.load(spark, sf_dir, "events")
    assert io._TS_UNIT_CACHE[path] == "sentinel"
    io._TS_UNIT_CACHE.pop(path, None)


def test_bloom_prune_preserves_caller_h_column(spark):
    """bloom_prune's scratch column must not clobber probe data
    (reusable-helper contract; was a silent overwrite of '_h')."""
    from pyspark.sql import functions as F

    from job_market_research_spark.operators.bloom import bloom_bits, bloom_prune

    build = spark.range(0, 10).select(F.col("id").alias("k"))
    probe = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.lit("keep-me").alias("__bloom_h"),  # adversarial name
    )
    out = bloom_prune(probe, "k", bloom_bits(build, "k"))
    assert "__bloom_h" in out.columns
    rows = out.collect()
    assert rows and all(r["__bloom_h"] == "keep-me" for r in rows)


def test_skill_ner_stem_recall(spark, tmp_path):
    """The stem normalizer closes the lemma-variant recall gap vs the
    reference's spaCy lemmatizer: inflected surface forms must match
    canonical lexicon entries ("dockerized" → "docker", "sorting" →
    "sort", e-elision "merged" → "merge"), and multi-word phrases
    must match through stemmed shingles ("hash joins" → "hash join")."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from job_market_research_spark.functions.text import q_text_skill_ner

    docs = [
        (1, "we dockerized everything last year"),
        (2, "sorting large tables quickly"),
        (3, "records were merged downstream"),
        (4, "prefers hash joins over loops"),
        (5, "nothing relevant here"),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in q_text_skill_ner(spark, str(tmp_path)).collect()}
    assert "docker" in out[1].hard_skills.split(",")
    assert "sort" in out[2].hard_skills.split(",")
    assert "merge" in out[3].hard_skills.split(",")
    assert "hash join" in out[4].hard_skills.split(",")
    assert 5 not in out


def test_cdc_fold_is_arrival_order_independent(spark):
    """The streaming CDC apply's fold must give the same final state
    whatever order batches arrive in — a tombstone applied early must
    not be resurrected by a late-arriving LOWER-seq update, and vice
    versa (seq decides, never arrival order)."""
    from pyspark.sql import functions as F

    from job_market_research_spark.streaming.windows import cdc_fold

    schema = "k long, status string, price double, seq long, op string"
    w1 = spark.createDataFrame(
        [(1, "A", 10.0, 1, "I"), (2, "B", 20.0, 2, "I"), (3, "C", 30.0, 3, "I")],
        schema,
    )
    w2 = spark.createDataFrame(
        [(1, "X", 11.0, 9, "U"), (2, None, 0.0, 8, "D")], schema
    )

    def final(*batches):
        state = spark.createDataFrame([], schema)
        for b in batches:
            state = cdc_fold(state.unionByName(b))
        live = state.filter(F.col("op") != "D").select("k", "status", "price")
        return {tuple(r) for r in live.collect()}

    forward, backward = final(w1, w2), final(w2, w1)
    assert forward == backward == {(1, "X", 11.0), (3, "C", 30.0)}
    # key 2 is deleted at seq 8; replaying its seq-2 insert afterwards
    # must NOT resurrect it
    replay = final(w2, w1, w1)
    assert replay == forward
