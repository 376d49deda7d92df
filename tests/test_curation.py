"""Training-data curation operator tests (decontaminate / mixture /
packing) on small synthetic frames with hand-computable answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.ml.curation import (
    SEQ_LEN,
    decontaminate,
    mixture_sample,
    pack_sequences,
    upsample_mixture,
)


def test_decontaminate_flags_quoting_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the secret eval answer is forty two exactly", "b")],
        "doc_id long, text string, source string",
    )
    train = spark.createDataFrame(
        [
            # quotes a 5-gram from the benchmark → contaminated
            (1, "he said the secret eval answer is what now", "s"),
            # shares only a 3-gram ("eval answer is") → clean at n=5
            (2, "an eval answer is fine here no overlap five", "s"),
            (3, "completely unrelated text about something else entirely here", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r.contaminated for r in decontaminate(train, bench).collect()}
    assert out == {1: 1, 2: 0, 3: 0}


def test_decontaminate_short_docs_never_match(spark):
    bench = spark.createDataFrame(
        [(1, "alpha beta", "b")], "doc_id long, text string, source string"
    )
    train = spark.createDataFrame(
        [(2, "alpha beta", "s")], "doc_id long, text string, source string"
    )
    # both under the 5-gram width → no shingles → clean
    assert decontaminate(train, bench).first().contaminated == 0


def test_mixture_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "keep_all" if i % 2 == 0 else "drop_all") for i in range(200)],
        "doc_id long, source string",
    )
    kept = mixture_sample(df, {"keep_all": 1.0, "drop_all": 0.0})
    got = {r.source for r in kept.select("source").distinct().collect()}
    assert got == {"keep_all"}
    assert kept.count() == 100  # rate 1.0 keeps every row


def test_mixture_sample_absent_stratum_dropped(spark):
    df = spark.createDataFrame(
        [(1, "known"), (2, "unknown_source")], "doc_id long, source string"
    )
    kept = mixture_sample(df, {"known": 1.0})
    assert [r.source for r in kept.collect()] == ["known"]


def test_mixture_sample_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(300)], "doc_id long, source string"
    )
    rates = {"src0": 0.3, "src1": 0.7, "src2": 1.0}
    a = sorted(r.doc_id for r in mixture_sample(df, rates).collect())
    b = sorted(
        r.doc_id for r in mixture_sample(df.repartition(13), rates).collect()
    )
    assert a == b  # survivor set survives resharding


def test_upsample_mixture_copy_counts(spark):
    df = spark.createDataFrame(
        [(i, "double") for i in range(50)]
        + [(i, "whole_half") for i in range(50, 150)]
        + [(i, "dropped") for i in range(150, 160)],
        "doc_id long, source string",
    )
    up = upsample_mixture(df, {"double": 2.0, "whole_half": 1.5})
    counts = {
        r.source: r.n for r in up.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert "dropped" not in counts  # absent stratum emits nothing
    assert counts["double"] == 100  # every row exactly twice
    # 1.5: every row once + ~half twice; exact count is deterministic
    assert 100 < counts["whole_half"] < 200
    again = {
        r.source: r.n
        for r in upsample_mixture(df.repartition(7), {"double": 2.0, "whole_half": 1.5})
        .groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert again == counts  # resharding never changes the multiset
    # copy_id is dense 1..n per row
    two = up.filter((F.col("source") == "double") & (F.col("doc_id") == 0))
    assert sorted(r.copy_id for r in two.collect()) == [1, 2]


def test_pack_sequences_layout(spark):
    # one source, force one bucket by using pack_buckets=1
    docs = spark.createDataFrame(
        [(i, "w " * 50, "s") for i in range(1, 6)],  # 50 tokens each
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, pack_buckets=1, seq_len=128).collect()
    }
    assert all(r.n_tokens == 50 for r in out.values())
    # cumulative starts: 0, 50, 100, 150, 200 → seq ids 0,0,0,1,1
    assert [out[i].seq_id for i in range(1, 6)] == [0, 0, 0, 1, 1]
    assert [out[i].offset for i in range(1, 6)] == [0, 50, 100, 22, 72]


def test_pack_sequences_bucket_bounds(spark):
    docs = spark.createDataFrame(
        [(i, "a b c", f"src{i % 2}") for i in range(100)],
        "doc_id long, text string, source string",
    )
    out = pack_sequences(docs)
    # bucket is within range and the (source,bucket) running sum is
    # consistent: offset + position arithmetic stays inside seq_len
    assert out.filter((F.col("bucket") < 0) | (F.col("bucket") > 3)).count() == 0
    assert out.filter((F.col("offset") < 0) | (F.col("offset") >= SEQ_LEN)).count() == 0


def test_canonicalize_url_variants(spark):
    from job_market_research_spark.operators.dedup import canonicalize_url

    urls = [
        (1, "https://www.Example.com/Jobs/123"),
        (2, "HTTP://EXAMPLE.COM/Jobs/123/"),
        (3, "https://example.com/Jobs/123?utm_source=x"),
        (4, "https://example.com/Jobs/123#apply"),
        (5, "https://example.com/Jobs/123?utm_campaign=y#frag"),
        # different PATH case is a different resource
        (6, "https://example.com/jobs/123"),
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    out = {r.id: r.c for r in df.select("id", canonicalize_url(F.col("url")).alias("c")).collect()}
    assert out[1] == out[2] == out[3] == out[4] == out[5] == "example.com/Jobs/123"
    assert out[6] == "example.com/jobs/123"
    assert out[6] != out[1]


def test_pipeline_e2e_gates_are_monotone(spark, sf_dir):
    """Yield must fall (weakly) at every gate, candidates must sum to
    the deduped corpus size, and the zh allowlist gate must zero out."""
    from pyspark.sql import functions as F

    from job_market_research_spark.io import load
    from job_market_research_spark.ml.curation import q_pipeline_curation_e2e

    rows = q_pipeline_curation_e2e(spark, sf_dir).collect()
    for r in rows:
        assert r["n_candidates"] >= r["n_quality"] >= r["n_sampled"] >= 0
        if r["lang"] == "zh":
            assert r["n_quality"] == 0 == r["n_sampled"]
        if r["n_sampled"] == 0:
            assert r["sampled_tokens"] == 0
    deduped = (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text"))
        .count()
        .count()
    )
    assert sum(r["n_candidates"] for r in rows) == deduped
