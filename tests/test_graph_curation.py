"""Semantic invariants for the round-3b curation/graph operators —
properties the oracle-parity hash can't see (mass conservation,
planted-artifact removal, per-cluster representative survival)."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.functions.text import (
    q_text_repetition_signals,
)
from job_market_research_spark.ml.graph import q_graph_pagerank_lite
from job_market_research_spark.ml.curation import q_text_strip_boilerplate
from job_market_research_spark.ml.neardup import (
    SEMDEDUP_K,
    q_dedup_semantic_semdedup,
)


def test_pagerank_mass_conserved(spark, sf_dir):
    """With a total graph (every node has outlinks) PageRank mass sums
    to exactly 1 each iteration (up to float addition error)."""
    ranks = q_graph_pagerank_lite(spark, sf_dir)
    total = ranks.agg(F.sum("rank").alias("s")).collect()[0].s
    assert abs(total - 1.0) < 1e-6
    assert ranks.filter(F.col("rank") <= 0).count() == 0


def test_strip_boilerplate_removes_planted_chrome(spark, sf_dir):
    out = q_text_strip_boilerplate(spark, sf_dir)
    dirty = out.filter(
        F.col("clean_text").contains("subscribe to our newsletter")
        | F.col("clean_text").contains("all rights reserved")
    ).count()
    assert dirty == 0
    # Planted docs lost exactly the 2 planted lines; organic docs 0.
    removed = dict(
        out.select("doc_id", "n_removed_lines").collect()
    )
    for doc_id, n_removed in removed.items():
        assert n_removed == (2 if doc_id % 5 == 0 else 0), (doc_id, n_removed)


def test_semdedup_keeps_a_representative_per_cluster(spark, sf_dir):
    out = q_dedup_semantic_semdedup(spark, sf_dir)
    per_cluster = (
        out.groupBy("cid")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
        )
        .collect()
    )
    assert 0 < len(per_cluster) <= SEMDEDUP_K
    for row in per_cluster:
        # Dropping everything in a cluster is impossible: the smallest
        # id in any dup set never has a smaller twin.
        assert 0 < row.n_keep <= row.n


def test_repetition_signals_separate_planted_spam(spark, sf_dir):
    out = q_text_repetition_signals(spark, sf_dir).collect()
    assert out
    for row in out:
        if row.doc_id % 7 == 0:
            # '! ! spam $ $ spam $ $' plants symbols and a repeated
            # bigram in every 7th doc.
            assert row.symbol_word_ratio > 0
            assert row.top_bigram_count >= 2
        else:
            assert row.symbol_word_ratio == 0.0
        assert 0.0 <= row.dup_word_fraction < 1.0
        assert row.n_bigrams == max(row.n_tokens - 1, 0)


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    from job_market_research_spark.ml.curation import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q_text_chunk_overlap,
    )

    rows = q_text_chunk_overlap(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert chunks[0].chunk_id == 0
        # chunk_ids consecutive; every chunk except possibly the last
        # is full; strided starts cover the doc with overlap.
        n_total = CHUNK_STRIDE * (len(chunks) - 1) + chunks[-1].n_chunk_tokens
        for i, c in enumerate(chunks):
            assert c.chunk_id == i
            expected = min(CHUNK_SIZE, n_total - i * CHUNK_STRIDE)
            assert c.n_chunk_tokens == expected, (doc_id, i)
            assert len(c.chunk_text.split(" ")) == c.n_chunk_tokens


def test_normalize_unicode_folds_and_collapses(spark, sf_dir):
    from job_market_research_spark.functions.text import (
        q_text_normalize_unicode,
    )

    rows = q_text_normalize_unicode(spark, sf_dir).collect()
    for r in rows:
        assert "  " not in r.norm_text
        assert r.norm_text == r.norm_text.lower()
        if r.doc_id % 11 == 0:
            assert r.norm_text.endswith("cafe resume naive e"), r.norm_text
