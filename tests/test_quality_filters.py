"""Invariants for the published-filter-suite operators
(functions/quality_filters.py, ml/evaluate.py ml_eval_retrieval_ndcg).
Oracle parity is covered by the registry sweep; these pin the
SEMANTICS: every Gopher rule fires on its planted dirty variant, the
retrieval metrics respect their bounds, CCNet terciles are ordered and
balanced."""

from __future__ import annotations

from job_market_research_spark.functions.quality_filters import (
    CCNET_BUCKETS,
    q_text_ccnet_buckets,
    q_text_gopher_filters,
)
from job_market_research_spark.ml.evaluate import q_ml_eval_retrieval_ndcg

_RULES = (
    "fail_word_count",
    "fail_word_len",
    "fail_symbol_ratio",
    "fail_bullet_lines",
    "fail_ellipsis_lines",
    "fail_alpha_ratio",
    "fail_stopwords",
)


def test_gopher_every_rule_fires_and_some_docs_pass(spark, sf_dir):
    rows = q_text_gopher_filters(spark, sf_dir).collect()
    assert rows
    totals = {r: sum(row[r] for row in rows) for r in _RULES}
    for rule, n in totals.items():
        assert n > 0, f"{rule} never fires — planted variant broken"
    n_docs = sum(row["n_docs"] for row in rows)
    n_pass = sum(row["n_pass"] for row in rows)
    assert 0 < n_pass < n_docs
    # The planted symbol-spam docs (doc_id % 13 == 0) alone guarantee
    # at least one symbol failure per ~13 docs.
    assert totals["fail_symbol_ratio"] >= n_docs // 13


def test_retrieval_metrics_bounds_and_consistency(spark, sf_dir):
    rows = q_ml_eval_retrieval_ndcg(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_rel"] <= 10
        assert 0.0 <= r["precision_r6"] <= 1.0
        assert 0.0 <= r["mrr_r6"] <= 1.0
        assert 0.0 <= r["ndcg_r6"] <= 1.0
        # MRR and NDCG are zero exactly when nothing relevant retrieved.
        assert (r["n_rel"] > 0) == (r["mrr_r6"] > 0.0)
        assert (r["n_rel"] > 0) == (r["ndcg_r6"] > 0.0)
        # A first hit at rank 1 lower-bounds NDCG by w1/ideal(n_rel) —
        # weakest when all k are relevant; just check ndcg >= mrr-scaled
        # floor: dcg >= w[first_rel] so ndcg > 0 handled above.
        if r["n_rel"] == 10:
            assert r["ndcg_r6"] <= 1.0


def test_ccnet_buckets_ordered_and_balanced(spark, sf_dir):
    rows = q_text_ccnet_buckets(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, bs in by_lang.items():
        assert [b["bucket"] for b in bs] == list(range(1, CCNET_BUCKETS + 1)), lang
        # Ranges ordered: head scores <= middle <= tail.
        for a, b in zip(bs, bs[1:]):
            assert a["max_score"] <= b["min_score"], lang
        # NTILE balance: bucket sizes differ by at most 1.
        sizes = [b["n_docs"] for b in bs]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
