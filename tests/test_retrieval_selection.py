"""Semantic checks for the round-5 retrieval / selection / release ops.

Oracle parity is covered by test_oracle_parity's auto-parametrization;
these pin the SEMANTICS: link-prediction pairs really are non-adjacent
with recomputable Adamic-Adar scores (hub cap honored), DSIR never
selects the target set and its head weight replays in Python, RRF obeys
the 1/(k+rank) formula, BPE segmentations rebuild their words from
learned merges only, and the DP release is deterministic inverse-CDF
noise added to exact counts.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.graph import (
    LP_DEG_CAP,
    LP_TOP,
    _edges,
    q_graph_link_prediction,
)
from job_market_research_spark.ml.ir import (
    BPE_ENC_TOP,
    RRF_DEPTH,
    RRF_K,
    RRF_TOP,
    _bpe_train,
    q_ir_hybrid_rrf,
    q_text_bpe_encode,
)
from job_market_research_spark.ml.sampling import (
    DSIR_K,
    q_sample_dsir_importance,
)
from job_market_research_spark.operators.quality import (
    q_privacy_dp_count_release,
)


def _und_edges_py(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    raw = _edges(docs, n).filter(F.col("src") != F.col("dst"))
    und = (
        raw.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .collect()
    )
    return {(r.a, r.b) for r in und}


def test_link_prediction_pairs_nonadjacent_scores_replay(spark, sf_dir):
    rows = q_graph_link_prediction(spark, sf_dir).collect()
    assert 0 < len(rows) <= LP_TOP
    edges = _und_edges_py(spark, sf_dir)
    # exact Python replica: capped adjacency -> wedge enumeration
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scores: dict[tuple[int, int], float] = defaultdict(float)
    common: dict[tuple[int, int], int] = defaultdict(int)
    for z, ns in nbrs.items():
        if len(ns) > LP_DEG_CAP:
            continue  # hub centers contribute no wedges (the cap)
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                if (u, v) not in edges:
                    scores[(u, v)] += 1.0 / math.log(len(ns))
                    common[(u, v)] += 1
    for r in rows:
        assert (r.a, r.b) not in edges, "predicted an existing edge"
        assert r.common == common[(r.a, r.b)]
        assert abs(r.aa_score - scores[(r.a, r.b)]) < 1e-5
    got = [r.aa_score for r in rows]
    assert got == sorted(got, reverse=True)


def test_dsir_excludes_target_and_orders_by_weight(spark, sf_dir):
    rows = q_sample_dsir_importance(spark, sf_dir).collect()
    assert 0 < len(rows) <= DSIR_K
    assert all(r.doc_id % 10 != 0 for r in rows), "target doc selected"
    ws = [r.dsir_weight for r in rows]
    assert ws == sorted(ws, reverse=True)
    # deterministic: identical on re-run (hash-seeded, no rand())
    again = q_sample_dsir_importance(spark, sf_dir).collect()
    assert [(r.doc_id, r.dsir_weight) for r in rows] == [
        (r.doc_id, r.dsir_weight) for r in again
    ]


def test_rrf_obeys_reciprocal_rank_formula(spark, sf_dir):
    rows = q_ir_hybrid_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOP
    for r in rows:
        assert r.lex_rank is not None or r.vec_rank is not None
        expect = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= RRF_DEPTH
            expect += 1.0 / (RRF_K + r.lex_rank)
        if r.vec_rank is not None:
            assert 1 <= r.vec_rank <= RRF_DEPTH
            expect += 1.0 / (RRF_K + r.vec_rank)
        assert abs(r.rrf - expect) < 1e-6
    # both-list docs with best ranks must dominate the head
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bpe_encode_segments_rebuild_words_from_merges(spark, sf_dir):
    learned, _ = _bpe_train(spark, sf_dir)
    merged_syms = {m[3] for m in learned}
    rows = q_text_bpe_encode(spark, sf_dir).collect()
    assert 0 < len(rows) <= BPE_ENC_TOP
    for r in rows:
        toks = r.seg.split(" ")
        assert "".join(toks) == r.w, "segmentation does not rebuild word"
        assert r.n_tokens == len(toks)
        for t in toks:
            assert len(t) == 1 or t in merged_syms, (
                f"token {t!r} is neither a char nor a learned merge"
            )


def test_dp_release_is_count_plus_seeded_laplace(spark, sf_dir):
    rows = q_privacy_dp_count_release(spark, sf_dir).collect()
    assert rows
    exact = dict(
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    )
    for r in rows:
        assert r.n == exact[r.event_type]
        assert math.isfinite(r.noise_r6)
        assert r.released == round(r.n + r.noise_r6)
    again = q_privacy_dp_count_release(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_hits_scores_normalized_and_converging(spark, sf_dir):
    from job_market_research_spark.ml.graph import q_graph_hits

    rows = q_graph_hits(spark, sf_dir).collect()
    n = (
        load(spark, sf_dir, "documents").count()
    )
    assert len(rows) == n  # full node spine, sinks/sources included
    hub_sum = sum(r.hub for r in rows)
    auth_sum = sum(r.auth for r in rows)
    assert abs(hub_sum - 1.0) < 1e-5 and abs(auth_sum - 1.0) < 1e-5
    assert all(r.hub >= 0 and r.auth >= 0 for r in rows)


def test_cms_estimate_never_underestimates(spark, sf_dir):
    from job_market_research_spark.operators.skew import (
        CMS_TOP,
        q_agg_cms_heavy_hitters,
    )

    rows = q_agg_cms_heavy_hitters(spark, sf_dir).collect()
    assert 0 < len(rows) <= CMS_TOP
    for r in rows:
        assert r.cms_est >= r.true_n, (
            f"CMS underestimated {r.token}: {r.cms_est} < {r.true_n}"
        )
    # the true hottest token must surface in the sketch head (its own
    # counters are at least its count, and it has the largest count)
    vocab = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"), "t")
        .first()
    )
    assert vocab["t"] in {r.token for r in rows}


def test_gumbel_sample_prefers_heavy_docs_statistically(spark, sf_dir):
    from job_market_research_spark.ml.sampling import (
        GUMBEL_K,
        q_sample_gumbel_weighted,
    )

    rows = q_sample_gumbel_weighted(spark, sf_dir).collect()
    assert len(rows) == min(
        GUMBEL_K,
        load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0).count(),
    )
    keys = [r.race_key for r in rows]
    assert keys == sorted(keys)
    # weight-proportional draw: the sample's mean weight should exceed
    # the corpus mean (longer docs are likelier winners)
    corpus_mean = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = sum(r.weight for r in rows) / len(rows)
    assert sample_mean > corpus_mean * 0.9


def test_benford_rows_complete_and_chi_consistent(spark, sf_dir):
    import math as _m

    from job_market_research_spark.operators.quality import (
        q_profile_benford_audit,
    )

    rows = q_profile_benford_audit(spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    total = sum(r.n for r in rows)
    assert total > 0
    p_sum = sum(r.benford_p for r in rows)
    assert abs(p_sum - 1.0) < 1e-4  # Benford probabilities sum to 1
    for r in rows:
        p = _m.log10(1 + 1 / r.digit)
        expect = (r.n - total * p) ** 2 / (total * p)
        assert abs(r.chi_term - expect) < 1e-3


def test_coreset_race_proportional_to_sensitivity(spark, sf_dir):
    from job_market_research_spark.ml.clustering import (
        CORESET_K,
        q_sample_coreset_sensitivity,
    )

    rows = q_sample_coreset_sensitivity(spark, sf_dir).collect()
    n_emb = load(spark, sf_dir, "embeddings").count()
    assert len(rows) == min(CORESET_K, n_emb)
    keys = [r.race_key for r in rows]
    assert keys == sorted(keys)
    assert all(r.sensitivity_r9 > 0 for r in rows)
    # sensitivities must exceed the uniform floor's reciprocal bound:
    # s_i >= 0.5/n_cluster >= 0.5/n_total
    assert all(r.sensitivity_r9 >= 0.5 / n_emb for r in rows)


def test_token_budget_waterfill_exact(spark, sf_dir):
    from job_market_research_spark.ml.curation import (
        MIX_BUDGET_TOKENS,
        q_mixture_token_budget,
    )

    rows = q_mixture_token_budget(spark, sf_dir).collect()
    assert rows
    total_alloc = sum(r.allocated for r in rows)
    m = len(rows)
    # never over budget (unless the corpus is smaller than the budget,
    # in which case everything saturates), remainder < m tokens
    corpus = sum(r.tokens for r in rows)
    if corpus <= MIX_BUDGET_TOKENS:
        assert all(r.saturated for r in rows)
        assert total_alloc == corpus
    else:
        assert total_alloc <= MIX_BUDGET_TOKENS
        assert MIX_BUDGET_TOKENS - total_alloc < m + len(rows)
        # Python replica of exact water-filling
        toks = sorted(r.tokens for r in rows)
        budget = MIX_BUDGET_TOKENS
        lo_alloc = {}
        remaining, left = budget, m
        for i, t in enumerate(toks):
            if t * (m - i) <= remaining:
                remaining -= t
                left -= 1
        theta = remaining / left if left else 0
        for r in rows:
            if r.tokens <= theta:
                assert r.saturated and r.allocated == r.tokens
            else:
                assert not r.saturated
                assert r.allocated == min(r.tokens, int(theta // 1))
    for r in rows:
        assert 0 < r.epochs_r6 <= 1.0
        if r.saturated:
            assert r.epochs_r6 == 1.0


def test_kmv_estimates_track_exact_audience_overlap(spark, sf_dir):
    """The KMV sketch estimates must land near the exact overlap
    matrix (k=64 → ~12% standard error; assert a loose 4-sigma band),
    and degenerate (<k) sets must estimate exactly."""
    from job_market_research_spark.plans.events_analytics import (
        KMV_K,
        q_agg_kmv_audience_sketch,
    )

    rows = q_agg_kmv_audience_sketch(spark, sf_dir).collect()
    assert rows
    exact = {}
    ut = load(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    by_type = {}
    for r in ut.collect():
        by_type.setdefault(r.event_type, set()).add(r.user_id)
    for r in rows:
        a, b = by_type[r.type_a], by_type[r.type_b]
        for est, true_n in (
            (r.est_a, len(a)),
            (r.est_b, len(b)),
            (r.est_union, len(a | b)),
        ):
            if true_n < KMV_K:
                assert est == true_n, "sub-k set must be exact"
            else:
                assert abs(est - true_n) / true_n < 0.5, (
                    f"KMV estimate {est} vs exact {true_n}"
                )
        true_j = len(a & b) / len(a | b)
        assert abs(r.jaccard_kmv - true_j) < 0.25


def test_bounded_ewma_tracks_exact_recursive_ewma(spark, sf_dir):
    """The native truncated EWMA must agree with the exact recursive
    (pandas) EWMA to within the truncation tail bound (2^-16 of the
    value scale) once a full window of history exists."""
    from job_market_research_spark.functions.enrich import (
        EWMA_WINDOW,
        q_grouped_pandas_ewma,
        q_window_ewma_bounded,
    )

    exact = {
        r.o_orderkey: r.ewma for r in q_grouped_pandas_ewma(spark, sf_dir).collect()
    }
    rows = q_window_ewma_bounded(spark, sf_dir).collect()
    assert rows
    # position within each priority group to know when history is full
    from collections import defaultdict

    seen = defaultdict(int)
    checked = 0
    for r in sorted(rows, key=lambda r: r.o_orderkey):
        seen[r.priority] += 1
        if seen[r.priority] >= EWMA_WINDOW:
            rel = abs(r.ewma_b - exact[r.o_orderkey]) / max(
                abs(exact[r.o_orderkey]), 1.0
            )
            assert rel < 1e-3, (r.o_orderkey, r.ewma_b, exact[r.o_orderkey])
            checked += 1
    assert checked > 0


def test_mips_topk_equals_exact_dot_ranking(spark, sf_dir):
    """The augmented-cosine candidate path must recover exactly the
    brute-force inner-product top-k."""
    from job_market_research_spark.ml.similarity import (
        QUERY_VEC_ID,
        TOP_K,
        as_double_vec,
        q_ann_mips_topk,
    )

    got = [(r.vec_id, r.dot_r6) for r in q_ann_mips_topk(spark, sf_dir).collect()]
    emb = {
        r.vec_id: r.v
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double_vec("embedding").alias("v"))
        .collect()
    }
    q = emb[QUERY_VEC_ID]
    dots = sorted(
        (
            (round(sum(x * y for x, y in zip(v, q)), 6), -vid)
            for vid, v in emb.items()
            if vid != QUERY_VEC_ID
        ),
        reverse=True,
    )[:TOP_K]
    want = [(-nid, d) for d, nid in dots]
    assert got == want


def test_kn_bigram_lm_probabilities_and_scores_sane(spark, sf_dir):
    """KN-smoothed conditional probabilities must form a (near-)
    distribution per left context and the per-doc NLL must be
    positive; repeated text scores lower NLL than the corpus tail."""
    from job_market_research_spark.ml.ir import q_text_bigram_lm_kn

    rows = q_text_bigram_lm_kn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams > 0
        assert r.avg_nll_r6 > 0, "observed bigrams must have P < 1"
    # deterministic across runs
    again = q_text_bigram_lm_kn(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_stream_kmv_matches_batch_sketch(spark, sf_dir):
    """The incremental (foreachBatch-merged) KMV estimate must equal
    the single-pass batch sketch exactly — merge-invariance is the
    defining sketch property."""
    from pyspark.sql.window import Window

    from job_market_research_spark.ml.neardup import portable_hash60
    from job_market_research_spark.plans.events_analytics import KMV_K
    from job_market_research_spark.streaming.windows import (
        q_stream_kmv_distinct,
    )

    got = {
        r.event_type: (r.k_used, r.distinct_est)
        for r in q_stream_kmv_distinct(spark, sf_dir).collect()
    }
    wk = Window.partitionBy("event_type").orderBy("h")
    batch = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            portable_hash60(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count("*").alias("k_used"), F.max("h").alias("hk"))
        .collect()
    )
    for r in batch:
        est = (
            float(r.k_used)
            if r.k_used < KMV_K
            else round((KMV_K - 1) * float(2**60) / r.hk, 6)
        )
        assert got[r.event_type] == (r.k_used, est)


def test_shapley_efficiency_axiom_holds(spark, sf_dir):
    """Σφ_i must equal v(full) − v(∅) exactly (efficiency axiom), in
    the scaled-integer domain where everything is exact."""
    from job_market_research_spark.plans.events_analytics import (
        ATTR_CHANNELS,
        ATTR_CONVERSION,
        _SHAP_DEN,
        q_agg_shapley_attribution,
    )

    rows = q_agg_shapley_attribution(spark, sf_dir).collect()
    assert {r.channel for r in rows} == set(ATTR_CHANNELS)
    ev = load(spark, sf_dir, "events")
    um = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == ATTR_CONVERSION, 1).otherwise(0)
        ).alias("converted"),
        F.max(
            F.when(F.col("event_type").isin(*ATTR_CHANNELS), 1).otherwise(0)
        ).alias("touched"),
    )
    v_full = um.filter("converted = 1").count()
    v_empty = um.filter("converted = 1 AND touched = 0").count()
    total_scaled = sum(r.phi_scaled for r in rows)
    assert total_scaled == (v_full - v_empty) * _SHAP_DEN
    for r in rows:
        assert r.shapley_r6 == round(r.phi_scaled / _SHAP_DEN, 6)


def test_scene_cuts_match_numpy_replay(spark, sf_dir):
    """Every emitted cut must reproduce from a direct numpy decode of
    the same frames, and no qualifying cut may be missed."""
    import numpy as np

    from job_market_research_spark.multimodal.real_media import (
        CUT_THRESHOLD,
        _make_frame,
        q_multimodal_scene_cut,
    )

    got = {
        (r.doc_id, r.frame_idx): r.delta_sum
        for r in q_multimodal_scene_cut(spark, sf_dir).collect()
    }
    doc_ids = [
        r.doc_id
        for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    want = {}
    for d in doc_ids:
        prev = None
        for f in range(d % 10 + 1):
            img = _make_frame(d, f)
            s = int(img.sum(dtype=np.int64))
            if prev is not None and abs(s - prev) >= CUT_THRESHOLD * img.size:
                want[(d, f)] = abs(s - prev)
            prev = s
    assert got == want
    assert want, "fixture should contain at least one cut"


def test_cdc_chunks_rebuild_docs_and_survive_insertion(spark, sf_dir):
    """Chunks must partition each document exactly, and inserting a
    prefix into a doc must leave all boundaries after the insertion
    region content-stable (the content-defined property)."""
    from job_market_research_spark.ml.neardup import (
        CDC_B,
        CDC_M,
        CDC_MASK,
        CDC_W,
        q_dedup_cdc_chunking,
    )

    rows = q_dedup_cdc_chunking(spark, sf_dir).collect()
    assert rows
    assert any(r.n_docs > 1 for r in rows), "no cross-doc shared chunks"

    def boundaries(text):
        bs = []
        for i in range(CDC_W, len(text) + 1):
            h = sum(
                ord(text[i - 1 - k]) * (CDC_B**k) for k in range(CDC_W)
            ) % CDC_M
            if h % CDC_MASK == 0:
                bs.append(i)
        return bs

    def chunks(text):
        bs = [0] + boundaries(text) + [len(text)]
        return [text[a:b] for a, b in zip(bs, bs[1:]) if b > a]

    doc = (
        load(spark, sf_dir, "documents")
        .orderBy(F.desc("n_chars"))
        .select("text")
        .first()["text"]
    )
    assert "".join(chunks(doc)) == doc
    edited = "INSERTED PREFIX " + doc
    tail = set(chunks(doc)[1:])
    tail_edited = set(chunks(edited))
    # every original chunk beyond the first must reappear verbatim
    missing = tail - tail_edited
    assert not missing, f"content-defined boundaries shifted: {missing}"


def test_incremental_minhash_subset_of_batch_pairs(spark, sf_dir):
    """Every incremental match must be a pair the batch self-join also
    finds (same bands, same verification), restricted to
    new-vs-indexed; and no new-vs-new pair may appear."""
    from job_market_research_spark.ml.neardup import (
        q_dedup_incremental_minhash,
        q_dedup_minhash_lsh,
    )

    inc = {
        (r.new_doc, r.dup_of): r.jaccard
        for r in q_dedup_incremental_minhash(spark, sf_dir).collect()
    }
    batch = {
        frozenset((r.doc_a, r.doc_b)): r.jaccard
        for r in q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    for (new_doc, dup_of), j in inc.items():
        assert new_doc % 4 == 0 and dup_of % 4 != 0
        key = frozenset((new_doc, dup_of))
        assert key in batch, f"incremental-only pair {key}"
        assert abs(batch[key] - j) < 1e-12
    # completeness: every batch pair that crosses the split appears
    for key, j in batch.items():
        a, b = sorted(key)
        crossing = (a % 4 == 0) != (b % 4 == 0)
        if crossing:
            new_doc = a if a % 4 == 0 else b
            dup_of = b if a % 4 == 0 else a
            assert (new_doc, dup_of) in inc, f"missed crossing pair {key}"


def test_forward_asof_never_looks_backward(spark, sf_dir):
    """Every forward match must be at-or-after the event; every
    backward match at-or-before — and where both exist they bracket
    the event time."""
    from job_market_research_spark.operators.temporal_joins import (
        q_join_asof,
        q_join_asof_forward,
    )

    fwd = {r.event_id: r for r in q_join_asof_forward(spark, sf_dir).collect()}
    bwd = {r.event_id: r for r in q_join_asof(spark, sf_dir).collect()}
    # forward covers non-purchase exposures only; backward covers all
    assert fwd and set(fwd) <= set(bwd)
    n_matched = 0
    for eid, f in fwd.items():
        if f.matched_ts is not None:
            assert f.matched_ts >= f.ts
            n_matched += 1
        b = bwd[eid]
        if b.matched_ts is not None:
            assert b.matched_ts <= b.ts
    assert n_matched > 0


def test_hard_negatives_are_cross_label_and_harder_than_random(spark, sf_dir):
    from job_market_research_spark.ml.similarity import (
        HARDNEG_K,
        q_sample_hard_negatives,
    )

    rows = q_sample_hard_negatives(spark, sf_dir).collect()
    assert rows
    by_anchor = {}
    for r in rows:
        assert r.neg_label != r.anchor_label, "same-class negative"
        assert 1 <= r.rk <= HARDNEG_K
        by_anchor.setdefault(r.anchor_id, []).append(r.cosine)
    for scores in by_anchor.values():
        assert scores == sorted(scores, reverse=True)
        # hard negatives should be meaningfully similar (top of the
        # cross-class similarity distribution, not random draws)
        assert scores[0] > 0


def test_winnowing_guarantee_on_planted_substring(spark, sf_dir):
    """Winnowing's core guarantee: two docs sharing a substring of
    length >= k + w - 1 MUST share at least one selected fingerprint.
    Replay selection in Python on a planted pair."""
    from job_market_research_spark.ml.neardup import (
        WIN_K,
        WIN_W,
        q_dedup_winnowing,
    )

    rows = q_dedup_winnowing(spark, sf_dir).collect()
    assert rows, "fixture contains near-dup docs; winnowing must fire"
    for r in rows:
        assert r.shared >= 1 and 0 < r.winnow_sim <= 1.0

    def fingerprints(text):
        import hashlib

        hs = [
            int(hashlib.md5(text[i : i + WIN_K].encode()).hexdigest()[:8], 16)
            for i in range(len(text) - WIN_K + 1)
        ]
        return {
            min(hs[j : j + WIN_W]) for j in range(len(hs) - WIN_W + 1)
        }

    shared_sub = "x" * (WIN_K + WIN_W - 1) + "planted common run"
    a = "left document body " + shared_sub + " tail alpha"
    b = "totally different opening " + shared_sub + " other end"
    assert fingerprints(a) & fingerprints(b), "guarantee violated"


def test_balanced_classes_exact_floor(spark, sf_dir):
    from job_market_research_spark.ml.sampling import (
        q_sample_balanced_classes,
    )

    rows = q_sample_balanced_classes(spark, sf_dir).collect()
    sizes = dict(
        load(spark, sf_dir, "embeddings").groupBy("label").count().collect()
    )
    floor = min(sizes.values())
    assert {r.label for r in rows} == set(sizes)
    assert all(r.n_kept == floor for r in rows)
    again = q_sample_balanced_classes(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_rag_embedding_hash_list_stays_let_bound(spark, sf_dir):
    """CollapseProject must not re-inline the per-token md5 hash list
    into the per-dimension embedding lambda: projecting `chl` as its
    own column did not survive collapsing, and every chunk re-hashed
    its 32 tokens once per dim — 8 md5/token (r16 A/B: 0.30× at sf0.1
    after let-binding). Pin that the optimized doc-side plan still
    carries the single-element-array binding and that the per-dim
    aggregate folds the BOUND lambda variable, not a recomputed
    transform."""
    from job_market_research_spark.ml.curation import (
        q_pipeline_rag_index_e2e,
    )

    plan = (
        q_pipeline_rag_index_e2e(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "element_at(transform(array(transform(" in plan
    assert "aggregate(lambda chl" in plan


def test_rag_pipeline_probe_stays_in_query_bucket(spark, sf_dir):
    from job_market_research_spark.ml.curation import (
        RAG_TOP,
        q_pipeline_rag_index_e2e,
    )

    rows = q_pipeline_rag_index_e2e(spark, sf_dir).collect()
    assert 0 < len(rows) <= RAG_TOP
    scores = [r.cosine for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)


def test_kaplan_meier_matches_lifelines_style_replay(spark, sf_dir):
    """Ŝ must be monotone non-increasing from 1, and equal a direct
    Python KM replay over the same durations."""
    from job_market_research_spark.plans.events_analytics import (
        q_agg_kaplan_meier,
    )

    rows = q_agg_kaplan_meier(spark, sf_dir).collect()
    assert rows
    s_vals = [r.survival_r6 for r in rows]
    assert all(0.0 <= s <= 1.0 for s in s_vals)
    assert all(a >= b for a, b in zip(s_vals, s_vals[1:])), "not monotone"
    # Python replay
    ev = load(spark, sf_dir, "events")
    span = (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("conv_ts"),
        )
        .collect()
    )
    end_ts = ev.agg(F.max("ts")).first()[0]
    durs = []
    for r in span:
        if r.conv_ts is not None:
            durs.append(((r.conv_ts.date() - r.first_ts.date()).days, True))
        else:
            durs.append(((end_ts.date() - r.first_ts.date()).days, False))
    s = 1.0
    expect = {}
    for t in sorted({t for t, died in durs if died}):
        n_risk = sum(1 for u, _ in durs if u >= t)
        d = sum(1 for u, died in durs if died and u == t)
        s *= 1.0 - d / n_risk
        expect[t] = (d, n_risk, round(s, 6))
    for r in rows:
        d, n_risk, sv = expect[r.t_days]
        assert (r.d, r.n_risk) == (d, n_risk)
        assert abs(r.survival_r6 - sv) < 1e-5


def test_user_paths_cover_all_users(spark, sf_dir):
    from job_market_research_spark.plans.events_analytics import (
        PATH_LEN,
        q_agg_user_path_topk,
    )

    rows = q_agg_user_path_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        steps = r.path.split(" > ")
        assert 1 <= len(steps) <= PATH_LEN
    # the head path count cannot exceed the user population
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) <= n_users


def test_bootstrap_ci_brackets_the_mean(spark, sf_dir):
    from job_market_research_spark.plans.events_analytics import (
        q_stat_poisson_bootstrap_ci,
    )

    rows = q_stat_poisson_bootstrap_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ci_lo_r6 is not None and r.ci_hi_r6 is not None
        assert r.ci_lo_r6 <= r.ci_hi_r6
        # a 95% CI from the data's own replicates should bracket the
        # point estimate (deterministic here, so assert it outright)
        assert r.ci_lo_r6 <= r.mean_r6 <= r.ci_hi_r6
    again = q_stat_poisson_bootstrap_ci(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_markov_stationary_sums_to_one(spark, sf_dir):
    from job_market_research_spark.plans.events_analytics import (
        q_agg_markov_stationary,
    )

    rows = q_agg_markov_stationary(spark, sf_dir).collect()
    assert rows
    total = sum(r.pi_r9 for r in rows)
    assert abs(total - 1.0) < 1e-6  # chain has no dangling states
    assert all(r.pi_r9 > 0 for r in rows)


def test_adaboost_error_decreases_and_replays_in_sklearn_style(
    spark, sf_dir
):
    """Each learned stump's weighted error must beat chance (< 0.5
    after clamping), alpha must be positive, and the model replays
    exactly in a Python reference implementation."""
    import math as _m

    from job_market_research_spark.ml.clustering import (
        ADA_BINS,
        ADA_EPS_CLAMP,
        ADA_ROUNDS,
        q_ml_adaboost_stumps,
    )

    rows = q_ml_adaboost_stumps(spark, sf_dir).collect()
    assert len(rows) == ADA_ROUNDS
    for r in rows:
        assert 0 < r.eps_r9 < 0.5 + 1e-9
        assert r.alpha_r9 > 0
        assert 0.0 <= r.train_acc_r6 <= 1.0
    # Python replay
    data = [
        (int(round(v * 100)), 1 if t == "purchase" else -1)
        for v, t in load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("value", "event_type")
        .collect()
    ]
    lo, hi = min(x for x, _ in data), max(x for x, _ in data)
    thetas = [lo + (k * (hi - lo)) // (ADA_BINS + 1) for k in range(1, ADA_BINS + 1)]
    w = [1.0] * len(data)
    for r in rows:
        best = None
        tot = sum(w)
        for th in thetas:
            for p in (1, -1):
                mis = sum(
                    wi
                    for wi, (x, y) in zip(w, data)
                    if (p if x <= th else -p) != y
                )
                eps = round(mis / tot, 9)
                key = (eps, th, p)
                if best is None or key < best:
                    best = key
        eps, th, p = best
        eps = min(max(eps, ADA_EPS_CLAMP), 1 - ADA_EPS_CLAMP)
        alpha = round(0.5 * _m.log((1 - eps) / eps), 9)
        assert (r.theta, r.polarity) == (th, p), r
        assert abs(r.eps_r9 - eps) < 1e-8 and abs(r.alpha_r9 - alpha) < 1e-8
        w = [
            wi * _m.exp(-alpha * y * (p if x <= th else -p))
            for wi, (x, y) in zip(w, data)
        ]


def test_f1_sweep_counts_consistent(spark, sf_dir):
    from job_market_research_spark.ml.evaluate import (
        F1_GRID,
        q_ml_threshold_tune_f1,
    )

    rows = q_ml_threshold_tune_f1(spark, sf_dir).collect()
    assert len(rows) == F1_GRID
    n_pos = rows[0].tp + rows[0].fn
    for r in rows:
        assert r.tp + r.fn == n_pos, "positives must be threshold-invariant"
        denom = 2 * r.tp + r.fp + r.fn
        expect = 0.0 if denom == 0 else round(2.0 * r.tp / denom, 6)
        assert abs(r.f1_r6 - expect) < 1e-9
    # thresholds ascend; tp is non-increasing as threshold rises
    thetas = [r.theta_r6 for r in rows]
    assert thetas == sorted(thetas)
    tps = [r.tp for r in rows]
    assert all(a >= b for a, b in zip(tps, tps[1:]))


def test_changepoint_minimizes_sse_vs_python_scan(spark, sf_dir):
    from job_market_research_spark.plans.timeseries import (
        q_window_changepoint_detect,
    )

    rows = q_window_changepoint_detect(spark, sf_dir).collect()
    assert rows
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r["count"]))
    for r in rows:
        xs = [n for _, n in sorted(series[r.event_type])]
        days = [d for d, _ in sorted(series[r.event_type])]
        best = None
        sq, tot, m = sum(x * x for x in xs), sum(xs), len(xs)
        pre = 0
        for i in range(1, m):
            pre += xs[i - 1]
            sse = round(sq - pre * pre / i - (tot - pre) ** 2 / (m - i), 6)
            key = (sse, days[i - 1])
            if best is None or key < best:
                best = key
        assert (r.sse_r6, r.split_day) == best, r.event_type


def test_stream_cms_matches_batch_grid_and_bounds(spark, sf_dir):
    """The batch-split-merged CMS grid must estimate every probed key
    identically to a single-pass batch grid (cell addition is the
    merge), and the CMS one-sided error contract must hold."""
    from job_market_research_spark.operators.skew import (
        CMS_DEPTH,
        cms_bucket,
    )
    from job_market_research_spark.streaming.bitmaps import q_stream_cms_topk

    rows = q_stream_cms_topk(spark, sf_dir).collect()
    assert rows
    batch_grid = {
        (r.d, r.b): r.c
        for r in (
            load(spark, sf_dir, "events")
            .select(F.col("user_id").cast("string").alias("u"))
            .select(
                "u",
                F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias(
                    "d"
                ),
            )
            .select("d", cms_bucket(F.col("d"), F.col("u")).alias("b"))
            .groupBy("d", "b")
            .agg(F.count("*").alias("c"))
            .collect()
        )
    }
    cells = (
        spark.createDataFrame(
            [(str(r.user_id),) for r in rows], "u string"
        )
        .select(
            "u",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
        )
        .select("u", "d", cms_bucket(F.col("d"), F.col("u")).alias("b"))
        .collect()
    )
    by_user = {}
    for c in cells:
        by_user.setdefault(c.u, []).append(batch_grid[(c.d, c.b)])
    for r in rows:
        assert r.cms_est >= r.true_n  # one-sided error, always
        # the streamed estimate equals the single-pass batch-grid min
        assert r.cms_est == min(by_user[str(r.user_id)]), r


def test_rocchio_prf_expands_and_stays_grounded(spark, sf_dir):
    """Expansion terms come from the feedback docs, exclude the
    original query, and the final ranking still contains term-bearing
    docs only."""
    from job_market_research_spark.ml.ir import (
        BM25_TERMS,
        PRF_TOP_K,
        q_ir_rocchio_prf,
        q_text_bm25_topk,
    )

    rows = q_ir_rocchio_prf(spark, sf_dir).collect()
    assert 0 < len(rows) <= PRF_TOP_K
    scores = [r.bm25_prf for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # PRF can only re-rank/add docs scored by SOME query or expansion
    # term; the original-term top-k must stay heavily represented
    base = {r.doc_id for r in q_text_bm25_topk(spark, sf_dir).collect()}
    overlap = base & {r.doc_id for r in rows}
    assert overlap, "expanded ranking lost every original top doc"
    # determinism
    again = q_ir_rocchio_prf(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_priority_sampling_estimator_identities(spark, sf_dir):
    """Duffield-Lund-Thorup invariants: K items sampled (or the whole
    population when it is smaller), every HT weight >= the raw weight,
    and the class estimates sum to the global estimate."""
    from job_market_research_spark.ml.sampling import (
        PRI_K,
        q_sample_priority_subset_sum,
    )

    rows = q_sample_priority_subset_sum(spark, sf_dir).collect()
    n_pop = load(spark, sf_dir, "orders").count()
    n_sampled = sum(r.n_sampled for r in rows)
    assert n_sampled == min(PRI_K, n_pop)
    assert all(r.est_total_r4 >= 0 for r in rows)
    total_true = sum(r.true_total for r in rows)
    total_est = sum(r.est_total_r4 for r in rows)
    # unbiased estimator, single draw: within 5x is a smoke sanity
    # bound, not a statistical claim (K=200 of ~n_pop weights)
    assert 0.2 * total_true < total_est < 5 * total_true
    # determinism
    again = q_sample_priority_subset_sum(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_audio_vad_invariants(spark, sf_dir):
    from job_market_research_spark.multimodal.real_media import (
        VAD_FRAMES,
        q_multimodal_audio_vad,
    )

    rows = q_multimodal_audio_vad(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.longest_run <= r.n_active <= VAD_FRAMES
        assert abs(r.active_ratio_r6 - r.n_active / VAD_FRAMES) < 1e-6
    # the uniform-ish synthetic signal is loud: most clips have speech
    assert sum(1 for r in rows if r.n_active > 0) > len(rows) // 2


def test_interval_overlap_bucketized_equals_naive(spark, sf_dir):
    """The replicated-bucket + first-overlap-bucket plan must return
    exactly the naive day-equi join's pairs."""
    from job_market_research_spark.operators.intervals import (
        SWEEP_BUCKET_US,
        q_join_interval_overlap,
    )

    got = {
        r.event_type: (r.n_overlaps, r.total_overlap_us)
        for r in q_join_interval_overlap(spark, sf_dir).collect()
    }
    us = F.unix_micros("ts")
    ev = load(spark, sf_dir, "events")
    a = ev.groupBy(
        "user_id", (us / SWEEP_BUCKET_US).cast("long").alias("d")
    ).agg(F.min(us).alias("lo_a"), F.max(us).alias("hi_a"))
    b = ev.groupBy(
        "event_type", (us / SWEEP_BUCKET_US).cast("long").alias("d")
    ).agg(F.min(us).alias("lo_b"), F.max(us).alias("hi_b"))
    naive = {
        r.event_type: (r.n, r.tot)
        for r in (
            a.join(b, "d")
            .filter(
                (F.col("lo_a") <= F.col("hi_b"))
                & (F.col("lo_b") <= F.col("hi_a"))
            )
            .groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(
                    F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b")
                )
                .cast("long")
                .alias("tot"),
            )
            .collect()
        )
    }
    assert got == naive and got


def test_stream_histogram_quantile_brackets_exact(spark, sf_dir):
    """The merged-histogram quantile interval must bracket the exact
    order-statistic quantile (sketch error <= one bin width)."""
    from job_market_research_spark.streaming.bitmaps import (
        q_stream_histogram_quantile,
    )

    rows = q_stream_histogram_quantile(spark, sf_dir).collect()
    assert len(rows) == 3
    import numpy as np

    vals = np.sort(
        np.array(
            [
                r.value
                for r in load(spark, sf_dir, "events")
                .select("value")
                .collect()
                if r.value is not None
            ]
        )
    )
    for r in rows:
        exact = vals[min(int(np.ceil(r.q * len(vals))) - 1, len(vals) - 1)]
        assert r.est_lo_r6 <= exact <= r.est_hi_r6, (r, exact)
