"""Semantic checks for the round-5 IR / graph / anomaly / RP ops.

Oracle parity is covered by test_oracle_parity's auto-parametrization;
these tests pin the SEMANTICS: BM25 ranks term-bearing docs, BPE pairs
really are adjacent bigrams, the oriented triangle count equals a
naive all-triples count, the RP re-rank recovers the brute-force
top-k, and every flagged anomaly clears the z threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.graph import q_graph_triangle_count
from job_market_research_spark.ml.ir import (
    BM25_TERMS,
    BM25_TOP_K,
    BPE_TOP_PAIRS,
    q_text_bm25_topk,
    q_text_bpe_pair_counts,
)
from job_market_research_spark.ml.similarity import (
    RP_CANDIDATES,
    TOP_K,
    q_ann_cosine_topk,
    q_ann_rp_rerank,
)
from job_market_research_spark.plans.events_analytics import (
    ZS_MIN_N,
    ZS_THRESHOLD,
    q_window_zscore_anomaly,
)


def test_bm25_scores_only_term_bearing_docs(spark, duck, sf_dir):
    rows = q_text_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    # scores strictly positive and non-increasing
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # every returned doc contains at least one probe term
    terms = set(BM25_TERMS)
    ids = [r.doc_id for r in rows]
    texts = dict(
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "text")
        .collect()
    )
    for d in ids:
        assert terms & set(texts[d].split()), d


def test_bpe_pairs_are_adjacent_bigrams(spark, duck, sf_dir):
    rows = q_text_bpe_pair_counts(spark, sf_dir).collect()
    assert 0 < len(rows) <= BPE_TOP_PAIRS
    assert all(len(r.pair) == 2 for r in rows)
    # hand-check one pair against a direct corpus recount in DuckDB
    pair, n = rows[0].pair, rows[0].n
    (expect,) = duck.execute(
        """
        SELECT COALESCE(SUM(hits), 0) FROM (
          SELECT (len(t) - len(replace(t, ?, ''))) // 2 AS hits
          FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        )
        """,
        [pair],
    ).fetchone()
    # replace-based recount misses overlapping occurrences (e.g. 'aaa'
    # has two 'aa' pairs but one non-overlapping replace hit), so it
    # is a lower bound.
    assert n >= expect > 0, (pair, n, expect)


def test_triangle_count_matches_naive_all_triples(spark, duck, sf_dir):
    row = q_graph_triangle_count(spark, sf_dir).collect()[0]
    (naive,) = duck.execute(
        """
        WITH docs AS (SELECT doc_id FROM documents),
        n AS (SELECT COUNT(*) AS n FROM docs),
        raw AS (
          SELECT doc_id AS src, (doc_id * 7 + k) % (SELECT n FROM n) AS dst
          FROM docs, unnest(generate_series(1, 3)) AS t(k)
        ),
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        )
        SELECT COUNT(*) FROM und e1
        JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
        """
    ).fetchone()
    assert row.n_triangles == naive
    assert row.n_edges > 0


def test_rp_rerank_recall_vs_brute_force(spark, sf_dir):
    brute = {r.vec_id for r in q_ann_cosine_topk(spark, sf_dir).collect()}
    rp = {r.vec_id for r in q_ann_rp_rerank(spark, sf_dir).collect()}
    assert brute
    # 32 splitmix64-seeded ±1 projections preserve enough geometry
    # that the exact re-rank of RP_CANDIDATES recovers at least half
    # the true top-k (deterministic on this corpus: 9/10 at sf0.001,
    # 7/10 at sf0.01; a projection regression drops it to
    # near-random ≈ TOP_K * CAND / N).
    assert len(brute & rp) >= len(brute) // 2, (brute, rp)
    assert len(rp) <= TOP_K
    n_corpus = load(spark, sf_dir, "embeddings").count()
    assert RP_CANDIDATES < n_corpus  # candidate budget prunes the corpus


def test_zscore_anomalies_clear_threshold(spark, sf_dir):
    rows = q_window_zscore_anomaly(spark, sf_dir).collect()
    assert rows, "no anomalies flagged at smoke scale"
    assert all(abs(r.z) > ZS_THRESHOLD for r in rows)
    # flagged events are a strict subset of the corpus, and each user
    # flagging anomalies has at least ZS_MIN_N + 1 events (the window
    # needs ZS_MIN_N predecessors before it can score anything)
    ev = load(spark, sf_dir, "events")
    per_user = dict(
        ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    )
    for r in rows:
        assert per_user[r.user_id] >= ZS_MIN_N + 1


def test_pmi_pairs_meet_min_count_and_positive(spark, sf_dir):
    from job_market_research_spark.ml.ir import (
        PMI_MIN_COUNT,
        PMI_TOP,
        q_text_pmi_collocations,
    )

    rows = q_text_pmi_collocations(spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_TOP
    assert all(r.cxy >= PMI_MIN_COUNT for r in rows)
    # top collocation is positively associated (observed > chance)
    assert rows[0].pmi > 0
    # output is sorted by pmi desc
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_lpa_communities_partition_the_graph(spark, sf_dir):
    from job_market_research_spark.io import load
    from job_market_research_spark.ml.graph import q_graph_label_propagation

    rows = q_graph_label_propagation(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert rows
    # top-20 community sizes are positive and cannot exceed the corpus
    assert all(0 < r.size <= n_docs for r in rows)
    assert sum(r.size for r in rows) <= n_docs
    # propagation actually merged labels: fewer communities than nodes
    assert rows[0].size > 1


def test_mv_refresh_equals_full_recompute(spark, sf_dir):
    from job_market_research_spark.io import load
    from job_market_research_spark.operators.matview import (
        q_mv_incremental_refresh,
    )

    merged = {
        (r.event_type, r.day): (r.n, r.total)
        for r in q_mv_incremental_refresh(spark, sf_dir).collect()
    }
    full = {
        (r.event_type, r.day): (r.n, r.total)
        for r in (
            load(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.col("value").cast("decimal(28,10)"))
                .cast("double")
                .alias("total"),
            )
            .collect()
        )
    }
    assert merged == full


def test_curriculum_phases_balanced_and_deterministic(spark, sf_dir):
    from job_market_research_spark.ml.sampling import q_sample_curriculum_order

    rows = q_sample_curriculum_order(spark, sf_dir).collect()
    assert {r.phase for r in rows} <= {1, 2, 3, 4}
    n = len(rows)
    from collections import Counter

    sizes = Counter(r.phase for r in rows)
    # quartile split: each phase holds a substantial share (ties can
    # unbalance the exact quarters, but never collapse a phase)
    assert all(sizes[p] >= n * 0.1 for p in sizes), sizes
    # deterministic: re-running yields the identical schedule
    again = q_sample_curriculum_order(spark, sf_dir).collect()
    assert [(r.doc_id, r.phase, r.shuffle_key) for r in rows] == [
        (r.doc_id, r.phase, r.shuffle_key) for r in again
    ]


def test_sliding_dau_bounds(spark, sf_dir):
    from job_market_research_spark.io import load
    from job_market_research_spark.plans.events_analytics import (
        SLIDE_DAYS,
        q_agg_sliding_distinct_users,
    )

    rows = q_agg_sliding_distinct_users(spark, sf_dir).collect()
    assert rows
    ev = load(spark, sf_dir, "events")
    daily = dict(
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    )
    total_users = ev.select("user_id").distinct().count()
    col = f"dau_{SLIDE_DAYS}d"
    for r in rows:
        v = r[col]
        # window count >= that single day's count, <= corpus users
        assert daily.get(r.day, 0) <= v <= total_users, r


def test_event_transitions_probabilities_sum_to_one(spark, sf_dir):
    from collections import defaultdict

    from job_market_research_spark.plans.events_analytics import (
        q_agg_event_transitions,
    )

    rows = q_agg_event_transitions(spark, sf_dir).collect()
    assert rows
    by_prev = defaultdict(float)
    for r in rows:
        assert 0 < r.p <= 1
        by_prev[r.prev_type] += r.p
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)


def test_entropy_normalized_in_unit_interval(spark, sf_dir):
    from job_market_research_spark.operators.quality import (
        q_profile_column_entropy,
    )

    rows = q_profile_column_entropy(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_distinct > 1
        assert 0 <= r.entropy
        assert 0 <= r.norm_entropy <= 1 + 1e-9, r


def test_tscv_folds_expand_and_never_leak(spark, sf_dir):
    from job_market_research_spark.io import load
    from job_market_research_spark.ml.sampling import (
        TSCV_FOLDS,
        q_sample_time_series_cv,
    )

    rows = q_sample_time_series_cv(spark, sf_dir).collect()
    assert len(rows) == TSCV_FOLDS
    n_events = load(spark, sf_dir, "events").count()
    prev_train = 0
    for r in sorted(rows, key=lambda r: r.fold):
        # expanding window: each fold trains on strictly more data
        assert r.n_train > prev_train
        assert r.n_test > 0
        assert r.n_train + r.n_test <= n_events
        prev_train = r.n_train


def test_pq_recall_vs_brute_force(spark, sf_dir):
    from job_market_research_spark.ml.similarity import (
        PQ_CANDIDATES,
        q_ann_pq_topk,
    )

    brute = {r.vec_id for r in q_ann_cosine_topk(spark, sf_dir).collect()}
    pq = {r.vec_id for r in q_ann_pq_topk(spark, sf_dir).collect()}
    assert brute
    # ADC over an 8x16 codebook + exact re-rank of PQ_CANDIDATES must
    # recover at least half the true top-k on this corpus
    assert len(brute & pq) >= len(brute) // 2, (brute, pq)
    n_corpus = load(spark, sf_dir, "embeddings").count()
    assert PQ_CANDIDATES < n_corpus


def test_kcore_counts_monotone_and_cascading(spark, sf_dir):
    from job_market_research_spark.ml.graph import (
        KCORE_ROUNDS,
        q_graph_kcore_peel,
    )

    rows = sorted(
        q_graph_kcore_peel(spark, sf_dir).collect(), key=lambda r: r.round
    )
    assert len(rows) == KCORE_ROUNDS + 1
    counts = [r.n_alive for r in rows]
    # peeling is monotone non-increasing and the first round removes
    # the planted sub-K nodes
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[1] < counts[0], counts


def test_phash_clusters_are_real_duplicates(spark, sf_dir):
    """Every reported cluster's representative must share its exact
    aHash with cluster_size-1 other images, and re-hashing the
    representative through the REAL codec path reproduces the bands."""
    from job_market_research_spark.multimodal.real_media import (
        PHASH_SCHEMA,
        _ahash_bands,
        q_multimodal_phash_cluster,
    )

    clusters = q_multimodal_phash_cluster(spark, sf_dir).collect()
    assert clusters, "no perceptual-duplicate clusters at smoke scale"
    docs = load(spark, sf_dir, "documents").select("doc_id")
    hashes = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in docs.mapInPandas(_ahash_bands, schema=PHASH_SCHEMA).collect()
    }
    from collections import Counter

    sizes = Counter(hashes.values())
    for c in clusters:
        key = (c.b0, c.b1, c.b2, c.b3)
        assert sizes[key] == c.cluster_size, c
        assert hashes[c.rep_doc_id] == key
        assert all(0 <= b < 1 << 16 for b in key)


def test_rolling_median_is_robust_to_window_outliers(spark, sf_dir):
    from job_market_research_spark.plans.events_analytics import (
        q_window_rolling_median,
        q_window_zscore_anomaly,
    )

    med = q_window_rolling_median(spark, sf_dir).collect()
    assert med
    # medians land inside the observed global value range
    vals = load(spark, sf_dir, "events").agg(
        F.min("value"), F.max("value")
    ).collect()[0]
    assert all(vals[0] <= r.med <= vals[1] for r in med)


def test_value_histogram_partitions_the_type(spark, sf_dir):
    from collections import defaultdict

    from job_market_research_spark.plans.events_analytics import (
        HIST_BINS,
        q_agg_value_histogram,
    )

    rows = q_agg_value_histogram(spark, sf_dir).collect()
    per_type = defaultdict(int)
    for r in rows:
        assert 0 <= r.bin < HIST_BINS
        per_type[r.event_type] += r.n
    totals = dict(
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert per_type == totals  # every event lands in exactly one bin


def test_interarrival_percentiles_ordered(spark, sf_dir):
    from job_market_research_spark.plans.events_analytics import (
        q_agg_interarrival_stats,
    )

    rows = q_agg_interarrival_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert 0 <= r.p50_gap_s <= r.p90_gap_s
        assert r.avg_gap_s > 0


def test_l_diversity_histogram_covers_all_groups(spark, sf_dir):
    from job_market_research_spark.operators.quality import (
        q_privacy_l_diversity,
    )

    rows = q_privacy_l_diversity(spark, sf_dir).collect()
    assert rows
    orders = load(spark, sf_dir, "orders")
    n_groups = (
        orders.select("o_orderpriority", F.year("o_orderdate")).distinct().count()
    )
    assert sum(r.n_groups for r in rows) == n_groups
    assert sum(r.n_rows for r in rows) == orders.count()
    n_statuses = orders.select("o_orderstatus").distinct().count()
    assert all(1 <= r.l <= n_statuses for r in rows)


def test_skyline_is_exactly_the_nondominated_set(spark, duck, sf_dir):
    """Cross-check the grid-pruned skyline against the O(n²)
    NOT-EXISTS definition in DuckDB."""
    from job_market_research_spark.plans.windows_analytic import (
        q_window_skyline_pareto,
    )

    got = {
        (r.o_orderkey) for r in q_window_skyline_pareto(spark, sf_dir).collect()
    }
    naive = {
        r[0]
        for r in duck.execute(
            """
            WITH pts AS (
              SELECT o_orderkey, o_totalprice AS price, o_orderdate AS d
              FROM orders WHERE o_orderkey % 10 = 0
            )
            SELECT p.o_orderkey FROM pts p
            WHERE NOT EXISTS (
              SELECT 1 FROM pts q
              WHERE q.price > p.price AND q.d > p.d
            )
            """
        ).fetchall()
    }
    assert got == naive
    assert 0 < len(got) < duck.execute(
        "SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 0"
    ).fetchone()[0]


def test_ols_matches_numpy_polyfit(spark, sf_dir):
    import numpy as np

    from job_market_research_spark.ml.clustering import q_ml_ols_closed_form

    rows = q_ml_ols_closed_form(spark, sf_dir).collect()
    assert rows
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", F.hour("ts").alias("x"), "value")
        .collect()
    )
    from collections import defaultdict

    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append((r.x, r.value))
    for r in rows:
        xs, ys = zip(*by_type[r.event_type])
        b, a = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
        assert abs(r.slope - b) < 1e-4, (r.event_type, r.slope, b)
        assert abs(r.intercept - a) < 1e-3, (r.event_type, r.intercept, a)
        assert 0 <= r.r2 <= 1


def test_schema_evolution_covers_both_generations(spark, sf_dir):
    from job_market_research_spark.sources.readers import (
        q_scan_schema_evolution,
    )

    rows = {r.channel: r.n for r in q_scan_schema_evolution(spark, sf_dir).collect()}
    n_orders = load(spark, sf_dir, "orders").count()
    # unknown = the old generation (no channel column); web+store = new
    assert set(rows) == {"unknown", "web", "store"}
    assert sum(rows.values()) == n_orders


def test_audience_overlap_is_symmetric_truth(spark, duck, sf_dir):
    from job_market_research_spark.plans.events_analytics import (
        q_agg_audience_overlap,
    )

    rows = q_agg_audience_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b  # canonical pair order, no dupes
        assert 0 <= r.n_both <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard <= 1
    # one pair hand-checked against a direct intersection count
    r0 = rows[0]
    (expect,) = duck.execute(
        """
        SELECT COUNT(*) FROM (
          SELECT DISTINCT user_id FROM events WHERE event_type = ?
          INTERSECT
          SELECT DISTINCT user_id FROM events WHERE event_type = ?
        )
        """,
        [r0.type_a, r0.type_b],
    ).fetchone()
    assert r0.n_both == expect


def test_audio_fingerprint_clusters_share_profiles(spark, sf_dir):
    from job_market_research_spark.multimodal.real_media import (
        AUDIO_FP_MAX_DOC,
        AUDIO_FP_SCHEMA,
        _audio_fingerprint,
        q_multimodal_audio_fingerprint,
    )

    clusters = q_multimodal_audio_fingerprint(spark, sf_dir).collect()
    assert clusters, "no audio fingerprint clusters at smoke scale"
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < AUDIO_FP_MAX_DOC)
        .select("doc_id")
    )
    fps = {
        r.doc_id: r.fp
        for r in docs.mapInPandas(
            _audio_fingerprint, schema=AUDIO_FP_SCHEMA
        ).collect()
    }
    from collections import Counter

    sizes = Counter(fps.values())
    for c in clusters:
        assert sizes[c.fp] == c.cluster_size
        assert fps[c.rep_doc_id] == c.fp


def test_gini_in_unit_interval_and_matches_numpy(spark, sf_dir):
    import numpy as np

    from job_market_research_spark.plans.events_analytics import (
        q_agg_gini_concentration,
    )

    rows = q_agg_gini_concentration(spark, sf_dir).collect()
    assert rows
    vals = load(spark, sf_dir, "events").select("event_type", "value").collect()
    from collections import defaultdict

    by_type = defaultdict(list)
    for r in vals:
        by_type[r.event_type].append(r.value)
    for r in rows:
        y = np.sort(np.array(by_type[r.event_type]))
        n = len(y)
        expect = 2 * np.sum(np.arange(1, n + 1) * y) / (n * y.sum()) - (n + 1) / n
        assert abs(r.gini - expect) < 1e-4, (r.event_type, r.gini, expect)
        assert 0 <= r.gini < 1


def test_naive_bayes_confusion_covers_corpus(spark, sf_dir):
    from job_market_research_spark.ml.clustering import q_ml_naive_bayes_lang

    rows = q_ml_naive_bayes_lang(spark, sf_dir).collect()
    assert rows
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    assert sum(r.n for r in rows) == n_docs
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    for r in rows:
        assert r.actual in langs and r.predicted in langs


def test_scd2_pointintime_attributes_history_correctly(spark, sf_dir):
    """Pre-1995 orders of PROMO-updated customers must carry their
    ORIGINAL segment — the misattribution an overwriting warehouse
    makes, pinned as a test."""
    from job_market_research_spark.operators.scd import (
        q_join_scd2_pointintime,
    )

    rows = q_join_scd2_pointintime(spark, sf_dir).collect()
    assert rows
    promo_years = {r.order_year for r in rows if r.segment_at_order_time == "PROMO"}
    assert promo_years and min(promo_years) >= 1995
    total = sum(r.n_orders for r in rows)
    assert total == load(spark, sf_dir, "orders").count()


def test_rfm_segments_partition_customers(spark, sf_dir):
    from job_market_research_spark.plans.analytics import (
        q_agg_rfm_segmentation,
    )

    rows = q_agg_rfm_segmentation(spark, sf_dir).collect()
    assert rows
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert all(r.r_hi in (0, 1) and r.f_hi in (0, 1) and r.m_hi in (0, 1) for r in rows)
    # the high-high-high segment out-spends the low-low-low one
    seg = {(r.r_hi, r.f_hi, r.m_hi): r.avg_monetary for r in rows}
    if (1, 1, 1) in seg and (0, 0, 0) in seg:
        assert seg[(1, 1, 1)] > seg[(0, 0, 0)]


def test_basket_affinity_nonempty_and_valid(spark, sf_dir):
    from job_market_research_spark.plans.analytics import (
        BASKET_MIN_SUPPORT,
        q_agg_basket_affinity,
    )

    rows = q_agg_basket_affinity(spark, sf_dir).collect()
    assert rows, "no part pairs above the support floor at smoke scale"
    for r in rows:
        assert r.part_a < r.part_b
        assert r.s_ab >= BASKET_MIN_SUPPORT
        assert r.lift > 0


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """The distributed trainer must reproduce a pure-Python BPE
    reference (greedy left-to-right merge, (count desc, pair asc)
    tie-break) on the same word-frequency table."""
    import re
    from collections import Counter

    from pyspark.sql import functions as F

    from job_market_research_spark.io import load
    from job_market_research_spark.ml.ir import BPE_ROUNDS, q_text_bpe_train_merges

    docs = load(spark, sf_dir, "documents").select("text").collect()
    freq = Counter()
    for r in docs:
        for w in re.split(r"[^a-z]+", r["text"].lower()):
            if w:
                freq[w] += 1
    vocab = {w: list(w) for w in freq}
    expected = []
    for _ in range(BPE_ROUNDS):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq[w]
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        expected.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    got = q_text_bpe_train_merges(spark, sf_dir).collect()
    assert [
        (r["merge_left"], r["merge_right"], r["support"]) for r in got
    ] == expected


def test_logreg_newton_matches_numpy_two_steps(spark, sf_dir):
    import numpy as np

    from job_market_research_spark.ml.clustering import q_ml_logreg_newton

    rows = q_ml_logreg_newton(spark, sf_dir).collect()
    assert rows
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    from collections import defaultdict

    by_flag = defaultdict(list)
    for r in li:
        by_flag[r.l_returnflag].append(
            (1.0 if r.l_quantity > 25 else 0.0, r.l_extendedprice / 10000.0)
        )
    for r in rows:
        y, u = map(np.array, zip(*by_flag[r.l_returnflag]))
        X = np.column_stack([np.ones_like(u), u])
        beta = np.zeros(2)
        for _ in range(2):
            p = 1.0 / (1.0 + np.exp(-(X @ beta)))
            w = p * (1 - p)
            H = X.T @ (X * w[:, None])
            beta = beta + np.linalg.solve(H, X.T @ (y - p))
        # our sigmoid is quantized to 6 decimals before the weighted
        # moments; the fitted betas agree to ~1e-3
        assert abs(r.b0_r6 - beta[0]) < 1e-3, (r.l_returnflag, r.b0_r6, beta)
        assert abs(r.b1_r6 - beta[1]) < 1e-3


def test_ks_two_sample_matches_numpy_ecdf(spark, sf_dir):
    import numpy as np

    from job_market_research_spark.plans.robust_stats import (
        q_stat_ks_two_sample,
    )

    row = q_stat_ks_two_sample(spark, sf_dir).first()
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).collect()
    a = np.sort([r.c_acctbal for r in cust if r.c_custkey % 2 == 0])
    b = np.sort([r.c_acctbal for r in cust if r.c_custkey % 2 == 1])
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    d = np.max(np.abs(f1 - f2))
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert abs(row["ks_d_r6"] - d) < 1e-6
    # the reported argmax value really achieves the max gap
    i = np.searchsorted(grid, row["at_value"])
    assert abs(abs(f1[i] - f2[i]) - d) < 1e-12


def test_hill_estimator_matches_numpy_order_stats(spark, sf_dir):
    import numpy as np

    from job_market_research_spark.plans.robust_stats import (
        HILL_K,
        q_agg_hill_tail_index,
    )

    row = q_agg_hill_tail_index(spark, sf_dir).first()
    counts = np.sort(
        np.array(
            load(spark, sf_dir, "events")
            .groupBy("user_id")
            .count()
            .select("count")
            .toPandas()["count"]
        )
    )[::-1]
    nsel = min(HILL_K + 1, len(counts))
    top = counts[:nsel].astype(float)
    k = nsel - 1
    h = float(np.mean(np.log(top[:k]) - np.log(top[k])))
    assert row["k"] == k
    assert row["xk1"] == top[k]
    assert abs(row["hill_h_r6"] - h) < 1e-4
    assert abs(row["tail_alpha_r6"] - 1.0 / h) < 1e-2
    assert row["tail_alpha_r6"] > 0


def test_dp_median_lands_near_true_median(spark, sf_dir):
    from job_market_research_spark.operators.privacy_release import (
        DPM_BINS,
        q_privacy_dp_median,
    )

    row = q_privacy_dp_median(spark, sf_dir).first()
    assert 0 <= row["grid_bin"] < DPM_BINS
    assert -1000.0 <= row["released_median"] <= 10000.0
    # at these n the utility term (eps/4 per rank unit) dominates the
    # bounded Gumbel spread, so the released bin's rank distance to
    # the true median stays within the noise-equivalent band
    bals = sorted(
        r.c_acctbal
        for r in load(spark, sf_dir, "customer").select("c_acctbal").collect()
    )
    n = len(bals)
    assert row["n"] == n
    assert abs(2 * row["n_below"] - n) <= max(200, n // 5)
    # determinism: the seeded mechanism re-releases the same value
    again = q_privacy_dp_median(spark, sf_dir).first()
    assert tuple(row) == tuple(again)


def test_randomized_response_debiasing_tracks_truth(spark, sf_dir):
    from job_market_research_spark.operators.privacy_release import (
        RR_P_TRUTH,
        q_privacy_randomized_response,
    )

    row = q_privacy_randomized_response(spark, sf_dir).first()
    assert 0 <= row["n_reported_true"] <= row["n_users"]
    # debias identity holds exactly on the reported rate
    expect = (row["reported_rate_r6"] - (1 - RR_P_TRUTH)) / (
        2 * RR_P_TRUTH - 1
    )
    assert abs(row["debiased_rate_r6"] - expect) < 2e-6
    # the debiased estimate is within RR sampling noise of truth
    # (4·binomial-σ of the flip process at p=3/4)
    import math

    sigma = 2.0 * math.sqrt(
        RR_P_TRUTH * (1 - RR_P_TRUTH) / row["n_users"]
    ) / (2 * RR_P_TRUTH - 1)
    assert abs(row["debiased_rate_r6"] - row["true_rate_r6"]) <= 4 * sigma


def test_gmm_em_matches_numpy_two_rounds(spark, sf_dir):
    import numpy as np

    from job_market_research_spark.ml.clustering import (
        GMM_MU0,
        GMM_V0,
        q_ml_gmm_em,
    )

    row = q_ml_gmm_em(spark, sf_dir).first()
    x = np.array(
        [
            r.c_acctbal
            for r in load(spark, sf_dir, "customer")
            .select("c_acctbal")
            .collect()
        ]
    )
    pi1, mu, v = 0.5, list(GMM_MU0), [GMM_V0, GMM_V0]
    for _ in range(2):
        z = (
            np.log(pi1 / (1 - pi1))
            - 0.5 * (np.log(v[0]) - np.log(v[1]))
            - (x - mu[0]) ** 2 / (2 * v[0])
            + (x - mu[1]) ** 2 / (2 * v[1])
        )
        r1 = 1.0 / (1.0 + np.exp(-z))
        n1 = r1.sum()
        mu = [float((r1 * x).sum() / n1), float(((1 - r1) * x).sum() / (len(x) - n1))]
        v = [
            max(float((r1 * x * x).sum() / n1 - mu[0] ** 2), 1e-6),
            max(
                float(((1 - r1) * x * x).sum() / (len(x) - n1) - mu[1] ** 2),
                1e-6,
            ),
        ]
        pi1 = float(n1 / len(x))
    assert row["n"] == len(x)
    assert abs(row["pi1_r6"] - pi1) < 1e-3
    assert abs(row["mu1_r6"] - mu[0]) < 1.0  # round-6 responsibilities
    assert abs(row["mu2_r6"] - mu[1]) < 1.0
    assert abs(row["sd1_r6"] - v[0] ** 0.5) < 2.0
    assert abs(row["sd2_r6"] - v[1] ** 0.5) < 2.0
    # init ordering is preserved: component 1 sits below component 2
    assert row["mu1_r6"] < row["mu2_r6"]


def test_mutual_information_matches_numpy_and_is_nonneg(spark, sf_dir):
    import numpy as np

    from job_market_research_spark.plans.robust_stats import (
        MI_DISC_BINS,
        MI_PRICE_BINS,
        q_agg_mutual_information,
    )

    rows = {
        r.feature: r.mi_nats_r6
        for r in q_agg_mutual_information(spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    y = np.array([1 if r.l_quantity > 25 else 0 for r in li])

    def mi(bins):
        joint = {}
        for b, yy in zip(bins, y):
            joint[(b, yy)] = joint.get((b, yy), 0) + 1
        n = len(y)
        px, py = {}, {}
        for (b, yy), c in joint.items():
            px[b] = px.get(b, 0) + c
            py[yy] = py.get(yy, 0) + c
        return sum(
            (c / n) * np.log(c * n / (px[b] * py[yy]))
            for (b, yy), c in joint.items()
        )

    pb = np.array(
        [
            min(max(int(r.l_extendedprice / 120000.0 * MI_PRICE_BINS), 0),
                MI_PRICE_BINS - 1)
            for r in li
        ]
    )
    db = np.array(
        [
            min(max(int(r.l_discount / 0.11 * MI_DISC_BINS), 0),
                MI_DISC_BINS - 1)
            for r in li
        ]
    )
    assert abs(rows["price"] - mi(pb)) < 1e-3
    assert abs(rows["discount"] - mi(db)) < 1e-3
    # MI is non-negative up to the round-6 term quantization
    assert rows["price"] >= -1e-4 and rows["discount"] >= -1e-4
