"""staging.app_staged memo semantics: per-(app, key) identity, build
laziness, and dead-app eviction — tested with stub frames (no Spark
needed for the memo logic) plus one live identity check."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_market_research_spark import staging


class _FakeFrame:
    def __init__(self) -> None:
        self.persisted = False
        self.unpersisted = False

    def persist(self, _level):
        self.persisted = True
        return self

    def unpersist(self):
        self.unpersisted = True
        return self


class _FakeSpark:
    def __init__(self, app_id: str) -> None:
        self.sparkContext = type("SC", (), {"applicationId": app_id})()


def _fresh_cache(monkeypatch):
    cache: dict = {}
    monkeypatch.setattr(staging, "_STAGE_CACHE", cache)
    return cache


def test_same_key_returns_same_persisted_frame(monkeypatch):
    _fresh_cache(monkeypatch)
    spark = _FakeSpark("app-1")
    builds = []

    def build():
        f = _FakeFrame()
        builds.append(f)
        return f

    a = staging.app_staged(spark, ("x", "/sf"), build)
    b = staging.app_staged(spark, ("x", "/sf"), build)
    assert a is b and a.persisted
    assert len(builds) == 1, "memo hit must not rebuild"
    c = staging.app_staged(spark, ("x", "/other"), build)
    assert c is not a and len(builds) == 2, "key includes parameters"


def test_dead_app_entries_are_unpersisted_and_dropped(monkeypatch):
    cache = _fresh_cache(monkeypatch)
    old = staging.app_staged(_FakeSpark("app-old"), ("x", "/sf"), _FakeFrame)
    assert ("app-old", "x", "/sf") in cache
    new = staging.app_staged(_FakeSpark("app-new"), ("x", "/sf"), _FakeFrame)
    assert old.unpersisted, "stopped app's blocks must be released"
    assert ("app-old", "x", "/sf") not in cache
    assert new is not old


def test_unpersist_failure_still_evicts(monkeypatch):
    cache = _fresh_cache(monkeypatch)

    class _Broken(_FakeFrame):
        def unpersist(self):
            raise RuntimeError("context stopped")

    staging.app_staged(_FakeSpark("app-old"), ("x", "/sf"), _Broken)
    staging.app_staged(_FakeSpark("app-new"), ("x", "/sf"), _FakeFrame)
    assert ("app-old", "x", "/sf") not in cache


def test_staged_values_equal_inline_derivation(spark, sf_dir):
    """The staging contract: persist changes the access path, never the
    values. Each staged leg must collect to EXACTLY the rows its inline
    derivation produces (sorted compare; guards against a staged build
    drifting from the semantics its consumers' oracles assume)."""
    from pyspark.sql import functions as F

    from job_market_research_spark.io import load
    from job_market_research_spark.ml.ir import staged_ws_tcounts
    from job_market_research_spark.plans.timeseries import (
        _rev_sum_dec,
        staged_daily_revenue,
    )

    staged = staged_ws_tcounts(spark, sf_dir)
    inline = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    key = lambda r: (r["doc_id"], r["token"])  # noqa: E731
    assert sorted(staged.collect(), key=key) == sorted(
        inline.collect(), key=key
    )

    daily = staged_daily_revenue(spark, sf_dir)
    inline_daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(_rev_sum_dec().alias("v"))
    )
    assert sorted(daily.collect()) == sorted(inline_daily.collect())


def test_live_staged_frames_are_identical_across_calls(spark, sf_dir):
    """The real staged legs return the SAME DataFrame object on every
    call within one app — callers share one persisted materialization."""
    from job_market_research_spark.ml.ir import staged_ws_tcounts
    from job_market_research_spark.ml.neardup import staged_shingles
    from job_market_research_spark.ml.similarity import staged_embeddings

    for fn in (staged_ws_tcounts, staged_shingles, staged_embeddings):
        assert fn(spark, sf_dir) is fn(spark, sf_dir)


def test_round12_staged_frames_value_equal_inline(spark, sf_dir):
    """Value-equality pins for the late-r12 staged legs (iterative
    graph, shared LM scores, basket items): each must collect to
    exactly the rows of its inline derivation."""
    from pyspark.sql import functions as F

    from job_market_research_spark.functions.text import staged_lm_per_doc
    from job_market_research_spark.io import load
    from job_market_research_spark.ml.graph import (
        _undirected_edges,
        staged_und,
    )

    und = staged_und(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    inline_und = _undirected_edges(docs, docs.count())
    assert sorted(map(tuple, und.collect())) == sorted(
        map(tuple, inline_und.collect())
    )

    per_doc = staged_lm_per_doc(spark, sf_dir)
    tok = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("c"))
    stats = tok.agg(
        (F.count("*") + F.countDistinct("token"))
        .cast("double")
        .alias("__n_plus_v")
    )
    neg_logp = -F.log((F.col("c") + 1).cast("double") / F.col("__n_plus_v"))
    inline_pd = (
        tok.join(F.broadcast(counts), "token")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", neg_logp.alias("neg_logp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("neg_logp") / F.count("*"), 6).alias(
                "avg_neg_logp"
            ),
        )
    )
    assert sorted(map(tuple, per_doc.collect())) == sorted(
        map(tuple, inline_pd.collect())
    )


def test_staged_und_does_not_cache_substitute_wedge_queries(spark, sf_dir):
    """Regression pin for the cache-substitution hazard: Spark's cache
    manager swaps a persisted plan into ANY query whose analyzed
    subtree matches it, so the single-pass wedge queries (measured
    1.4-1.7x slower from cache) would silently reroute through
    staged_und once a sibling staged it — unless the staged build
    carries the repartition marker that makes its plan non-identical.
    Stage the edge table, then assert the wedge plans still contain
    zero InMemoryTableScan nodes."""
    from job_market_research_spark.ml.graph import staged_und
    from job_market_research_spark.registry import load_all

    staged_und(spark, sf_dir).count()  # materialize the cache entry
    specs = load_all()
    for name in (
        "graph_triangle_count",
        "graph_link_prediction",
        "graph_assortativity",
        "graph_clustering_coeff",
    ):
        plan = (
            specs[name]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "InMemoryTableScan" not in plan, (
            f"{name} was cache-substituted onto staged_und — "
            "the repartition marker in staged_und's build is gone"
        )
