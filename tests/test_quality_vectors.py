"""Semantics tests for the round-4 operators: expectation gates, CDC
diff classification, bloom pruning bounds, quantization range, span
planting. Parity with the oracle is covered by test_oracle_parity; these
pin the SEMANTIC claims the docstrings make."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.operators.bloom import (
    BLOOM_M,
    bloom_bits,
    bloom_prune,
    q_join_bloom_prune,
)
from job_market_research_spark.operators.quality import (
    q_validate_expectations,
    snapshot_diff,
)
from job_market_research_spark.ml.vectors import q_ann_quantize_int8


def test_expectation_suite_passes_on_clean_data(spark, sf_dir):
    rows = {r["rule"]: r for r in q_validate_expectations(spark, sf_dir).collect()}
    assert len(rows) == 5
    # TPC-H-shaped testdata satisfies every declared expectation
    for rule, r in rows.items():
        assert r["passed"], f"{rule}: {r['violations']} violations"
        assert r["violations"] == 0


def test_expectation_suite_catches_planted_violations(spark):
    bad = spark.createDataFrame(
        [(1, 10, "O"), (1, 20, "O"), (2, 30, "X")],
        "o_orderkey long, o_custkey long, o_orderstatus string",
    )
    dup = bad.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("violations")
    ).first()["violations"]
    dom = bad.filter(~F.col("o_orderstatus").isin("O", "F", "P")).count()
    assert dup == 1 and dom == 1


def test_snapshot_diff_classifies_ops(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 25.0), (3, None), (4, 40.0), (5, 50.0)], "k long, v double"
    )
    got = {
        r["k"]: r["op"]
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    # 1 deleted, 2 updated, 5 inserted; 3 (null==null) and 4 unchanged
    assert got == {1: "D", 2: "U", 5: "I"}


def test_bloom_prune_superset_of_matches_and_bounded(spark, sf_dir):
    rows = {r["stage"]: r["n"] for r in q_join_bloom_prune(spark, sf_dir).collect()}
    assert rows["true_matches"] <= rows["bloom_candidates"] <= rows["probe_total"]
    # no false negatives: every true match survives the prune (already
    # implied by true_matches being counted FROM candidates — pin it
    # independently against a direct semi-join)
    from job_market_research_spark.io import load

    build = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    probe = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    direct = probe.join(build.distinct(), "k", "left_semi").count()
    assert rows["true_matches"] == direct


def test_bloom_bits_bounded_by_m(spark, sf_dir):
    from job_market_research_spark.io import load

    build = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    bits = bloom_bits(build, "k")
    n = bits.count()
    assert n <= BLOOM_M
    assert bits.agg(F.max("bit")).first()[0] < BLOOM_M
    # pruning with the full-table filter keeps everything (no false negatives)
    probe = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    assert bloom_prune(probe, "k", bits).count() == probe.count()


def test_quantize_int8_codes_in_range(spark, sf_dir):
    q = q_ann_quantize_int8(spark, sf_dir)
    stats = q.agg(
        F.min("q").alias("lo"), F.max("q").alias("hi"), F.count("*").alias("n")
    ).first()
    assert stats["n"] > 0
    assert -127 <= stats["lo"] and stats["hi"] <= 127
    # every vector attains at least one full-scale code (|q| == 127)
    # unless it is all-zero: max|x| maps to exactly 127
    full_scale = q.filter(F.abs("q") == 127).select("vec_id").distinct().count()
    vecs = q.select("vec_id").distinct().count()
    zero_vecs = q.groupBy("vec_id").agg(F.max(F.abs("q")).alias("m")).filter(
        F.col("m") == 0
    ).count()
    assert full_scale == vecs - zero_vecs


def test_span_ngram_finds_planted_boilerplate(spark, sf_dir):
    from job_market_research_spark.functions.corpus import (
        SPAN_N,
        _PLANT,
        q_dedup_span_ngram,
    )

    got = q_dedup_span_ngram(spark, sf_dir)
    plant_tokens = _PLANT.split(" ")
    first_gram = " ".join(plant_tokens[:SPAN_N])
    row = got.filter(F.col("gram") == first_gram).first()
    assert row is not None, "planted boilerplate span not detected"
    assert row["n_docs"] >= 2


def test_bloom_prune_plan_is_broadcast_semi(spark, sf_dir):
    plan = (
        q_join_bloom_prune(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the might_contain test must stay broadcast (never shuffle the probe)
    assert plan.count("BroadcastHashJoin") >= 4  # 3 bit-tests + exact semi
    assert "SortMergeJoin" not in plan


def test_snapshot_diff_roundtrip_reconstructs_new(spark, sf_dir):
    """Applying the I/U/D changeset to the old snapshot must reproduce
    the new snapshot exactly — the invariant that makes the diff safe
    to ship instead of the full table."""
    from job_market_research_spark.io import load
    from job_market_research_spark.operators.quality import snapshot_diff

    cust = load(spark, sf_dir, "customer")
    old = cust.select("c_custkey", "c_acctbal")
    new = (
        cust.filter(F.col("c_custkey") % 7 != 0)
        .select(
            F.when(F.col("c_custkey") % 11 == 0, F.col("c_custkey") + 10000000)
            .otherwise(F.col("c_custkey"))
            .alias("c_custkey"),
            F.when(F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
    )
    diff = snapshot_diff(old, new, "c_custkey", ["c_acctbal"])
    deletes = diff.filter(F.col("op") == "D").select("c_custkey")
    upserts = diff.filter(F.col("op").isin("I", "U")).select(
        "c_custkey", F.col("new_c_acctbal").alias("c_acctbal")
    )
    rebuilt = (
        old.join(diff.select("c_custkey"), "c_custkey", "left_anti")
        .unionByName(upserts)
        .join(deletes, "c_custkey", "left_anti")
    )
    assert rebuilt.count() == new.count()
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_excise_spans_cuts_plant_keeps_canonical(spark, sf_dir):
    from job_market_research_spark.functions.corpus import (
        _PLANT,
        q_dedup_excise_spans,
    )

    got = q_dedup_excise_spans(spark, sf_dir)
    edited = {r["doc_id"]: r for r in got.collect()}
    planted = [d for d in edited if d % 23 == 0]
    # every planted doc except the canonical first occurrence loses at
    # least the 10 plant tokens; the rebuilt text no longer ends in the
    # boilerplate sentence
    assert len(planted) >= 2
    assert 0 not in planted or edited[0]["n_removed"] < 10  # doc 0 is canon
    for d in planted:
        if d == 0:
            continue
        assert edited[d]["n_removed"] >= 10
        assert not edited[d]["kept_text"].endswith(_PLANT)
        assert (
            edited[d]["n_total"]
            == edited[d]["n_kept"] + edited[d]["n_removed"]
        )
