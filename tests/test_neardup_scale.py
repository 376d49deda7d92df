"""Scale-hardening invariants for the near-dup family.

These tests pin the round-2 hardening: bounded candidate generation
(df-capped inverted index, simhash fingerprint banding) and stable
executor storage across connected-components iterations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.ml.neardup import (
    GRAM_DF_CAP,
    HAMMING_MAX,
    SIMHASH_BANDS,
    SIMHASH_BAND_WIDTH,
    SIMHASH_BITS,
    connected_components,
    df_capped,
)


def test_df_cap_drops_hot_grams(spark):
    # 1 gram in GRAM_DF_CAP+1 docs (hot), 1 gram in 2 docs (kept)
    rows = [(i, "the quick") for i in range(GRAM_DF_CAP + 1)]
    rows += [(0, "rare gram"), (1, "rare gram")]
    grams = spark.createDataFrame(rows, "doc_id int, g string")
    kept = df_capped(grams, "g")
    assert kept.select("g").distinct().collect() == [("rare gram",)]
    # every surviving gram's fan-out is bounded by the cap
    assert (
        kept.groupBy("g").count().filter(F.col("count") > GRAM_DF_CAP).count() == 0
    )


def test_simhash_banding_covers_hamming_radius():
    # pigeonhole: bands * width == bits and bands > HAMMING_MAX, so any
    # pair within the radius shares at least one exact band.
    assert SIMHASH_BANDS * SIMHASH_BAND_WIDTH == SIMHASH_BITS
    assert SIMHASH_BANDS == HAMMING_MAX + 1


def test_connected_components_chain_storage_stable(spark):
    # a 12-node chain needs >10 label-propagation rounds worst case;
    # with per-round unpersist, cached frames must not accumulate.
    # Delta-based: the session is shared across tests, so assert what
    # CC itself added over the pre-call snapshot, not a global count.
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    comp = connected_components(edges, max_iters=20)
    rows = comp.collect()
    assert len(rows) == n
    assert {r.component for r in rows} == {0}
    after = len(sc._jsc.sc().getRDDStorageInfo())
    # >10 rounds each localCheckpoint a frame; if per-round unpersist
    # never ran the delta would be ~12+. At most the final label frame
    # (+ its shuffle lineage) may stay cached.
    assert after - before <= 2, f"cached frames leaked: {before} -> {after}"


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    # checkpoint_dir switches lineage truncation to reliable
    # checkpoint() files — same result, and the files actually land in
    # the directory (the 100 TB fault-tolerance path is executable).
    ckpt = str(tmp_path / "cc_ckpt")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    comp = connected_components(edges, checkpoint_dir=ckpt)
    got = {(r.node, r.component) for r in comp.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    ckpt_files = list((tmp_path / "cc_ckpt").rglob("*"))
    assert ckpt_files, "no reliable checkpoint files were written"


def test_span_inventory_df_cap_excludes_hot_gram(spark, tmp_path):
    """A boilerplate 8-gram present in MORE than GRAM_DF_CAP documents
    must not enter the span inventory (stop-phrase noise; reporting it
    would hand span-excision a corpus-ablating gram), while a gram
    duplicated across 2..cap docs must. Runs the registered query
    end-to-end against a purpose-built documents table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from job_market_research_spark.functions.corpus import q_dedup_span_ngram
    from job_market_research_spark.ml.neardup import GRAM_DF_CAP

    hot = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    cold = "one two three four five six seven eight"
    n_hot = GRAM_DF_CAP + 50
    rows = [(i, f"doc{i} prefix {hot}") for i in range(n_hot)]
    rows += [(10_000 + i, f"tail{i} {cold}") for i in range(3)]
    # doc_ids avoid %23==0 plants: shift ids that collide
    rows = [((i + 1) if i % 23 == 0 else i, t) for i, t in rows]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    out = q_dedup_span_ngram(spark, str(tmp_path)).collect()
    grams = {r.gram for r in out}
    assert hot not in grams, "hot gram above the df-cap leaked into the inventory"
    assert cold in grams, "legitimately duplicated gram missing"
    assert all(2 <= r.n_docs <= GRAM_DF_CAP for r in out)


def test_best_of_cluster_prefers_clean_copy(spark, sf_dir):
    from job_market_research_spark.ml.neardup import q_dedup_best_of_cluster

    rows = q_dedup_best_of_cluster(spark, sf_dir).collect()
    assert rows
    reps = {r.rep_doc_id for r in rows}
    for r in rows:
        # planted triples: {orig, upper-mirror (+3e6), junk-mirror (+4e6)}
        if r.n_members == 3:
            # junk-appended mirror never wins; case tie resolves to the
            # smallest doc_id, i.e. the original
            assert r.rep_doc_id < 3000000, r
    # at least one planted triple exists at every sf
    assert any(r.n_members == 3 for r in rows)
    assert all(r.n_dropped == r.n_members - 1 for r in rows)
    assert len(reps) == len(rows)


def test_semdedup_plan_is_shuffle_lean(spark, sf_dir):
    """Round-9 rework pin: centroid assignment must be a pure map-side
    projection — NO Window anywhere (the old windowed argmin shuffled
    corpus×K rows on vec_id) — and the pair stage must join on
    (cluster, probe-bucket) so per-cluster compute can spread beyond
    one task per cluster."""
    from job_market_research_spark.registry import load_all

    df = load_all()["dedup_semantic_semdedup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "assignment regressed to a windowed argmin"
    # the map-side argmin shows up as array_min over the centroid structs
    assert "array_min" in plan
    # pair join carries the bucket equality alongside the cluster key
    assert "xb" in plan
