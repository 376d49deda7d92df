"""Bloom-filter join pruning (runtime-filter pattern, beyond-reference).

The canonical 100 TB join problem: probe side is huge, build side is
selective, and most probe rows will NOT find a match — yet a plain
shuffle join moves every probe row anyway. Spark's own runtime row
filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects a
bloom filter of the build keys under the probe scan for exactly this
reason. This module expresses the same pattern EXPLICITLY as a
relational plan, so the semantics are oracle-checkable and the
mechanism is usable where the optimizer's heuristics decline to fire:

1. build side → k hash positions per key → DISTINCT set-bit relation
   (bounded by M bits, here 8192 rows max — broadcastable by
   construction no matter how large the build side is);
2. probe side is semi-joined against the bit set once per hash
   function (k broadcast semi-joins = the `might_contain` test);
3. surviving candidates (true matches + bloom false positives) go to
   the exact join.

The hashes are affine maps mod M (odd multipliers), not xxhash — both
engines replay them bit-for-bit, which is what makes the false-positive
set itself deterministic and oracle-checkable.

At scale: the bit-set relation is ≤ M rows regardless of build
cardinality, so the prune is always a broadcast (map-side, no shuffle
of the probe). Only candidates reach the exact join's shuffle —
probe-side I/O drops by the true selectivity minus the false-positive
rate (~(1-(1-1/M)^{kn})^k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: Bloom geometry: M bits, k affine hash functions h_i(x) = (x*A_i + B_i) % M.
BLOOM_M = 8192
BLOOM_HASHES = ((2654435761, 97), (40503, 101), (69621, 103))


def _positions(key):
    return [((key * a + b) % BLOOM_M).alias(f"h{i}") for i, (a, b) in enumerate(BLOOM_HASHES)]


def bloom_bits(build: DataFrame, key: str) -> DataFrame:
    """DISTINCT set-bit positions of the build keys — ≤ BLOOM_M rows,
    broadcastable by construction."""
    k = F.col(key)
    return (
        build.select(F.explode(F.array(*_positions(k))).alias("bit"))
        .distinct()
    )


def bloom_prune(probe: DataFrame, key: str, bits: DataFrame) -> DataFrame:
    """`might_contain` as k broadcast semi-joins: a probe row survives
    iff ALL k of its hash positions are set.

    The scratch hash column name is collision-proofed against the
    caller's schema — a reusable helper must never silently overwrite
    (and then drop) a probe column that happens to share its name.
    """
    h_col = "__bloom_h"
    while h_col in probe.columns:
        h_col += "_"
    out = probe
    for i, (a, b) in enumerate(BLOOM_HASHES):
        h = ((F.col(key) * a + b) % BLOOM_M).alias(h_col)
        out = (
            out.withColumn(h_col, h)
            .join(
                F.broadcast(bits.withColumnRenamed("bit", h_col)),
                h_col,
                "left_semi",
            )
            .drop(h_col)
        )
    return out


@query(
    "join_bloom_prune",
    oracle=f"""
    WITH build AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bits AS (
      SELECT DISTINCT h FROM build, unnest([
        (k * 2654435761 + 97) % {BLOOM_M},
        (k * 40503 + 101) % {BLOOM_M},
        (k * 69621 + 103) % {BLOOM_M}]) AS t(h)
    ),
    probe AS (SELECT o_orderkey, o_custkey AS k FROM orders),
    cand AS (
      SELECT p.* FROM probe p
      WHERE (k * 2654435761 + 97) % {BLOOM_M} IN (SELECT h FROM bits)
        AND (k * 40503 + 101) % {BLOOM_M} IN (SELECT h FROM bits)
        AND (k * 69621 + 103) % {BLOOM_M} IN (SELECT h FROM bits)
    )
    SELECT 'bloom_candidates' AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM cand
    UNION ALL
    SELECT 'probe_total', CAST(COUNT(*) AS BIGINT) FROM probe
    UNION ALL
    SELECT 'true_matches', CAST(COUNT(*) AS BIGINT)
    FROM cand c WHERE EXISTS (SELECT 1 FROM build b WHERE b.k = c.k)
    ORDER BY stage
    """,
)
def q_join_bloom_prune(spark, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi-join of orders against BUILDING-segment
    customers: probe_total → bloom_candidates → true_matches. The gap
    between the last two is the (deterministic, replayed-by-the-oracle)
    false-positive set; the gap between the first two is the shuffle
    I/O the bloom stage saves the exact join."""
    build = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    probe = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("k")
    )
    bits = bloom_bits(build, "k")
    cand = bloom_prune(probe, "k", bits)

    n_probe = probe.agg(F.count("*").cast("long").alias("n")).select(
        F.lit("probe_total").alias("stage"), "n"
    )
    n_cand = cand.agg(F.count("*").cast("long").alias("n")).select(
        F.lit("bloom_candidates").alias("stage"), "n"
    )
    n_true = (
        cand.join(build.distinct(), "k", "left_semi")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("true_matches").alias("stage"), "n")
    )
    return n_probe.unionByName(n_cand).unionByName(n_true).orderBy("stage")
