"""Probabilistic record linkage (beyond-reference).

Fellegi–Sunter (1969) is the canonical framework for "are these two
records the same entity": compare candidate pairs field by field,
tabulate the frequency of each agreement PATTERN among true matches
(m-probabilities) and non-matches (u-probabilities), and score pairs
by how much more often their pattern occurs among matches. The
entity-resolution counterpart to the dedup family's string-similarity
operators — this one learns WHICH fields matter from labeled pairs.

The synthetic corpus has no second noisy feed, so the query builds one
deterministically (the text_pii_redact seeding discipline): customer
records re-emitted with per-residue perturbations (segment swapped,
balance shifted, name truncated). Truth is the shared custkey.

Scale discipline: candidate pairs come ONLY from nationkey blocking
(never all-pairs — the canopy rule from dedup_fuzzy_levenshtein);
the pattern table is 2³ rows however big the block pairs get. At
100 TB the u-side (non-match pairs within blocks) is estimated from a
hash-sampled subset of pairs instead of all of them — the m-side is
bounded by true-match count already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


@query(
    "ml_record_linkage_fs",
    oracle="""
    WITH a AS (
      SELECT c_custkey AS key_a, c_name AS name_a, c_mktsegment AS seg_a,
             c_acctbal AS bal_a, c_nationkey AS nat
      FROM customer
    ),
    b AS (
      SELECT c_custkey AS key_b,
             CASE WHEN c_custkey % 11 = 0
                  THEN substr(c_name, 1, length(c_name) - 2)
                  ELSE c_name END AS name_b,
             CASE WHEN c_custkey % 3 = 0 THEN 'PERTURBED'
                  ELSE c_mktsegment END AS seg_b,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 5.0
                  ELSE c_acctbal END AS bal_b,
             c_nationkey AS nat
      FROM customer
    ),
    pairs AS (
      SELECT CASE WHEN name_a = name_b THEN 4 ELSE 0 END
             + CASE WHEN seg_a = seg_b THEN 2 ELSE 0 END
             + CASE WHEN bal_a = bal_b THEN 1 ELSE 0 END AS pattern,
             CASE WHEN key_a = key_b THEN 1 ELSE 0 END AS is_match
      FROM a JOIN b USING (nat)
    ),
    tab AS (
      SELECT pattern,
             CAST(SUM(is_match) AS BIGINT) AS n_match,
             CAST(SUM(1 - is_match) AS BIGINT) AS n_nonmatch
      FROM pairs GROUP BY pattern
    ),
    tot AS (
      SELECT SUM(n_match) AS tm, SUM(n_nonmatch) AS tn FROM tab
    )
    SELECT pattern, n_match, n_nonmatch,
           round(CAST(n_match AS DOUBLE) / tm, 6) AS m_prob_r6,
           round(CAST(n_nonmatch AS DOUBLE) / tn, 6) AS u_prob_r6
    FROM tab, tot ORDER BY pattern
    """,
    tags=("linkage", "dedup", "beyond"),
)
def q_ml_record_linkage_fs(spark, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter agreement-pattern table over nation-blocked
    customer pairs against a deterministically perturbed copy of the
    same records (segment swap at custkey%3, balance shift at %7, name
    truncation at %11 — so every field's agreement is informative).
    Pattern bit 4 = name agrees, 2 = segment, 1 = balance; the output
    is the 2³-row (pattern → m, u) table a linkage engine thresholds
    into match / possible / non-match regions.

    The discriminative structure to read off: the all-agree pattern 7
    concentrates m-mass with near-zero u (names are unique per key),
    while low patterns carry the u-mass — the separation IS the
    linkage power of the field set. Plan: block join on nationkey
    (both sides co-partition; never all-pairs), ONE conditional
    aggregation to the bounded pattern table, totals broadcast back.
    m/u are exact count ratios — no logs, no libm (weights are
    monotone in m/u, so thresholding works on the ratios directly)."""
    cust = load(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("c_acctbal").alias("bal_a"),
        F.col("c_nationkey").alias("nat"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.when(
            F.col("c_custkey") % 11 == 0,
            F.expr("substr(c_name, 1, length(c_name) - 2)"),
        )
        .otherwise(F.col("c_name"))
        .alias("name_b"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("PERTURBED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_b"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 5.0)
        .otherwise(F.col("c_acctbal"))
        .alias("bal_b"),
        F.col("c_nationkey").alias("nat"),
    )
    pattern = (
        F.when(F.col("name_a") == F.col("name_b"), 4).otherwise(0)
        + F.when(F.col("seg_a") == F.col("seg_b"), 2).otherwise(0)
        + F.when(F.col("bal_a") == F.col("bal_b"), 1).otherwise(0)
    )
    is_match = F.when(F.col("key_a") == F.col("key_b"), 1).otherwise(0)
    tab = (
        a.join(b, "nat")
        .select(pattern.alias("pattern"), is_match.alias("is_match"))
        .groupBy("pattern")
        .agg(
            F.sum("is_match").cast("long").alias("n_match"),
            F.sum(1 - F.col("is_match")).cast("long").alias("n_nonmatch"),
        )
    )
    tot = tab.agg(
        F.sum("n_match").alias("tm"), F.sum("n_nonmatch").alias("tn")
    )
    return (
        tab.crossJoin(F.broadcast(tot))
        .select(
            "pattern",
            "n_match",
            "n_nonmatch",
            F.round(F.col("n_match").cast("double") / F.col("tm"), 6).alias(
                "m_prob_r6"
            ),
            F.round(F.col("n_nonmatch").cast("double") / F.col("tn"), 6).alias(
                "u_prob_r6"
            ),
        )
        .orderBy("pattern")
    )
