"""Differentially-private vocabulary release (beyond-reference).

The "private set union" / partition-selection problem: release which
n-grams appear in a private corpus (e.g., to train a public tokenizer)
without revealing any single document's contribution. The standard
recipe (Korolova et al. 2009; the stability-based histogram): count
each token's DOCUMENT frequency (one doc contributes ≤1 per token —
bounded sensitivity), add Laplace(1/ε) noise, and release only tokens
whose NOISY count clears a threshold τ picked from (ε, δ) — tokens
unique to one document essentially never survive.

Same honesty contract as privacy_dp_count_release: the noise here is
a SEEDED inverse-CDF draw so the DuckDB oracle can replay the release
bit-for-bit — that proves the pipeline (sensitivity bounding via
DISTINCT doc, correct Laplace scale, threshold post-processing), not
the privacy of this particular draw; production swaps in a CSPRNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

DPV_EPSILON = 1.0
#: Stability threshold: 1 + ln(1/(2δ))/ε with δ = 1e-8 → ≈ 18.7.
DPV_TAU = 18.7
DPV_SALT = "dpv-v1#"


@query(
    "privacy_dp_vocab_release",
    oracle=f"""
    WITH df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
      FROM (
        SELECT doc_id, t AS token
        FROM documents,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
        WHERE t <> ''
      ) GROUP BY token
    ),
    seeded AS (
      SELECT token, doc_freq,
             (CAST(('0x' || substr(md5('{DPV_SALT}' || token), 1, 8))
                   AS BIGINT) + 0.5) / 4294967296.0 - 0.5 AS u
      FROM df
    ),
    noised AS (
      SELECT token, doc_freq,
             round(doc_freq - (1.0 / {DPV_EPSILON}) * sign(u)
                   * ln(1.0 - 2.0 * abs(u)), 6) AS noisy_r6
      FROM seeded
    )
    SELECT token, doc_freq, noisy_r6
    FROM noised WHERE noisy_r6 >= {DPV_TAU}
    ORDER BY token
    """,
    tags=("privacy", "text", "beyond"),
)
def q_privacy_dp_vocab_release(spark, sf_dir: str) -> DataFrame:
    """Stability-thresholded DP vocabulary release: per-token DISTINCT
    document frequency (the distinct is the sensitivity bound — a doc
    repeating a token 100× still moves the count by 1), seeded
    Laplace(1/ε) noise, release iff noisy count ≥ τ(ε, δ). The private
    set union primitive a tokenizer-training pipeline runs before its
    BPE pass (text_bpe_train_merges) may touch public counts.

    Scale shape: tokenize scan → (doc, token)-distinct → vocab-sized
    count (map-side combinable after the distinct's one shuffle);
    noise and threshold are pure per-row expressions on the bounded
    vocab table. Noise rounds to 6 dp before the threshold compare, so
    libm ln ulps cannot flip a release decision (the engines compare
    IDENTICAL doubles against the τ literal)."""
    from job_market_research_spark.ml.neardup import portable_hash

    tok = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    df = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    u = (
        (portable_hash(F.concat(F.lit(DPV_SALT), F.col("token"))) + 0.5)
        / 4294967296.0
        - 0.5
    )
    noisy = F.round(
        F.col("doc_freq")
        - (1.0 / DPV_EPSILON)
        * F.signum(u)
        * F.log(1.0 - 2.0 * F.abs(u)),
        6,
    )
    return (
        df.select("token", "doc_freq", noisy.alias("noisy_r6"))
        .filter(F.col("noisy_r6") >= DPV_TAU)
        .orderBy("token")
    )
