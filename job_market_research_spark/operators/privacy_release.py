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


#: Exponential-mechanism knobs: privacy budget, the data-independent
#: candidate grid (bin lower edges over the acctbal domain), and the
#: versioned seed salt. 11000/128 = 85.9375 is dyadic, so every grid
#: edge is EXACT in both engines' doubles.
DPM_EPSILON = 0.5
DPM_BINS = 128
DPM_SALT = "dpm-v1#"


@query(
    "privacy_dp_median",
    oracle=f"""
    WITH bins AS (
      SELECT CAST(least(greatest(floor((c_acctbal + 1000.0) / 11000.0
                                       * {DPM_BINS}), 0),
                        {DPM_BINS - 1}) AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1
    ),
    grid AS (SELECT g AS b FROM generate_series(0, {DPM_BINS - 1}) t(g)),
    tot AS (SELECT SUM(cnt) AS n FROM bins),
    cum AS (
      SELECT grid.b,
             CAST(COALESCE(SUM(bins.cnt) OVER (
               ORDER BY grid.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS below
      FROM grid LEFT JOIN bins USING (b)
    ),
    scored AS (
      SELECT b, below, tot.n,
             -abs(2 * below - tot.n) AS u2,
             round(-ln(-ln((CAST(('0x' || substr(md5('{DPM_SALT}'
                      || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                    / 4294967296.0)), 6) AS g_r6
      FROM cum, tot
    )
    SELECT CAST(-1000.0 + b * 85.9375 AS DOUBLE) AS released_median,
           b AS grid_bin,
           below AS n_below,
           CAST(n AS BIGINT) AS n,
           round({DPM_EPSILON} * u2 / 4.0 + g_r6, 6) AS score_r6
    FROM scored
    ORDER BY round({DPM_EPSILON} * u2 / 4.0 + g_r6, 6) DESC, b
    LIMIT 1
    """,
    tags=("privacy", "beyond"),
)
def q_privacy_dp_median(spark, sf_dir: str) -> DataFrame:
    """Differentially-private median via the EXPONENTIAL MECHANISM
    (McSherry & Talwar 2007): candidates are a FIXED data-independent
    grid of DPM_BINS bin edges over the acctbal domain; each
    candidate's utility is the (exact, integer) rank distance to the
    median, u(c) = -|2·#{x<c} − n| (sensitivity-2 in this ×2 scaling,
    hence the ε·u2/4 score); selection replays the Gumbel-max trick —
    argmax(ε·u/2 + Gumbel) samples exactly ∝ exp(ε·u/2) — with a
    SEEDED per-candidate Gumbel so the DuckDB oracle reproduces the
    release bit-for-bit. Same honesty contract as
    privacy_dp_count_release: replayable noise proves the MECHANISM
    (candidate independence, correct utility/sensitivity, correct
    Gumbel shape); production swaps in a CSPRNG draw.

    Scale: one binning aggregation (DPM_BINS keys, map-side
    combinable), a prefix sum over exactly DPM_BINS rows (bounded by
    the grid constant — allowlisted global window), Gumbel scoring as
    per-row expressions, TakeOrdered(1). The corpus is touched once."""
    from job_market_research_spark.ml.neardup import portable_hash
    from pyspark.sql import Window

    width = 11000.0 / DPM_BINS
    bins = (
        load(spark, sf_dir, "customer")
        .groupBy(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col("c_acctbal") + 1000.0) / 11000.0 * DPM_BINS
                    ).cast("long"),
                    F.lit(0),
                ),
                F.lit(DPM_BINS - 1),
            ).alias("b")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    grid = spark.range(DPM_BINS).select(F.col("id").alias("b"))
    cum = (
        grid.join(bins, "b", "left")
        .select("b", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .select(
            "b",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("below"),
        )
    )
    tot = bins.agg(F.sum("cnt").alias("n"))
    uu = (
        portable_hash(F.concat(F.lit(DPM_SALT), F.col("b").cast("string")))
        + 0.5
    ) / 4294967296.0
    g_r6 = F.round(-F.log(-F.log(uu)), 6)
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "b",
            "below",
            "n",
            (-F.abs(2 * F.col("below") - F.col("n"))).alias("u2"),
            g_r6.alias("g_r6"),
        )
        .select(
            (F.lit(-1000.0) + F.col("b") * width).alias("released_median"),
            F.col("b").alias("grid_bin"),
            F.col("below").alias("n_below"),
            F.col("n").cast("long").alias("n"),
            F.round(
                DPM_EPSILON * F.col("u2") / 4.0 + F.col("g_r6"), 6
            ).alias("score_r6"),
        )
    )
    return scored.orderBy(F.desc("score_r6"), "grid_bin").limit(1)


#: Randomized-response knobs: truth probability 3/4 ⇒ ε = ln 3 local
#: DP for a binary attribute; versioned salt for the seeded coin.
RR_P_TRUTH = 0.75
RR_SALT = "rr-v1#"


@query(
    "privacy_randomized_response",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS INT) AS truth
      FROM events GROUP BY user_id
    ),
    coined AS (
      SELECT truth,
             CASE WHEN (CAST(('0x' || substr(md5('{RR_SALT}'
                        || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        + 0.5) / 4294967296.0 < {RR_P_TRUTH}
                  THEN truth ELSE 1 - truth END AS reported
      FROM users
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(reported) AS BIGINT) AS n_reported_true,
           round(CAST(SUM(reported) AS DOUBLE) / COUNT(*), 6)
             AS reported_rate_r6,
           round((CAST(SUM(reported) AS DOUBLE) / COUNT(*)
                  - {1.0 - RR_P_TRUTH})
                 / {2.0 * RR_P_TRUTH - 1.0}, 6) AS debiased_rate_r6,
           round(CAST(SUM(truth) AS DOUBLE) / COUNT(*), 6) AS true_rate_r6
    FROM coined
    """,
    tags=("privacy", "beyond"),
)
def q_privacy_randomized_response(spark, sf_dir: str) -> DataFrame:
    """LOCAL differential privacy via Warner's randomized response:
    each user reports their binary attribute (ever purchased)
    truthfully with probability RR_P_TRUTH = 3/4 and flipped
    otherwise — ε = ln 3 local DP, the mechanism under RAPPOR-style
    telemetry — and the aggregate debiases the reported rate with
    (p̂ − (1−p))/(2p−1). The per-user coin is a SEEDED md5 uniform
    (the module's replayable-noise honesty contract: the oracle
    re-flips every coin bit-for-bit, proving mechanism + debiasing;
    production draws the coin ON DEVICE — that locality is the whole
    point of the local model). The exact rate rides along as the
    verification contract column.

    Scale: one groupBy(user) + one global aggregate; the flip is a
    map-side expression. Nothing about the mechanism shuffles more
    than the user-attribute table itself."""
    from job_market_research_spark.ml.neardup import portable_hash

    users = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("int")
            .alias("truth")
        )
    )
    coin = (
        portable_hash(
            F.concat(F.lit(RR_SALT), F.col("user_id").cast("string"))
        )
        + 0.5
    ) / 4294967296.0
    coined = users.select(
        "truth",
        F.when(coin < RR_P_TRUTH, F.col("truth"))
        .otherwise(1 - F.col("truth"))
        .alias("reported"),
    )
    p_hat = F.sum("reported").cast("double") / F.count("*")
    return coined.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("reported").cast("long").alias("n_reported_true"),
        F.round(p_hat, 6).alias("reported_rate_r6"),
        F.round(
            (p_hat - (1.0 - RR_P_TRUTH)) / (2.0 * RR_P_TRUTH - 1.0), 6
        ).alias("debiased_rate_r6"),
        F.round(F.sum("truth").cast("double") / F.count("*"), 6).alias(
            "true_rate_r6"
        ),
    )
