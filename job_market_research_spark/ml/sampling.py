"""Deterministic sampling & splitting (beyond-reference).

Training-data pipelines carve corpora into train/test splits and
per-stratum samples. `df.sample()` is seed-dependent and
partition-order-sensitive — useless for reproducible splits and
impossible to oracle. Both operators here hash a STABLE KEY instead:
the split/sample decision is a pure function of the row, identical on
re-runs, across engines, and after repartitioning. That is also the
100 TB-correct design: assignment is embarrassingly parallel, no
global sampling state, no driver coordination.

Hashes use the md5-based `portable_hash` (ml/neardup.py) so DuckDB
replays the exact assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.neardup import portable_hash
from job_market_research_spark.registry import query

#: Oracle twin of portable_hash(CAST(x AS VARCHAR)).
_ORACLE_HASH = "CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT)"


def hash_bucket(key: Column, buckets: int) -> Column:
    """Stable bucket in [0, buckets) from a key column."""
    return F.pmod(portable_hash(key.cast("string")), F.lit(buckets))


def train_test_split(
    df: DataFrame, key: str, test_buckets: int = 1, buckets: int = 10
) -> DataFrame:
    """Adds a `split` column: 'test' for the first `test_buckets`
    hash buckets, else 'train'. Re-running, repartitioning or
    resharding never moves a row between splits — the property
    `df.randomSplit` cannot give you."""
    b = hash_bucket(F.col(key), buckets)
    return df.withColumn(
        "split", F.when(b < test_buckets, "test").otherwise("train")
    )


@query(
    "sample_train_test_split",
    oracle=f"""
    SELECT CASE WHEN {_ORACLE_HASH.format(col="doc_id")} % 10 < 1
                THEN 'test' ELSE 'train' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM documents GROUP BY 1 ORDER BY split
    """,
)
def q_sample_train_test_split(spark, sf_dir: str) -> DataFrame:
    """~10% deterministic test split of the corpus; the id checksum
    proves the exact same documents land in each split on both
    engines."""
    docs = load(spark, sf_dir, "documents")
    return (
        train_test_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("split")
    )


def stratified_sample(
    df: DataFrame, key: str, stratum: str, keep_buckets: int, buckets: int
) -> DataFrame:
    """Keep keep_buckets/buckets of each stratum, hash-deterministic
    within stratum (the hash mixes stratum + key so the kept set is
    independent across strata)."""
    b = F.pmod(
        portable_hash(F.concat_ws("|", F.col(stratum), F.col(key).cast("string"))),
        F.lit(buckets),
    )
    return df.filter(b < keep_buckets)


@query(
    "sample_stratified",
    oracle=f"""
    WITH kept AS (
      SELECT lang, doc_id FROM documents
      WHERE {_ORACLE_HASH.format(col="lang || '|' || CAST(doc_id AS VARCHAR)")} % 5 < 2
    )
    SELECT lang, COUNT(*) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM kept GROUP BY 1 ORDER BY lang
    """,
)
def q_sample_stratified(spark, sf_dir: str) -> DataFrame:
    """~40% per-language stratified sample: every language keeps its
    own deterministic 2-of-5 hash buckets, so rebalancing the corpus
    never changes which documents survive."""
    docs = load(spark, sf_dir, "documents")
    sampled = stratified_sample(docs, "doc_id", "lang", keep_buckets=2, buckets=5)
    return (
        sampled.groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("doc_id").alias("id_checksum"))
        .orderBy("lang")
    )


#: Fixed-size per-stratum sample size.
RESERVOIR_K = 25


@query(
    "sample_reservoir_fixed_k",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_ORACLE_HASH.format(col="doc_id")}, doc_id
             ) AS rn
      FROM documents
    )
    SELECT source, doc_id, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {RESERVOIR_K}
    ORDER BY source, rn
    """,
)
def q_sample_reservoir_fixed_k(spark, sf_dir: str) -> DataFrame:
    """Fixed-K-per-stratum sampling, the deterministic replacement for
    reservoir sampling: rank every row by its portable hash within the
    stratum and keep the K smallest. Unlike a true streaming reservoir
    (driver-stateful, order-dependent, unreproducible on retry), the
    hash rank is a pure function of the key — re-runs, reshards, and
    stragglers all pick the SAME sample, and appending new data evicts
    old members exactly as a growing reservoir would (uniformity holds
    because the hash is uniform on keys).

    Scale shape: one shuffle on the stratum; rank+filter is top-K per
    group, which Spark executes with a partial per-partition top-K
    before the shuffle when K is small — no stratum's full row set
    ever sorts in one place."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        portable_hash(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "source",
            "doc_id",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= RESERVOIR_K)
        .orderBy("source", "rn")
    )


#: Temperature for the n^alpha mixture (0.5 = square-root scaling, the
#: multilingual-sampling default popularized by mT5/XLM-R).
MIX_ALPHA_SQRT = True

#: Target total rows the temperature mixture aims to keep.
MIX_TARGET_TOTAL = 1000


@query(
    "sample_temperature_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_total,
             CAST(sqrt(COUNT(*)) AS DECIMAL(18,9)) AS w_dec
      FROM documents GROUP BY source
    ),
    rated AS (
      SELECT source, n_total,
             CAST(least(floor(CAST(w_dec AS DOUBLE) * {MIX_TARGET_TOTAL}
                              * 10000
                              / CAST((SELECT SUM(w_dec) FROM counts)
                                     AS DOUBLE)
                              / n_total), 10000) AS BIGINT) AS keep_lt
      FROM counts
    )
    SELECT d.source, MIN(r.n_total) AS n_total,
           CAST(MIN(r.keep_lt) AS BIGINT) AS keep_lt,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(d.doc_id) AS BIGINT) AS id_checksum
    FROM documents d JOIN rated r ON d.source = r.source
    WHERE {_ORACLE_HASH.format(col="'temp|' || d.source || '|' || CAST(d.doc_id AS VARCHAR)")}
            % 10000 < r.keep_lt
    GROUP BY d.source ORDER BY d.source
    """,
)
def q_sample_temperature_mixture(spark, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (the mT5/XLM-R recipe):
    source weights proportional to n^0.5 instead of n, so
    low-resource sources are upweighted relative to their share.
    Per-source keep rates derive from the corpus counts (one
    dimension-sized aggregate joined back — no collect), and the
    per-row decision is the stable hash against an INTEGER threshold,
    so the survivor set is reproducible and engine-exact. The sqrt
    weights pass through DECIMAL for the cross-source sum
    (order-independent), exactly the registry float policy."""
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_total"))
        .withColumn("w_dec", F.sqrt("n_total").cast("decimal(18,9)"))
    )
    denom = counts.agg(F.sum("w_dec").alias("denom"))
    rated = counts.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_total",
        F.least(
            F.floor(
                F.col("w_dec").cast("double")
                * MIX_TARGET_TOTAL
                * 10000
                / F.col("denom").cast("double")
                / F.col("n_total")
            ),
            F.lit(10000),
        )
        .cast("long")
        .alias("keep_lt"),
    )
    h = portable_hash(
        F.concat_ws("|", F.lit("temp"), F.col("source"), F.col("doc_id").cast("string"))
    )
    kept = docs.join(F.broadcast(rated), "source").filter(
        F.pmod(h, F.lit(10000)) < F.col("keep_lt")
    )
    return (
        kept.groupBy("source")
        .agg(
            F.min("n_total").cast("long").alias("n_total"),
            F.min("keep_lt").cast("long").alias("keep_lt"),
            F.count("*").cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("source")
    )


#: Curriculum phases = quartiles of the document-length proxy.
CURR_PHASES = (0.25, 0.5, 0.75)


@query(
    "sample_curriculum_order",
    oracle="""
    WITH qs AS (
      SELECT quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.50) AS q2,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents
    ),
    phased AS (
      SELECT d.doc_id, d.n_chars,
             1 + CAST(d.n_chars > qs.q1 AS INT)
               + CAST(d.n_chars > qs.q2 AS INT)
               + CAST(d.n_chars > qs.q3 AS INT) AS phase,
             ('0x' || substr(md5('curr|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
               AS shuffle_key
      FROM documents d CROSS JOIN qs
    )
    SELECT doc_id, phase, shuffle_key
    FROM phased ORDER BY phase, shuffle_key, doc_id
    """,
)
def q_sample_curriculum_order(spark, sf_dir: str) -> DataFrame:
    """Curriculum schedule for training-data feeding: documents are
    staged into 4 phases by length quartile (short/simple first — the
    classic length-based curriculum proxy), deterministically shuffled
    WITHIN each phase by a salted portable hash.

    Scale shape: the quartile thresholds are one t-digest-swappable
    aggregate broadcast as a 1-row crossJoin (no global sort, no
    window); phase assignment is a map-side comparison; and the
    "shuffle" is a stateless hash — the schedule is fully determined
    by (doc_id), so retries, re-shards and incremental extensions of
    the corpus never reorder existing phases. Emitting the sort KEY
    instead of a dense global position is deliberate: a dense rank
    would need a partitionBy-less window (single-partition at corpus
    scale); downstream loaders order by (phase, shuffle_key) which
    parquet range-partitions for free."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    qs = docs.agg(
        F.percentile("n_chars", F.lit(CURR_PHASES[0])).alias("q1"),
        F.percentile("n_chars", F.lit(CURR_PHASES[1])).alias("q2"),
        F.percentile("n_chars", F.lit(CURR_PHASES[2])).alias("q3"),
    )
    phased = docs.crossJoin(F.broadcast(qs)).select(
        "doc_id",
        (
            F.lit(1)
            + (F.col("n_chars") > F.col("q1")).cast("int")
            + (F.col("n_chars") > F.col("q2")).cast("int")
            + (F.col("n_chars") > F.col("q3")).cast("int")
        ).alias("phase"),
        portable_hash(
            F.concat_ws("|", F.lit("curr"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )
    return phased.orderBy("phase", "shuffle_key", "doc_id")


#: Walk-forward CV: TSCV_FOLDS expanding-window folds over TSCV_FOLDS+1
#: contiguous day blocks.
TSCV_FOLDS = 4


@query(
    "sample_time_series_cv",
    oracle=f"""
    WITH d AS (
      SELECT event_id, CAST(ts AS DATE) - DATE '1970-01-01' AS dayint
      FROM events
    ),
    qs AS (
      SELECT quantile_cont(dayint, 0.2) AS q1,
             quantile_cont(dayint, 0.4) AS q2,
             quantile_cont(dayint, 0.6) AS q3,
             quantile_cont(dayint, 0.8) AS q4
      FROM d
    ),
    blocks AS (
      SELECT 1 + CAST(d.dayint > qs.q1 AS INT) + CAST(d.dayint > qs.q2 AS INT)
               + CAST(d.dayint > qs.q3 AS INT) + CAST(d.dayint > qs.q4 AS INT)
               AS block
      FROM d CROSS JOIN qs
    ),
    bc AS (
      SELECT block, CAST(COUNT(*) AS BIGINT) AS c FROM blocks GROUP BY block
    ),
    folds AS (SELECT k AS fold FROM generate_series(1, {TSCV_FOLDS}) AS g(k))
    SELECT f.fold,
           CAST(SUM(CASE WHEN bc.block <= f.fold THEN bc.c ELSE 0 END)
                AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN bc.block = f.fold + 1 THEN bc.c ELSE 0 END)
                AS BIGINT) AS n_test
    FROM folds f CROSS JOIN bc
    GROUP BY f.fold ORDER BY f.fold
    """,
)
def q_sample_time_series_cv(spark, sf_dir: str) -> DataFrame:
    """Leakage-free walk-forward cross-validation folds over the event
    stream: days are cut into TSCV_FOLDS+1 contiguous blocks at day
    quantiles; fold k trains on blocks 1..k and tests on block k+1 —
    train data always strictly precedes test data, the invariant
    random K-fold silently violates on temporal data.

    Scale shape: quantile thresholds are one aggregate (t-digest-
    swappable) broadcast as a 1-row crossJoin; block assignment is a
    map-side comparison; the fold summary is computed from the
    (TSCV_FOLDS+1)-row block-count table, so nothing after the one
    bounded-key aggregation touches corpus-sized data. Fold
    membership is a pure function of the row's timestamp —
    deterministic under retries and incremental appends (new days
    only ever extend the last block until thresholds are re-fit)."""
    ev = load(spark, sf_dir, "events").select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "dayint"
        )
    )
    qs = ev.agg(
        *[
            F.percentile("dayint", F.lit(q)).alias(f"q{i + 1}")
            for i, q in enumerate((0.2, 0.4, 0.6, 0.8))
        ]
    )
    blocks = ev.crossJoin(F.broadcast(qs)).select(
        (
            F.lit(1)
            + (F.col("dayint") > F.col("q1")).cast("int")
            + (F.col("dayint") > F.col("q2")).cast("int")
            + (F.col("dayint") > F.col("q3")).cast("int")
            + (F.col("dayint") > F.col("q4")).cast("int")
        ).alias("block")
    )
    bc = blocks.groupBy("block").agg(F.count("*").alias("c"))
    folds = spark.range(1, TSCV_FOLDS + 1).select(F.col("id").alias("fold"))
    return (
        folds.crossJoin(F.broadcast(bc))
        .groupBy("fold")
        .agg(
            F.sum(
                F.when(F.col("block") <= F.col("fold"), F.col("c")).otherwise(0)
            )
            .cast("long")
            .alias("n_train"),
            F.sum(
                F.when(F.col("block") == F.col("fold") + 1, F.col("c")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_test"),
        )
        .orderBy("fold")
    )


#: DSIR knobs: hashed-feature bucket count, target-set rule, head size.
DSIR_BUCKETS = 256
DSIR_K = 25


@query(
    "sample_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             (doc_id % 10 = 0) AS is_target,
             CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)
               % {DSIR_BUCKETS} AS b
      FROM documents,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
      WHERE t <> ''
    ),
    spine AS (SELECT g AS b FROM generate_series(0, {DSIR_BUCKETS - 1}) AS s(g)),
    tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok WHERE is_target GROUP BY b),
    rc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok WHERE NOT is_target GROUP BY b),
    tot AS (
      SELECT (SELECT COALESCE(SUM(c), 0) FROM tc) AS t_tot,
             (SELECT COALESCE(SUM(c), 0) FROM rc) AS r_tot
    ),
    model AS (
      SELECT s.b,
             ln((COALESCE(tc.c, 0) + 1.0) * (tot.r_tot + {DSIR_BUCKETS})
                / ((tot.t_tot + {DSIR_BUCKETS}) * (COALESCE(rc.c, 0) + 1.0)))
               AS logratio
      FROM spine s
      LEFT JOIN tc ON tc.b = s.b
      LEFT JOIN rc ON rc.b = s.b
      CROSS JOIN tot
    ),
    doc_feats AS (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok WHERE NOT is_target GROUP BY doc_id, b
    )
    SELECT d.doc_id,
           round(CAST(SUM(CAST(d.n * m.logratio AS DECIMAL(28,14)))
                 AS DOUBLE), 6) AS dsir_weight
    FROM doc_feats d JOIN model m USING (b)
    GROUP BY d.doc_id
    ORDER BY dsir_weight DESC, d.doc_id LIMIT {DSIR_K}
    """,
    tags=("sampling", "beyond"),
)
def q_sample_dsir_importance(spark, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR; Xie et al.
    2023): rank a raw pool by how target-like it is under two hashed
    bag-of-unigrams models. Target set = every 10th doc (stands in for
    a high-quality seed corpus); features = unigrams hashed into
    DSIR_BUCKETS buckets; per-doc importance weight
    = sum_b n_b·ln(p_target(b)/p_raw(b)) with add-one smoothing; the
    selection head (top DSIR_K by weight) is what a pipeline would
    feed to training.

    Scale shape: the two bucket models are DSIR_BUCKETS-row tables
    built by map-side-combinable counts (key space bounded at 256, so
    the shuffle is trivial) joined onto a generated bucket spine so
    never-seen-in-target buckets still get their smoothed penalty; the
    per-doc feature table aggregates (doc, bucket) — bounded fan-out
    per doc — and the model BROADCASTS into the scoring join. One
    corpus-sized shuffle total (the doc-bucket agg). Each score term is
    int·double (deterministic), summed in exact DECIMAL; the hash is
    md5-portable so DuckDB replays bucket assignment bit-for-bit."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        (F.col("doc_id") % 10 == 0).alias("is_target"),
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t"),
    ).filter(F.col("t") != "")
    tok = tok.select(
        "doc_id", "is_target", F.pmod(portable_hash(F.col("t")), F.lit(DSIR_BUCKETS)).alias("b")
    )
    tc = tok.filter("is_target").groupBy("b").agg(F.count("*").alias("tc"))
    rc = tok.filter(~F.col("is_target")).groupBy("b").agg(F.count("*").alias("rc"))
    tot = tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("t_tot")).crossJoin(
        rc.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("r_tot"))
    )
    spine = spark.range(DSIR_BUCKETS).select(F.col("id").alias("b"))
    model = (
        spine.join(tc, "b", "left")
        .join(rc, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.log(
                (F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                * (F.col("r_tot") + DSIR_BUCKETS)
                / (
                    (F.col("t_tot") + DSIR_BUCKETS)
                    * (F.coalesce(F.col("rc"), F.lit(0)) + 1.0)
                )
            ).alias("logratio"),
        )
    )
    doc_feats = (
        tok.filter(~F.col("is_target"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("n"))
    )
    return (
        doc_feats.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    (F.col("n") * F.col("logratio")).cast("decimal(28,14)")
                ).cast("double"),
                6,
            ).alias("dsir_weight")
        )
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(DSIR_K)
    )


#: Gumbel/exponential-race weighted sampling: head size and seed salt.
GUMBEL_K = 25
GUMBEL_SALT = "gum-v1#"


@query(
    "sample_gumbel_weighted",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS wt,
             (CAST(('0x' || substr(md5('{GUMBEL_SALT}'
                    || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(wt AS BIGINT) AS weight,
           round(-ln(u) / wt, 9) AS race_key
    FROM w
    ORDER BY race_key, doc_id LIMIT {GUMBEL_K}
    """,
    tags=("sampling", "beyond"),
)
def q_sample_gumbel_weighted(spark, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the exponential race
    (Efraimidis & Spirakis 2006, the Gumbel-top-k trick's classic
    form): each doc draws t_i = -ln(u_i)/w_i from a seeded uniform and
    the K smallest keys are exactly a weight-proportional
    without-replacement sample. Weight = n_chars (longer docs
    proportionally likelier — the usual size-weighted corpus draw).

    Complements the module's other samplers: `sample_reservoir_fixed_k`
    is UNweighted fixed-k, the mixture samplers are per-SOURCE rates;
    this is per-ROW weight-proportional without replacement — the one
    you want for importance-weighted corpus subsetting when DSIR gives
    each doc a weight.

    Scale shape: the race key is a pure map-side expression (seeded
    md5 uniform, one ln, one divide) and the K winners come from
    `orderBy().limit()` = TakeOrderedAndProject (per-partition top-k +
    driver merge) — no global sort, no driver state, retry-stable
    because the draw is a function of the row. Key rounded to 9 dp
    (ties broken by doc_id) so the libm ln() ulp gap cannot reorder
    the cut."""
    from job_market_research_spark.ml.neardup import portable_hash

    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    w = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("wt"),
        (
            (
                portable_hash(
                    F.concat(F.lit(GUMBEL_SALT), F.col("doc_id").cast("string"))
                )
                + 0.5
            )
            / 4294967296.0
        ).alias("u"),
    )
    return (
        w.select(
            "doc_id",
            F.col("wt").cast("long").alias("weight"),
            F.round(-F.log("u") / F.col("wt"), 9).alias("race_key"),
        )
        .orderBy("race_key", "doc_id")
        .limit(GUMBEL_K)
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH sized AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label
    ),
    floor_n AS (SELECT MIN(n) AS k FROM sized),
    ranked AS (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY ('0x' || substr(md5('bal-v1#'
                 || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT, vec_id) AS rk
      FROM embeddings
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(vec_id) AS BIGINT) AS id_checksum
    FROM ranked CROSS JOIN floor_n
    WHERE rk <= k
    GROUP BY label ORDER BY label
    """,
    tags=("sampling", "beyond"),
)
def q_sample_balanced_classes(spark, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly
    min-class-size rows, chosen by SEEDED-HASH order — the standard
    prep for training an unbiased classifier head on skewed labels
    (`text_quality_model`-style gates train on exactly this shape).
    Hash order makes the draw uniform-at-random per class yet fully
    deterministic: re-runs, retries and repartitions keep the same
    rows, and DuckDB replays the identical selection.

    Scale shape: class sizes are a |labels|-row aggregate, the floor
    is a broadcast scalar, and the per-class rank is a label-keyed
    window (hot classes spread across tasks only as far as one label's
    rows — for an extreme majority class, pre-filter with a hash
    threshold ≈ k/n before ranking to avoid windowing the whole class;
    same two-phase discipline as the mixture samplers). Output is the
    per-class audit (count + id checksum); the kept rows themselves
    are the same frame without the final aggregate."""
    emb = load(spark, sf_dir, "embeddings")
    sized = emb.groupBy("label").agg(F.count("*").alias("n"))
    floor_n = sized.agg(F.min("n").alias("k"))
    rk = F.row_number().over(
        Window.partitionBy("label").orderBy(
            portable_hash(
                F.concat(F.lit("bal-v1#"), F.col("vec_id").cast("string"))
            ),
            "vec_id",
        )
    )
    ranked = emb.select("vec_id", "label").withColumn("rk", rk)
    return (
        ranked.crossJoin(F.broadcast(floor_n))
        .filter(F.col("rk") <= F.col("k"))
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("vec_id").cast("long").alias("id_checksum"),
        )
        .orderBy("label")
    )


#: Priority-sampling knobs: sample size and the seed salt for the
#: per-item uniform.
PRI_K = 200
PRI_SALT = "pri-v1#"


@query(
    "sample_priority_subset_sum",
    oracle=f"""
    WITH w AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS wgt,
             CAST(o_totalprice AS DOUBLE)
               / ((CAST(('0x' || substr(md5('{PRI_SALT}'
                     || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
                   + 0.5) / 4294967296.0) AS q
      FROM orders
    ),
    topk AS (
      SELECT *, row_number() OVER (ORDER BY q DESC, o_orderkey) AS rk
      FROM (SELECT * FROM w ORDER BY q DESC, o_orderkey
            LIMIT {PRI_K + 1})
    ),
    tau AS (SELECT q AS t FROM topk WHERE rk = {PRI_K + 1}),
    est AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_sampled,
             SUM(CAST(round(greatest(CAST(wgt AS DOUBLE), tau.t), 4)
                      AS DECIMAL(18,4))) AS e
      FROM topk, tau WHERE rk <= {PRI_K}
      GROUP BY o_orderpriority
    ),
    truth AS (
      SELECT o_orderpriority,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS t
      FROM orders GROUP BY o_orderpriority
    )
    SELECT truth.o_orderpriority AS priority,
           COALESCE(est.n_sampled, 0) AS n_sampled,
           round(CAST(COALESCE(est.e, 0) AS DOUBLE), 4) AS est_total_r4,
           CAST(truth.t AS DOUBLE) AS true_total
    FROM truth LEFT JOIN est USING (o_orderpriority)
    ORDER BY priority
    """,
    tags=("sample", "sketch", "beyond"),
)
def q_sample_priority_subset_sum(spark, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup 2007): give every order
    a priority q = weight / seeded-uniform, keep the top PRI_K, and
    let τ be the (K+1)-th priority; then Σ max(w, τ) over the sampled
    members of ANY subset is an unbiased estimate of that subset's
    true weight sum — the optimal generic scheme for "sample once,
    answer arbitrary subset-sum queries later" (the per-class revenue
    columns here, with the exact totals riding along as the
    contract). The uniform is an md5-seeded draw so both engines
    sample the identical set and τ (the module's replay discipline).

    Scale: one map-side priority expression, a TakeOrderedAndProject
    top-(K+1) cut (the rank window runs on K+1 rows by construction —
    allowlisted), then a |classes|-row aggregate; per-item HT weights
    round-4 into exact decimals before summation. The true-total
    contract column is one extra map-side-combinable aggregate."""
    w = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("wgt"),
        (
            F.col("o_totalprice").cast("double")
            / (
                (
                    portable_hash(
                        F.concat(
                            F.lit(PRI_SALT),
                            F.col("o_orderkey").cast("string"),
                        )
                    )
                    + 0.5
                )
                / 4294967296.0
            )
        ).alias("q"),
    )
    topk = (
        w.orderBy(F.desc("q"), "o_orderkey")
        .limit(PRI_K + 1)
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("q"), "o_orderkey")),
        )
    )
    # population ≤ K ⇒ no (K+1)-th priority ⇒ τ = 0 and every weight
    # passes through exactly (the sample IS the population)
    tau = topk.agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == PRI_K + 1, F.col("q"))), F.lit(0.0)
        ).alias("t")
    )
    est = (
        topk.filter(F.col("rk") <= PRI_K)
        .crossJoin(F.broadcast(tau))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum(
                F.round(
                    F.greatest(F.col("wgt").cast("double"), F.col("t")), 4
                ).cast("decimal(18,4)")
            ).alias("e"),
        )
    )
    truth = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("t"))
    )
    return (
        truth.join(F.broadcast(est), "o_orderpriority", "left")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.round(
                F.coalesce(F.col("e"), F.lit(0)).cast("double"), 4
            ).alias("est_total_r4"),
            F.col("t").cast("double").alias("true_total"),
        )
        .orderBy("priority")
    )


#: Preference-pair construction: minimum chosen−rejected reward gap.
PREF_MARGIN = 150.0


@query(
    "sample_preference_pairs",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY value DESC, event_id DESC) AS rk_hi,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY value ASC, event_id ASC) AS rk_lo,
             COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
      FROM ev
    )
    SELECT hi.user_id, hi.event_type AS prompt_kind,
           CAST(hi.n AS BIGINT) AS n_candidates,
           hi.event_id AS chosen_id, lo.event_id AS rejected_id,
           hi.value AS chosen_score, lo.value AS rejected_score,
           hi.value - lo.value AS margin
    FROM (SELECT * FROM r WHERE rk_hi = 1) hi
    JOIN (SELECT * FROM r WHERE rk_lo = 1) lo
      ON hi.user_id = lo.user_id AND hi.event_type = lo.event_type
    WHERE hi.n >= 2 AND hi.value - lo.value >= {PREF_MARGIN}
    ORDER BY 1, 2
    """,
)
def q_sample_preference_pairs(spark, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair construction — the data op that turns
    a pool of scored completions into (chosen, rejected) training
    pairs: per prompt group (here (user_id, event_type) standing in
    for (prompt, sampling run)), chosen = the highest-reward
    candidate, rejected = the lowest, kept only when the group has ≥2
    candidates and the reward gap clears PREF_MARGIN (small-margin
    pairs teach the reward model noise — the standard filter in DPO
    data recipes).

    Spark-first shape: ONE map-side-combinable aggregation —
    max/min over a (value, event_id) struct gives the argmax/argmin
    WITH the deterministic event_id tie-break in the same partial
    (no rank window, no second corpus pass, no per-group sort). The
    oracle replays the same selection with two rank windows, proving
    the struct-extremum plan equals the window plan. Doubles pass
    through untouched (chosen−rejected on identical parquet doubles
    is bit-equal cross-engine).

    Scale: one shuffle on the group key; partials bound memory per
    task; group cardinality = prompts × types, far below row count —
    and a hot prompt with millions of candidates still reduces
    map-side to one struct per partition."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    agg = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.max(F.struct("value", "event_id")).alias("ch"),
        F.min(F.struct("value", "event_id")).alias("rj"),
    )
    return (
        agg.filter(F.col("n_candidates") >= 2)
        .select(
            "user_id",
            F.col("event_type").alias("prompt_kind"),
            "n_candidates",
            F.col("ch.event_id").alias("chosen_id"),
            F.col("rj.event_id").alias("rejected_id"),
            F.col("ch.value").alias("chosen_score"),
            F.col("rj.value").alias("rejected_score"),
            (F.col("ch.value") - F.col("rj.value")).alias("margin"),
        )
        .filter(F.col("margin") >= PREF_MARGIN)
        .orderBy("user_id", "prompt_kind")
    )


@query(
    "sample_ess_diagnostics",
    oracle="""
    WITH w AS (
      SELECT lang, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS wt
      FROM documents
    ),
    m AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(wt) AS BIGINT) AS sum_w,
             CAST(SUM(wt * wt) AS BIGINT) AS sum_w2,
             CAST(MAX(wt) AS BIGINT) AS max_w
      FROM w GROUP BY lang
    )
    SELECT lang, n_docs, sum_w,
           round(CAST(sum_w AS DOUBLE) * sum_w / sum_w2, 6) AS ess_r6,
           round(CAST(sum_w AS DOUBLE) * sum_w / sum_w2 / n_docs, 6)
             AS ess_ratio_r6,
           round(CAST(max_w AS DOUBLE) / sum_w, 6) AS max_w_share_r6,
           round(CAST(n_docs AS DOUBLE) * sum_w2 / (CAST(sum_w AS DOUBLE)
                 * sum_w) - 1, 6) AS cv2_r6
    FROM m ORDER BY lang
    """,
    tags=("sampling", "beyond"),
)
def q_sample_ess_diagnostics(spark, sf_dir: str) -> DataFrame:
    """Effective-sample-size diagnostics (Kish ESS = (Σw)²/Σw²) for
    length-proportional document sampling, per language stratum — the
    health check run BEFORE committing to a weighted mixture: if ESS
    collapses versus n_docs (ess_ratio → 0) or one document owns the
    mass (max_w_share), the weighted sample behaves like a handful of
    documents and the mixture needs tempering. CV² = n·Σw²/(Σw)² − 1
    is the companion skewness reading (ESS = n/(1+CV²)).

    Exactness: weights are integer token counts, so Σw and Σw² are
    EXACT integer sums (order-free, map-side combinable) and every
    emitted metric is one deterministic double ratio of integers —
    no decimal scaffolding needed.

    Scale: token counts come from size(split(...)) map-side (the
    token stream is never exploded); one aggregation keyed on the
    bounded lang dimension. Works unchanged at any corpus size."""
    w = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("wt"),
    )
    m = w.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("wt").cast("long").alias("sum_w"),
        F.sum(F.col("wt") * F.col("wt")).cast("long").alias("sum_w2"),
        F.max("wt").cast("long").alias("max_w"),
    )
    sw = F.col("sum_w").cast("double")
    return m.select(
        "lang",
        "n_docs",
        "sum_w",
        F.round(sw * F.col("sum_w") / F.col("sum_w2"), 6).alias("ess_r6"),
        F.round(
            sw * F.col("sum_w") / F.col("sum_w2") / F.col("n_docs"), 6
        ).alias("ess_ratio_r6"),
        F.round(F.col("max_w").cast("double") / F.col("sum_w"), 6).alias(
            "max_w_share_r6"
        ),
        F.round(
            F.col("n_docs").cast("double") * F.col("sum_w2") / (sw * F.col("sum_w"))
            - 1,
            6,
        ).alias("cv2_r6"),
    ).orderBy("lang")


#: OOF target-encoding folds and the smoothing pseudo-count.
TE_FOLDS = 5
TE_SMOOTH = 20


@query(
    "ml_target_encoding_oof",
    oracle=f"""
    WITH base AS (
      SELECT event_type AS cat,
             user_id % {TE_FOLDS} AS fold,
             CASE WHEN value IS NOT NULL AND value > 75 THEN 1 ELSE 0 END
               AS y
      FROM events
    ),
    cf AS (
      SELECT cat, fold,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM base GROUP BY 1, 2
    ),
    ct AS (
      SELECT cat, CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st
      FROM cf GROUP BY cat
    ),
    g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS ng, CAST(SUM(s) AS BIGINT) AS sg
      FROM cf
    )
    SELECT cf.cat, CAST(cf.fold AS BIGINT) AS fold, cf.n AS n_rows,
           round((CAST(ct.st - cf.s AS DOUBLE)
                  + {TE_SMOOTH} * (CAST(g.sg AS DOUBLE) / g.ng))
                 / (ct.nt - cf.n + {TE_SMOOTH}), 6) AS te_oof_r6
    FROM cf JOIN ct USING (cat) CROSS JOIN g
    ORDER BY cf.cat, fold
    """,
    tags=("ml", "features", "beyond"),
)
def q_ml_target_encoding_oof(spark, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of the event-type category against
    a binary high-value target — the feature-engineering workhorse
    done the leakage-SAFE way: each (category, fold) cell is encoded
    with the target rate computed from the OTHER folds only
    ((S_cat − S_fold)/(N_cat − N_fold)), plus pseudo-count smoothing
    toward the global rate so rare categories don't memorize their
    own labels. The naive same-fold encoding is the single most
    common target-leakage bug in tabular ML; this op IS the fix,
    expressed as pure relational algebra (complements
    sample_train_test_split and the CV folds: folds are a
    deterministic hash of the unit key, retry-proof).

    All cells are exact integer counts; each encoding is one
    fixed-shape double closed form, rounded 6. Output is the bounded
    (|categories| × folds) encoding table a scorer broadcasts.

    Scale: ONE combinable corpus aggregation to |cat|×folds cells;
    everything else is algebra on that bounded table."""
    base = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("cat"),
        (F.col("user_id") % TE_FOLDS).alias("fold"),
        F.when(F.col("value").isNotNull() & (F.col("value") > 75), 1)
        .otherwise(0)
        .alias("y"),
    )
    cf = base.groupBy("cat", "fold").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    ct = cf.groupBy("cat").agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
    )
    g = cf.agg(
        F.sum("n").cast("long").alias("ng"),
        F.sum("s").cast("long").alias("sg"),
    )
    return (
        cf.join(F.broadcast(ct), "cat")
        .crossJoin(F.broadcast(g))
        .select(
            "cat",
            F.col("fold").cast("long").alias("fold"),
            F.col("n").alias("n_rows"),
            F.round(
                (
                    (F.col("st") - F.col("s")).cast("double")
                    + TE_SMOOTH * (F.col("sg").cast("double") / F.col("ng"))
                )
                / (F.col("nt") - F.col("n") + TE_SMOOTH),
                6,
            ).alias("te_oof_r6"),
        )
        .orderBy("cat", "fold")
    )


#: |r| above this flags a feature as suspiciously predictive.
LEAK_R_FLAG = 0.5


@query(
    "ml_leakage_audit",
    oracle=f"""
    WITH base AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(round(CAST(value AS DECIMAL(18,4)), 4)
                  AS DECIMAL(18,4)) AS f_value,
             CAST(EXTRACT(hour FROM ts) AS DECIMAL(18,4)) AS f_hour,
             CAST(user_id % 100 AS DECIMAL(18,4)) AS f_userbucket
      FROM events WHERE value IS NOT NULL
    ),
    long AS (
      SELECT 'f_value' AS feature, f_value AS x, y FROM base
      UNION ALL SELECT 'f_hour', f_hour, y FROM base
      UNION ALL SELECT 'f_userbucket', f_userbucket, y FROM base
    ),
    m AS (
      SELECT feature,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CASE WHEN y = 1 THEN CAST(x AS DECIMAL(38,4))
                           ELSE 0 END) AS DOUBLE) AS sxy
      FROM long GROUP BY feature
    )
    SELECT feature, n,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * sy
                           * (CAST(n AS DOUBLE) - sy))), 6) AS r_pb_r6,
           CASE WHEN abs((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * sy
                           * (CAST(n AS DOUBLE) - sy))))
                >= {LEAK_R_FLAG} THEN 1 ELSE 0 END AS leakage_flag
    FROM m ORDER BY feature
    """,
    tags=("ml", "features", "guardrail", "beyond"),
)
def q_ml_leakage_audit(spark, sf_dir: str) -> DataFrame:
    """Target-leakage screen: point-biserial correlation of every
    candidate feature against the binary label in ONE pass — the
    pre-training audit that catches 'this feature is the label in
    disguise' before a model memorizes it (|r| ≥ 0.5 flags review).
    r_pb is Pearson r with a binary y, whose moments collapse to
    integer counts: Σy = n₁, Σy² = n₁, Σxy = Σx over positives —
    so the whole audit is exact DECIMAL x-moments plus conditional
    sums, one fixed-shape closed form per feature.

    Features fan out via a 3-way projection union (each branch reads
    the same scan — Spark reuses the exchange), keeping the audit a
    single corpus pass to a |features|-row report.

    Scale: ONE combinable aggregation per feature branch; no joins,
    no windows."""
    base = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    feats = {
        "f_value": F.round(F.col("value").cast("decimal(18,4)"), 4),
        "f_hour": F.hour("ts").cast("decimal(18,4)"),
        "f_userbucket": (F.col("user_id") % 100).cast("decimal(18,4)"),
    }
    frames = [
        base.select(
            F.lit(name).alias("feature"),
            expr.cast("decimal(18,4)").alias("x"),
            y.alias("y"),
        )
        for name, expr in feats.items()
    ]
    long = frames[0]
    for f_ in frames[1:]:
        long = long.unionByName(f_)
    m = long.groupBy("feature").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,4)")).cast("double").alias("sx"),
        F.sum(F.col("x").cast("decimal(19,4)") * F.col("x").cast("decimal(19,4)"))
        .cast("double")
        .alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(
            F.when(F.col("y") == 1, F.col("x").cast("decimal(38,4)")).otherwise(
                F.lit(0).cast("decimal(38,4)")
            )
        )
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n").cast("double")
    sy = F.col("sy").cast("double")
    r = (n * F.col("sxy") - F.col("sx") * sy) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (n * sy * (n - sy))
    )
    return m.select(
        "feature",
        "n",
        F.round(r, 6).alias("r_pb_r6"),
        F.when(F.abs(r) >= LEAK_R_FLAG, 1).otherwise(0).alias("leakage_flag"),
    ).orderBy("feature")
