"""Near-duplicate detection at training-data scale (beyond-reference).

The reference only dedups on an exact natural key (SURVEY §2.3). A
100 TB training-data pipeline needs content-level dedup: exact hash,
MinHash+LSH, SimHash and n-gram Jaccard. All four are implemented as
pure relational plans — tokenize/shingle → explode → hash → group —
so they scale with the shuffle layer rather than any driver-side
state.

Cross-engine hash portability: every hash here is
``int(md5(x)[:8], 16)`` — Spark ``conv(substr(md5(x),1,8),16,10)``,
DuckDB ``('0x'||substr(md5(x),1,8))::BIGINT`` — so the oracle can
replay the *same* signatures, bands and buckets bit-for-bit. (At
production scale you'd swap md5 for xxhash64 — same plan shape,
cheaper hash; md5 is the cross-engine-verifiable choice.)

The testdata corpus has no natural duplicates, so each query first
constructs a deterministic augmented corpus: for every 10th document a
mutated copy (doc_id + 1_000_000, first token dropped) is unioned in.
Both engines build the identical corpus; the operator must find
exactly those planted near-dups (plus any incidental ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: Shared corpus-augmentation SQL for the oracles.
AUGMENTED_CORPUS_SQL = """
      SELECT doc_id, text, lang, source FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             regexp_replace(text, '^[^ ]+ ', '') AS text,
             lang, source
      FROM documents WHERE doc_id % 10 = 0
"""


# Per-Spark-app staging for the dedup family's shared frames
# (augmented corpus, shingle rows, minhash band rows, verification
# profiles) — see staging.app_staged for the memo/persist discipline.
from job_market_research_spark.staging import (
    app_staged as _app_staged,
    staged_frame as _staged_frame,
)


def augmented_corpus(spark, sf_dir: str) -> DataFrame:
    """documents ∪ mutated copies of every 10th doc (near-dup seeds).

    Deliberately NOT persisted (r12 measurement): most consumers read
    the corpus exactly once and fuse scan → mutate → shingle/hash in
    one codegen stage; serving them from an InMemoryRelation broke
    that fusion and cost MORE than the re-derivation saved (winnowing
    6.2 s cached vs 3.5 s fused at sf0.1). The frames worth staging
    are the DEEP shared legs built from this one — see
    staged_shingles / staged_minhash_bands / staged_shingle_profiles.

    The corpus is fanned out to full parallelism right after the scan:
    locally it is one small parquet file → 1-2 input splits, and every
    downstream shingle/hash derivation is CPU-bound map work that would
    otherwise run near-serially inside those splits. One tiny shuffle of
    the raw rows buys full-width execution of the O(docs × k) hashing.
    On a real cluster the scan has thousands of splits and file-size
    partitioning already provides the width — an explicit numPartitions
    repartition is still byte-cheap relative to the hash work it spreads.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    mutants = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.regexp_replace("text", r"^[^ ]+ ", "").alias("text"),
        "lang",
        "source",
    )
    return docs.unionByName(mutants).repartition(
        spark.sparkContext.defaultParallelism
    )


def portable_hash(col: Column) -> Column:
    """32-bit integer hash identical in Spark and DuckDB (md5-based)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash60(col: Column) -> Column:
    """60-bit integer hash (15 hex md5 chars — fits signed int64 on
    both engines; DuckDB twin ``('0x'||substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


#: Document-frequency cap for inverted-index candidate joins. A gram
#: occurring in k documents emits O(k²) candidate pairs, so web-scale
#: stop-word grams turn the index self-join into a skew bomb. Grams
#: with df > cap are dropped from the CANDIDATE index only (set sizes
#: keep counting them), bounding every per-gram join fan-out at cap².
GRAM_DF_CAP = 100


def df_capped(grams: DataFrame, gram_col: str) -> DataFrame:
    """Drop grams whose document frequency exceeds GRAM_DF_CAP.

    Input must be one row per (doc, gram). One extra count+anti-join
    shuffle buys a provably bounded pair join — the 100 TB trade.
    """
    hot = (
        grams.groupBy(gram_col)
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > GRAM_DF_CAP)
        .select(gram_col)
    )
    return grams.join(hot, gram_col, "left_anti")


def _df_cap_sql(src: str, gram_col: str) -> str:
    """DuckDB twin of df_capped as a CTE body."""
    return f"""
      SELECT * FROM {src} WHERE {gram_col} NOT IN (
        SELECT {gram_col} FROM {src}
        GROUP BY {gram_col} HAVING COUNT(*) > {GRAM_DF_CAP})
    """


def gram_pairs_ctes(corpus_sql: str) -> str:
    """Shared CTE chain corpus → bigrams → df-capped index → candidate
    pairs (jpairs: doc_a, doc_b, inter) + per-doc sizes. Used by the
    dedup_ngram_jaccard / dedup_cluster_cc oracles AND by their sf0.1
    non-vacuity probes (tests/oracle_utils.py): the absolute GRAM_DF_CAP
    legitimately drains both FINAL results at sf0.1, so the standing
    parity gate there proves full value parity on this candidate-pair
    frame instead of comparing empty-vs-empty (r14 verdict item 1)."""
    return f"""
    corpus AS ({corpus_sql}),
    toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t, lang, source FROM corpus
    ),
    grams AS (
      SELECT DISTINCT doc_id, g, lang, source FROM (
        SELECT doc_id, lang, source,
               unnest(list_transform(range(1, greatest(len(t), 1)),
                      i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks) WHERE g IS NOT NULL
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    gidx AS ({_df_cap_sql("grams", "g")}),
    jpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM gidx a JOIN gidx b
        ON a.g = b.g AND a.lang = b.lang AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    """


def gram_pairs_and_sizes(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Spark twin of `gram_pairs_ctes`: (candidate pairs, per-doc
    sizes) from the df-capped bigram inverted index. Pairs carry
    (doc_a, doc_b, inter); sizes carry (doc_id, n)."""
    grams = corpus.select(
        "doc_id", "lang", "source", F.explode(word_shingles("text", 2)).alias("g")
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    idx = df_capped(grams, "g")
    a, b = idx.alias("a"), idx.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return pairs, sizes


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (native:
    split → sequence → transform; no UDF)."""
    c = text_col if isinstance(text_col, str) else "text"
    # sequence(1, 0) would produce a *descending* range in Spark, so the
    # too-short case must short-circuit to an empty array explicitly.
    #
    # The token split is bound ONCE per row via the single-element-array
    # lambda idiom (transform(array(split(..)), toks -> ..)[1]): an
    # expression written directly inside a higher-order-function lambda
    # is re-evaluated per element (no CSE across lambda invocations), so
    # the previous form re-split the text for EVERY shingle position —
    # O(tokens²) splits per document. Let-binding measured 0.53× on
    # text_decontaminate at sf0.1 (r16 interleaved A/B).
    return F.expr(
        f"""array_distinct(filter(
              element_at(transform(array(split(trim({c}), ' ')),
                toks -> if(size(toks) < {n},
                           array(),
                           transform(sequence(1, size(toks) - {n - 1}),
                                     i -> concat_ws(' ', slice(toks, i, {n}))))),
                1),
              x -> x <> ''))"""
    )


def _shingle_rows(corpus: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingles."""
    return corpus.select(
        "doc_id", F.explode(word_shingles("text", n)).alias("sh")
    )


def staged_shingles(spark, sf_dir: str, n: int = 3) -> DataFrame:
    """Persisted (doc_id, sh) shingle rows of the augmented corpus,
    one materialization per (app, sf_dir, n). The shingle explode is
    the dedup family's shared expensive leg — minhash LSH, the
    incremental index probe and the recall audit all start from this
    identical frame (r11 verdict item 1)."""
    import os

    return _app_staged(
        spark,
        ("shingles", os.path.realpath(os.path.abspath(sf_dir)), n),
        lambda: _shingle_rows(augmented_corpus(spark, sf_dir), n),
    )


def staged_minhash_bands(spark, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, band, band_key) minhash band rows over
    `staged_shingles`, one materialization per (app, sf_dir). Saves
    the MINHASH_K min-hash aggregation from re-running for each of the
    three banded-minhash queries."""
    return _staged_frame(spark, "minhash_bands", sf_dir,
        lambda: minhash_band_rows(staged_shingles(spark, sf_dir)),
    )


def staged_shingle_profiles(spark, sf_dir: str) -> DataFrame:
    """Persisted per-doc verification profiles (doc_id, n, arr): total
    shingle count plus the df-capped shingle set as an array. The
    exact-Jaccard verification stage of both the batch LSH self-join
    and the incremental index probe consumes this identical frame —
    hot shingles (df > GRAM_DF_CAP) are excluded from the INTERSECTION
    array only, n counts everything, so capped Jaccard under-estimates
    and never inflates. Per-doc arrays are bounded by document length,
    so no row outgrows executor memory at corpus scale."""

    def build() -> DataFrame:
        shingles = staged_shingles(spark, sf_dir)
        hot = (
            shingles.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > GRAM_DF_CAP)
            .select("sh", F.lit(True).alias("_hot"))
        )
        return (
            shingles.join(F.broadcast(hot), "sh", "left")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n"),
                F.collect_list(
                    F.when(F.col("_hot").isNull(), F.col("sh"))
                ).alias("arr"),
            )
        )

    return _staged_frame(spark, "shingle_profiles", sf_dir, build
    )


def staged_winnow_fps(spark, sf_dir: str) -> DataFrame:
    """Persisted winnowing fingerprint table (doc_id, fp) — the MOSS
    selection over char-gram hashes (see q_dedup_winnowing's docstring
    for the algorithm and the let-binding idiom). STAGED per
    (app, sf_dir): the fingerprint compute is the expensive leg (an
    md5 per character position), and the inline form re-derived it per
    consumer (sizes, df-cap count, anti-join left, both self-join
    sides — census 12 scans / 17 exchanges; ReuseExchange dedupes only
    the identical a/b subtrees). The (doc_id, fp) table is exactly
    what a MOSS-style engine stores — at 100 TB the fingerprint pass
    runs once, not six times. Docs with fewer than W grams
    (len < K + W - 1) select no fingerprints — same rows the old
    window-filter shape produced. Module-level (r17) so the BENCH_ALL
    sweep can front the build as its own `stage:` row."""
    corpus = augmented_corpus(spark, sf_dir)
    gram_hash = (
        f"CAST(conv(substring(md5(substring(text, CAST(i AS INT),"
        f" {WIN_K})), 1, 8), 16, 10) AS BIGINT)"
    )
    hs = (
        f"transform(sequence(1, length(text) - {WIN_K} + 1),"
        f" i -> {gram_hash})"
    )
    fp_arr = (
        f"element_at(transform(array({hs}), hs ->"
        f" array_distinct(transform(sequence(1, size(hs) - {WIN_W - 1}),"
        f" j -> array_min(slice(hs, CAST(j AS INT), {WIN_W}))))), 1)"
    )
    return _staged_frame(spark, "winnow_fps", sf_dir,
        lambda: corpus.filter(
            F.length("text") >= WIN_K + WIN_W - 1
        ).select("doc_id", F.explode(F.expr(fp_arr)).alias("fp")),
    )


@query(
    "dedup_exact_hash",
    oracle=f"""
    WITH corpus AS (
      {AUGMENTED_CORPUS_SQL}
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text, lang, source
      FROM documents WHERE doc_id % 20 = 0
    )
    SELECT h AS content_hash, COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM (SELECT doc_id, md5(text) AS h FROM corpus)
    GROUP BY h HAVING COUNT(*) > 1 ORDER BY content_hash
    """,
)
def q_dedup_exact_hash(spark, sf_dir: str) -> DataFrame:
    """Exact content dedup via hash-groupBy: md5 the payload, group,
    keep the minimum id as canonical. One shuffle on the hash — the
    100 TB-safe shape (no sort, no driver state). Note the corpus'
    mutated copies are NOT exact dups; only every-100th doc (mutant of
    a doc whose first token drop is a no-op) could collide — so this
    finds exact-duplicate groups only."""
    corpus = augmented_corpus(spark, sf_dir)
    # Plant true exact duplicates too: every 20th doc copied verbatim.
    docs = load(spark, sf_dir, "documents")
    exact_copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text", "lang", "source"
    )
    corpus = corpus.unionByName(exact_copies)
    return (
        corpus.select("doc_id", F.md5("text").alias("h"))
        .groupBy(F.col("h").alias("content_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


MINHASH_K = 16
BAND_SIZE = 4
JACCARD_THRESHOLD = 0.5




def minhash_band_rows(shingles: DataFrame) -> DataFrame:
    """(doc_id, sh) shingle rows → one (doc_id, band, band_key) row per
    band of the MinHash signature.

    All MINHASH_K signature positions in ONE aggregation: k min-columns
    over one row per (doc, shingle), instead of exploding each shingle
    k× and re-grouping twice. Map-side partial mins shrink the shuffle
    to one row per doc — at 100 TB this removes the k× shuffle that
    would otherwise dominate the whole LSH pipeline. Band keys are pure
    projections of the signature row (md5 over the band's minhashes in
    position order — byte-identical to the oracle's string_agg ORDER BY
    i); explode emits one row per (doc, band). Shared by the self-join
    dedup (`dedup_minhash_lsh`) and the index-probe incremental variant
    (`dedup_incremental_minhash`)."""
    sigs = shingles.groupBy("doc_id").agg(
        *[
            F.min(
                portable_hash(F.concat(F.lit(f"{i}#"), F.col("sh")))
            ).alias(f"m{i}")
            for i in range(MINHASH_K)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{i}").cast("string")
                            for i in range(
                                band * BAND_SIZE, (band + 1) * BAND_SIZE
                            )
                        ],
                    )
                ).alias("band_key"),
            )
            for band in range(MINHASH_K // BAND_SIZE)
        ]
    )
    return sigs.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH corpus AS ({AUGMENTED_CORPUS_SQL}),
    toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM corpus
    ),
    shingles AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        FROM toks) WHERE sh IS NOT NULL AND sh <> ''
    ),
    sigs AS (
      SELECT doc_id, i,
             MIN(('0x' || substr(md5(CAST(i AS VARCHAR) || '#' || sh), 1, 8))::BIGINT)
               AS minh
      FROM shingles, range(0, {MINHASH_K}) AS r(i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {BAND_SIZE} AS band,
             md5(string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i)) AS band_key
      FROM sigs GROUP BY doc_id, i // {BAND_SIZE}
    ),
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    idx AS ({_df_cap_sql("shingles", "sh")}),
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter, sa.n AS na, sb.n AS nb
      FROM candidates c
      JOIN idx x ON x.doc_id = c.doc_a
      JOIN idx y ON y.doc_id = c.doc_b AND y.sh = x.sh
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      GROUP BY c.doc_a, c.doc_b, sa.n, sb.n
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
    FROM verified
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
)
def q_dedup_minhash_lsh(spark, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection, end to end:

    shingle(3-word) → {MINHASH_K}-function minhash signature → band
    into {MINHASH_K // BAND_SIZE} buckets of {BAND_SIZE} → bucket-join
    for candidates → exact-Jaccard verification ≥ {JACCARD_THRESHOLD}.

    Every stage is a shuffle-on-key relational op; candidate
    generation never compares all pairs (the LSH point). At 100 TB the
    band join is the only large shuffle and it is key-balanced by the
    band hash itself. The verification intersection join runs on a
    df-capped shingle index (df_capped) so no single hot shingle can
    emit a quadratic row burst; set sizes still count every shingle,
    so capped Jaccard only ever under-estimates (scale-safe recall
    trade, mirrored exactly in the oracle)."""
    bands = staged_minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verification via per-doc shingle ARRAYS instead of a double
    # exploded-index join: one aggregation builds (n = total shingle
    # count, arr = df-capped shingle set) per doc, then each candidate
    # pair picks up both profiles by key and intersects natively
    # (array_intersect, JVM-side). Same capped-Jaccard semantics —
    # hot shingles are excluded from the INTERSECTION only, n counts
    # everything — with 2 key-balanced joins instead of 4 plus a
    # re-group. Per-doc arrays are bounded by document length, so no
    # row ever exceeds executor memory at corpus scale.
    profiles = staged_shingle_profiles(spark, sf_dir)
    inter = F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return (
        candidates.join(
            profiles.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n").alias("na"),
                F.col("arr").alias("arr_a"),
            ),
            "doc_a",
        )
        .join(
            profiles.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n").alias("nb"),
                F.col("arr").alias("arr_b"),
            ),
            "doc_b",
        )
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


SIMHASH_BITS = 60
HAMMING_MAX = 3
#: Pigeonhole banding: two fingerprints ≤ HAMMING_MAX bits apart must
#: agree exactly on at least one of HAMMING_MAX+1 disjoint bands, so a
#: band-keyed equi-join finds EVERY qualifying pair (exact recall) while
#: only comparing docs that collide on a 15-bit band value — candidate
#: volume ~ B·N²/2^width instead of the O((N/blocks)²) of attribute
#: blocking.
SIMHASH_BANDS = HAMMING_MAX + 1
SIMHASH_BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS  # 15 bits → 32768 values
_BAND_MASK = (1 << SIMHASH_BAND_WIDTH) - 1


@query(
    "dedup_simhash",
    oracle=f"""
    WITH corpus AS ({AUGMENTED_CORPUS_SQL}),
    toks AS (
      SELECT DISTINCT doc_id, t.token
      FROM corpus, unnest(string_split(trim(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    bits AS (
      SELECT doc_id, r.j,
             SUM(CASE WHEN (('0x' || substr(md5(token), 1, 15))::BIGINT >> r.j) & 1 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM toks, range(0, {SIMHASH_BITS}) AS r(j)
      GROUP BY doc_id, r.j
    ),
    sims AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
               AS simhash
      FROM bits GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, simhash, r.band,
             (simhash >> (r.band * {SIMHASH_BAND_WIDTH})) & {_BAND_MASK} AS band_val
      FROM sims, range(0, {SIMHASH_BANDS}) AS r(band)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS ha, b.simhash AS hb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cands
    WHERE bit_count(xor(ha, hb)) <= {HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """,
)
def q_dedup_simhash(spark, sf_dir: str) -> DataFrame:
    """SimHash near-dup: per-token hash bits vote ±1 per position, the
    sign vector packs into a {SIMHASH_BITS}-bit fingerprint; pairs with
    Hamming distance ≤ {HAMMING_MAX} are near-dups.

    Candidate generation bands the fingerprint itself: {SIMHASH_BANDS}
    disjoint {SIMHASH_BAND_WIDTH}-bit bands, equi-join on (band,
    band_val). Pigeonhole guarantees every pair within HAMMING_MAX
    lands in some band bucket together — exact recall with candidate
    volume bounded by band-bucket collisions (2^{SIMHASH_BAND_WIDTH}
    values per band), not by attribute-block sizes. This is the
    standard web-dedup plan (Manku et al., WWW'07) expressed
    relationally."""
    corpus = augmented_corpus(spark, sf_dir)
    toks = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split(F.trim("text"), " "), lambda x: x != ""))
        ).alias("token"),
    )
    # Per-bit ±1 voting WITHOUT the 60× row explode: one aggregate over
    # (doc, token) rows with 60 bit-sum columns. vote_j = Σ(2·bit_j − 1)
    # = 2·Σbit_j − n_tokens, so bit j of the fingerprint is set iff
    # 2·b_j > n. Shuffle volume stays at one row per (doc, token)
    # instead of SIMHASH_BITS rows — the 100 TB-relevant saving.
    hashed = toks.select("doc_id", portable_hash60(F.col("token")).alias("h"))
    bit_sums = [
        F.sum(F.shiftright("h", j).bitwiseAND(F.lit(1))).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = hashed.groupBy("doc_id").agg(F.count("*").alias("n"), *bit_sums)
    fingerprint = sum(
        (
            F.when(
                2 * F.col(f"b{j}") > F.col("n"), F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            for j in range(SIMHASH_BITS)
        ),
        start=F.lit(0).cast("long"),
    )
    sims = per_doc.select("doc_id", fingerprint.cast("long").alias("simhash"))
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"(simhash >> (band * {SIMHASH_BAND_WIDTH})) & {_BAND_MASK}"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {gram_pairs_ctes(AUGMENTED_CORPUS_SQL)}
    SELECT p.doc_a, p.doc_b,
           CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard
    FROM jpairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.4
    ORDER BY doc_a, doc_b
    """,
)
def q_dedup_ngram_jaccard(spark, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard near-dup via inverted index: explode grams,
    self-join on (gram, block) so only docs *sharing* a gram are ever
    paired, then exact Jaccard from intersection/sizes. No all-pairs
    product; the gram join is the candidate generator, and it runs on a
    df-capped index (GRAM_DF_CAP): a stop-word gram shared by k docs
    would emit k² pairs, so grams over the cap are dropped from the
    index (sizes still count them — capped Jaccard under-estimates,
    never inflates). Mirrored in the oracle (gram_pairs_ctes)."""
    pairs, sizes = gram_pairs_and_sizes(augmented_corpus(spark, sf_dir))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("inter").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("inter")
    )
    return (
        pairs.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.4)
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_sum(list_transform(range(1, len(a.v) + 1),
                          i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(range(1, len(a.v) + 1),
                         i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) >= 0.40
    ORDER BY vec_a, vec_b
    """,
)
def q_dedup_embedding_cosine(spark, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: same-label (cluster) blocking, pair
    cosine ≥ 0.40. Blocking by the coarse cluster id is the IVF trick:
    the pair join is per-block instead of global. Rounded to 6 dp so
    cross-engine float summation order can't flip the hash.

    Threshold note (r14 empty-result audit): the synthetic embeddings
    carry no true near-dups — the max same-label cosine is ~0.45/0.51
    at sf0.01/sf0.1 — so the production-style 0.93 cut returned ZERO
    rows at every scale and the driver's value-hash comparison was
    vacuous. 0.40 selects the top ~5/86 pairs (sf0.01/sf0.1), keeping
    the operator's filter+hash path actually exercised; a real corpus
    would raise the constant back to ~0.9."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    emb = emb.withColumn("nrm", norm)
    a = emb.alias("a")
    b = emb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6)
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.40)
    )


@query(
    "dedup_fuzzy_levenshtein",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           levenshtein(a.p_name, b.p_name) AS distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 5
    ORDER BY id_a, id_b
    """,
)
def q_dedup_fuzzy_levenshtein(spark, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs with canopy blocking: candidate
    pairs are generated only within a blocking key — the standard trick
    that turns O(n²) fuzzy matching into Σ O(block²). The canopy is
    composite (brand × first name token, ~25×90 values), so per-block
    pair volume is (N/2250)² instead of the (N/25)² a brand-only block
    gives; the canopy stays CHEAP (one substring, no DP) and scales its
    cardinality with the data because token diversity grows with N.

    Execution shape: both sides hash-partition on the block key — a
    co-partitioned shuffle join, NO broadcast. Broadcasting the build
    side would ship an sf-scaling table to every executor and OOM at
    100×; a 2 250-value key shuffles fine. The explicit
    `repartition(n, block)` on both sides doubles as the AQE guard: the
    pair explosion and the edit-distance DP happen INSIDE the join
    task, invisible to AQE's byte-based partition sizing, and explicit
    numPartitions is exempt from coalescing, so the DP fans out across
    every core. Output order is unspecified (the correctness gate
    hashes order-insensitively; globally sorting a pair list is a
    pointless full sort at scale)."""
    canopy = F.concat_ws("|", F.col("p_brand"), F.substring_index("p_name", " ", 1))
    a = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("name_a"),
        canopy.alias("block"),
    )
    b = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("name_b"),
        canopy.alias("block"),
    )
    pairs = a.repartition(64, "block").join(b.repartition(64, "block"), "block").filter(
        (F.col("id_a") < F.col("id_b"))
        # provable bound: levenshtein >= |len(a) - len(b)|, so pairs
        # whose lengths differ by >5 can't qualify — pruned before any
        # edit-distance work (and before the DP even allocates).
        & (F.abs(F.length("name_a") - F.length("name_b")) <= 5)
    )
    # thresholded levenshtein: banded O(n*k) DP that early-exits and
    # returns -1 once distance exceeds 5, instead of full O(n^2) DP.
    return (
        pairs.withColumn("distance", F.levenshtein("name_a", "name_b", 5))
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "distance")
    )


#: Edge CTEs shared with the recursive-CC oracle: bigram-Jaccard
#: near-dup pairs (mutant ↔ original) plus exact-copy pairs.
#: CC test corpus: documents + near-dup mutants (+1M, every 10th doc)
#: + verbatim copies (+2M, every 20th doc) — Spark twin `_cc_corpus`.
CC_CORPUS_SQL = f"""{AUGMENTED_CORPUS_SQL}
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text, lang, source
      FROM documents WHERE doc_id % 20 = 0
"""

_CC_EDGES_SQL = f"""{gram_pairs_ctes(CC_CORPUS_SQL)},
    edges AS (
      SELECT p.doc_a AS a, p.doc_b AS b FROM jpairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
      WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.4
    ),
    sym AS (
      SELECT a AS src, b AS dst FROM edges
      UNION ALL SELECT b, a FROM edges
    ),
    nodes AS (SELECT DISTINCT src AS node FROM sym)
"""


def _cc_corpus(spark, sf_dir: str) -> DataFrame:
    """augmented corpus (mutants) + exact copies of every 20th doc."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    exact = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text", "lang", "source"
    )
    return augmented_corpus(spark, sf_dir).unionByName(exact)


_FREE_CHECKPOINT_WARNED = False


def _free_checkpoint(df: DataFrame) -> None:
    """Release the executor storage behind a localCheckpoint'ed frame.

    ``DataFrame.unpersist`` only talks to the CacheManager and does NOT
    free localCheckpoint blocks; the checkpointed RDD itself must be
    unpersisted. Only call this on frames no downstream plan will read
    again — the truncated lineage cannot be recomputed.

    Cleanup is best-effort (it must never fail the job), but a broken
    cleanup path means executor storage grows by one frame per CC
    round again — so the first failure warns once instead of silently
    no-opping forever (the py4j accessor below is version-sensitive).
    """
    global _FREE_CHECKPOINT_WARNED
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as exc:  # pragma: no cover - version-drift guard
        if not _FREE_CHECKPOINT_WARNED:
            _FREE_CHECKPOINT_WARNED = True
            import warnings

            warnings.warn(
                "checkpoint-storage cleanup failed (%r); executor "
                "storage will grow per CC iteration" % (exc,),
                RuntimeWarning,
            )


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iters: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Min-label propagation over an undirected edge list → (node,
    component). The iterative-algorithm pattern: each round is one
    join + one min-aggregation (two shuffles), converging in
    graph-diameter rounds with a driver-side fixpoint check — the
    standard large-graph CC shape (GraphX/pregel-style) expressed in
    plain DataFrame ops. Near-dup clusters have tiny diameters, so
    2-3 rounds close them.

    Two iterative-plan hazards are handled explicitly:
    - ``localCheckpoint(eager=True)`` per round truncates the logical
      plan — without it the lineage doubles every iteration and the
      DRIVER dies on plan analysis long before any executor sweats
      (observed: OOM at ~12 rounds on a 12-node chain).
    - the superseded label frame's checkpoint blocks are freed each
      round (_free_checkpoint), so executor storage stays O(1) in the
      iteration count instead of accruing one frame per round.
    ``checkpoint_dir`` selects the durability tier: ``None`` uses
    ``localCheckpoint`` (executor-local blocks — fast, but an executor
    loss kills the run, fine on local[*]); a path switches every
    truncation to reliable ``checkpoint()`` into that directory
    (HDFS/S3 on a real cluster), so the 100 TB fault-tolerant story is
    a parameter, not a code edit.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _truncate(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def _truncate(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    sym = _truncate(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    )
    labels = _truncate(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(max_iters):
        prop = sym.join(labels, sym.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        new_labels = _truncate(
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        _free_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    # labels is materialized + lineage-truncated, so the edge frame's
    # storage can go too.
    _free_checkpoint(sym)
    return labels.select("node", F.col("label").alias("component"))


@query(
    "dedup_cluster_cc",
    oracle=f"""
    WITH RECURSIVE {_CC_EDGES_SQL},
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.dst, r.label FROM reach r JOIN sym s ON r.node = s.src
    )
    SELECT node AS doc_id, MIN(label) AS component
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def q_dedup_cluster_cc(spark, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: bigram-Jaccard edges over a
    corpus seeded with mutants (+1M) and verbatim copies (+2M) — every
    20th doc yields a 3-node component {x, x+1M, x+2M}. Spark runs
    iterative min-label propagation over the edge list; DuckDB replays
    it as a recursive CTE — two independent CC implementations
    agreeing on every cluster id."""
    pairs, sizes = gram_pairs_and_sizes(_cc_corpus(spark, sf_dir))
    jac = F.col("inter").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("inter")
    )
    edges = (
        pairs.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.4)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    return (
        connected_components(edges)
        .select(F.col("node").alias("doc_id"), "component")
    )


#: SemDeDup cluster count / similarity threshold. K is tiny here for
#: oracle replay; production SemDeDup uses K ≈ sqrt(N) so per-cluster
#: pair volume stays bounded (see docstring).
SEMDEDUP_K = 8
SEMDEDUP_THRESHOLD = 0.92
#: Pair-stage probe buckets: the x side hash-buckets, the b side
#: replicates ×B, so within-cluster pair compute spreads over K×B
#: tasks — parallelism at miniature K and the oversized-cluster skew
#: guard at production K.
SEMDEDUP_PAIR_BUCKETS = 8


@query(
    "dedup_semantic_semdedup",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS nrm
      FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {SEMDEDUP_K}),
    d AS (
      SELECT e.vec_id, e.v, e.nrm, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_sum(list_transform(range(1, len(e.v) + 1),
                        i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6),
                        c.cid) AS rn
      FROM e, c
    ),
    a AS (SELECT vec_id, v, nrm, cid FROM d WHERE rn = 1),
    rem AS (
      SELECT DISTINCT b.vec_id
      FROM a x JOIN a b ON x.cid = b.cid AND x.vec_id < b.vec_id
      WHERE round(list_sum(list_transform(range(1, len(x.v) + 1),
                  i -> x.v[i] * b.v[i])) / (x.nrm * b.nrm), 6)
            >= {SEMDEDUP_THRESHOLD}
    )
    SELECT a.vec_id, a.cid, (r.vec_id IS NULL) AS keep
    FROM a LEFT JOIN rem r ON a.vec_id = r.vec_id
    ORDER BY a.vec_id
    """,
)
def q_dedup_semantic_semdedup(spark, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    space, then WITHIN each cluster drop every vector that has a
    higher-similarity twin with a smaller id (cosine ≥ 0.92), keeping
    one representative per semantic-duplicate set. Centroids are the
    first K vectors (deterministic seed, same as ml_kmeans_lite) so
    the DuckDB oracle replays the assignment as a CTE.

    Scale shape (reworked round 9): assignment is ONE broadcast row
    of all K centroids (collect_list of structs) cross-joined in, and
    the argmin is `array_min` over per-centroid (dist, cid) structs —
    a pure map-side projection, so the corpus genuinely never shuffles
    or row-multiplies for assignment (the previous windowed-argmin
    shape shuffled corpus×K rows on vec_id). The pair stage shuffles
    once on (cluster id, probe bucket): the x side is hash-bucketed
    into SEMDEDUP_PAIR_BUCKETS, the b side replicated to each bucket —
    per-cluster pair compute spreads across K×B tasks instead of K,
    which is both the local win (2.3× at sf0.1: 4.8 s → 2.1 s,
    identical rows) and the oversized-cluster skew guard at scale.
    SemDeDup's whole point is that K grows with N (K ≈ √N) so
    per-cluster volume stays bounded; K=8 here is the
    oracle-replayable miniature. The removed set is DISTINCT vec_ids
    (small by construction) broadcast back as an anti-probe for the
    keep flag.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    emb = emb.withColumn("nrm", norm)
    cent1 = (
        emb.filter(F.col("vec_id") < SEMDEDUP_K)
        .agg(
            F.collect_list(
                F.struct(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
            ).alias("cents")
        )
    )

    def sqd(cv):
        return F.round(
            F.aggregate(
                F.zip_with(F.col("v"), cv, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    # struct comparison is field-order lexicographic → (dist, cid)
    # reproduces the oracle's ORDER BY round(dist,6), cid tie-break
    best = F.array_min(
        F.transform(
            "cents", lambda c: F.struct(sqd(c["cv"]).alias("dist"), c["cid"].alias("cid"))
        )
    )
    assigned = (
        emb.crossJoin(F.broadcast(cent1))
        .withColumn("cid", best["cid"])
        .select("vec_id", "v", "nrm", "cid")
    )
    x = assigned.withColumn(
        "xb", F.pmod(F.hash("vec_id"), F.lit(SEMDEDUP_PAIR_BUCKETS))
    ).alias("x")
    b = assigned.withColumn(
        "xb", F.explode(F.sequence(F.lit(0), F.lit(SEMDEDUP_PAIR_BUCKETS - 1)))
    ).alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("x.v"), F.col("b.v"), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    cosine = F.round(dot / (F.col("x.nrm") * F.col("b.nrm")), 6)
    removed = (
        x.join(
            b,
            (F.col("x.cid") == F.col("b.cid"))
            & (F.col("x.xb") == F.col("b.xb"))
            & (F.col("x.vec_id") < F.col("b.vec_id")),
        )
        .filter(cosine >= SEMDEDUP_THRESHOLD)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("removed", F.lit(True))
    )
    return (
        assigned.join(F.broadcast(removed), "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.col("removed").isNull().alias("keep"),
        )
        .orderBy("vec_id")
    )


#: Containment: flag when the SMALLER shingle set is mostly inside the
#: larger one — catches quote-inclusion / prefix-truncation duplicates
#: that symmetric Jaccard misses (a short doc embedded in a long one
#: has high containment but low Jaccard).
CONTAINMENT_THRESHOLD = 0.8


@query(
    "dedup_containment",
    oracle=f"""
    WITH corpus AS ({AUGMENTED_CORPUS_SQL}),
    toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t, lang, source FROM corpus
    ),
    grams AS (
      SELECT DISTINCT doc_id, g, lang, source FROM (
        SELECT doc_id, lang, source,
               unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM toks) WHERE g IS NOT NULL
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    idx AS ({_df_cap_sql("grams", "g")}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM idx a JOIN idx b
        ON a.g = b.g AND a.lang = b.lang AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CASE WHEN sa.n <= sb.n THEN p.doc_a ELSE p.doc_b END AS doc_small,
           CASE WHEN sa.n <= sb.n THEN p.doc_b ELSE p.doc_a END AS doc_big,
           round(CAST(p.inter AS DOUBLE) / least(sa.n, sb.n), 6)
             AS containment_r6
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE CAST(p.inter AS DOUBLE) / least(sa.n, sb.n)
            >= {CONTAINMENT_THRESHOLD}
    ORDER BY doc_small, doc_big
    """,
)
def q_dedup_containment(spark, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: C(A,B) = |A∩B| / min(|A|,|B|)
    over 3-word shingle sets, flagged at ≥ CONTAINMENT_THRESHOLD. Same
    scale shape as `dedup_ngram_jaccard` — (lang, source)-blocked
    df-capped inverted-index join, never all-pairs; only the SCORE
    differs (min-normalized instead of union-normalized), which is
    what surfaces the planted prefix-truncation mutants as containment
    ≈ 1.0 while their Jaccard sits near the threshold. The score is a
    ratio of exact integers — identical doubles on both engines."""
    # Ride the family's staged (doc_id, sh) shingle table instead of
    # re-deriving the corpus explode per consumer: the former inline
    # `grams` lineage appeared SIX times in the executed plan (sizes,
    # df-cap count, anti-join left, x2 for the self-join = census 12
    # scans / 17 exchanges) because each consumer sits on a different
    # subtree shape, so ReuseExchange cannot dedupe them. lang/source
    # are DOC-level attributes, so the (lang, source) blocking is
    # equivalent as a PAIR-level filter after the gram join: a doc pair
    # either matches on both (all shared grams count) or is dropped
    # whole — value-identical to the gram-level predicate, and the
    # per-gram fan-out stays bounded by GRAM_DF_CAP² regardless of
    # blocking. At 100 TB this is one corpus explode per app (the
    # inverted-index materialization) instead of six per query.
    sh = staged_shingles(spark, sf_dir, 3)
    attrs = augmented_corpus(spark, sf_dir).select("doc_id", "lang", "source")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    idx = df_capped(sh, "sh")
    a, b = idx.alias("a"), idx.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    aa = attrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("source_a"),
    )
    ab = attrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    scored = (
        pairs.join(aa, "doc_a")
        .join(ab, "doc_b")
        .filter(
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("source_a") == F.col("source_b"))
        )
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment",
            F.col("inter").cast("double") / F.least(F.col("na"), F.col("nb")),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )
    small_first = F.col("na") <= F.col("nb")
    return scored.select(
        F.when(small_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "doc_small"
        ),
        F.when(small_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
            "doc_big"
        ),
        F.round("containment", 6).alias("containment_r6"),
    ).orderBy("doc_small", "doc_big")


#: Content-defined chunking: rolling-hash window, polynomial base,
#: modulus, and the boundary mask (avg chunk ≈ mask+1 chars).
CDC_W = 8
CDC_B = 31
CDC_M = 1 << 20
CDC_MASK = 32
CDC_TOP = 20

#: Σ ascii(c_{i-k})·B^k for k=0..W-1 — rendered once for both engines.
_CDC_POWS = [CDC_B**k for k in range(CDC_W)]
#: Spark reads codepoints from a per-doc array materialized ONCE
#: (8 substring() calls per position was an 8× hot-loop cost —
#: measured 14.4 s → 3.5 s at sf0.1 after caching the array).
_CDC_H_SPARK = " + ".join(
    f"element_at(cps, CAST(i AS INT) - {k}) * {p}L"
    for k, p in enumerate(_CDC_POWS)
)
_CDC_H_SQL = " + ".join(
    f"CAST(ascii(substr(text, CAST(i AS INT) - {k}, 1)) AS BIGINT) * {p}"
    for k, p in enumerate(_CDC_POWS)
)


@query(
    "dedup_cdc_chunking",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, len(text) AS n,
             list_filter(range(CAST({CDC_W} AS BIGINT), len(text) + 1),
               i -> (({_CDC_H_SQL}) % {CDC_M}) % {CDC_MASK} = 0) AS bpos
      FROM documents
    ),
    ranges AS (
      SELECT doc_id,
             list_prepend(CAST(0 AS BIGINT), bpos) AS starts,
             list_append(bpos, CAST(n AS BIGINT)) AS ends,
             text
      FROM b
    ),
    chunks AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(range(1, len(starts) + 1),
                 i -> substr(text, CAST(starts[i] AS INT) + 1,
                             CAST(ends[i] - starts[i] AS INT))),
               c -> c <> '')) AS chunk
      FROM ranges
    )
    SELECT md5(chunk) AS chunk_hash,
           CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(MIN(len(chunk)) AS BIGINT) AS chunk_len
    FROM chunks GROUP BY chunk_hash
    ORDER BY n_occ DESC, chunk_hash LIMIT {CDC_TOP}
    """,
    tags=("dedup", "beyond"),
)
def q_dedup_cdc_chunking(spark, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the rsync/LBFS primitive;
    Muthitacharoen et al. 2001): cut every document at positions where
    an 8-char polynomial rolling hash ≡ 0 (mod {CDC_MASK}), hash the
    resulting variable-size chunks, and report the most-shared chunks
    across the corpus — byte-level storage dedup that, unlike
    fixed-size blocks, survives insertions (an edit only reshapes the
    chunks it touches, because boundaries depend on CONTENT, not
    offsets). The same primitive backs chunk-level dedup of crawl
    snapshots and model-checkpoint stores.

    Scale shape: boundary detection and chunk splitting are pure
    map-side array expressions (one transform over positions, cost
    O(len·W) per doc, no explode until chunks exist); the only shuffle
    is the chunk-hash groupBy — map-side combinable, keyed by content
    hash exactly like `dedup_exact_hash`. No min/max-chunk clamps here
    (production adds them to bound chunk-size variance; they are more
    CASE arms on the same boundary list). The polynomial hash is
    integer-exact (max term sum ≈ 5.6e13 ≪ 2^63) and md5 chunk ids are
    portable, so DuckDB replays boundaries AND chunk identities
    bit-for-bit."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # One byte-cheap raw-row shuffle fans the single local parquet
        # split out to full width before the O(len·W) per-char hashing
        # (the augmented_corpus discipline; on a cluster the scan has
        # thousands of splits and this is a cheap no-op rebalance).
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "text",
            # split('') is O(len) total; the per-index
            # substring(text, i, 1) alternative re-scans the string
            # from the front each call — O(len^2) per document.
            F.expr("transform(split(text, ''), c -> ascii(c))").alias(
                "cps"
            ),
        )
    )
    b = docs.select(
        "doc_id",
        "text",
        F.expr(
            f"filter(sequence({CDC_W}L, length(text)),"
            f" i -> (({_CDC_H_SPARK}) % {CDC_M}) % {CDC_MASK} = 0)"
        ).alias("bpos"),
    )
    ranges = b.select(
        "doc_id",
        "text",
        F.expr("concat(array(0L), bpos)").alias("starts"),
        F.expr("concat(bpos, array(CAST(length(text) AS BIGINT)))").alias(
            "ends"
        ),
    )
    chunks = ranges.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(sequence(1, size(starts)),"
                " i -> substring(text, CAST(element_at(starts, i) AS INT) + 1,"
                " CAST(element_at(ends, i) - element_at(starts, i) AS INT))),"
                " c -> c != '')"
            )
        ).alias("chunk"),
    )
    return (
        chunks.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(
            F.count("*").cast("long").alias("n_occ"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.min(F.length("chunk")).cast("long").alias("chunk_len"),
        )
        .orderBy(F.desc("n_occ"), "chunk_hash")
        .limit(CDC_TOP)
    )


@query(
    "dedup_incremental_minhash",
    oracle=f"""
    WITH corpus AS ({AUGMENTED_CORPUS_SQL}),
    toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM corpus
    ),
    shingles AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        FROM toks) WHERE sh IS NOT NULL AND sh <> ''
    ),
    sigs AS (
      SELECT doc_id, i,
             MIN(('0x' || substr(md5(CAST(i AS VARCHAR) || '#' || sh), 1, 8))::BIGINT)
               AS minh
      FROM shingles, range(0, {MINHASH_K}) AS r(i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {BAND_SIZE} AS band,
             md5(string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i)) AS band_key
      FROM sigs GROUP BY doc_id, i // {BAND_SIZE}
    ),
    candidates AS (
      SELECT DISTINCT new.doc_id AS new_doc, old.doc_id AS dup_of
      FROM bands new JOIN bands old
        ON new.band = old.band AND new.band_key = old.band_key
      WHERE new.doc_id % 4 = 0 AND old.doc_id % 4 <> 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    idx AS ({_df_cap_sql("shingles", "sh")}),
    verified AS (
      SELECT c.new_doc, c.dup_of, COUNT(*) AS inter, sa.n AS na, sb.n AS nb
      FROM candidates c
      JOIN idx x ON x.doc_id = c.new_doc
      JOIN idx y ON y.doc_id = c.dup_of AND y.sh = x.sh
      JOIN sizes sa ON sa.doc_id = c.new_doc
      JOIN sizes sb ON sb.doc_id = c.dup_of
      GROUP BY c.new_doc, c.dup_of, sa.n, sb.n
    )
    SELECT new_doc, dup_of,
           CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
    FROM verified
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
    ORDER BY new_doc, dup_of
    """,
)
def q_dedup_incremental_minhash(spark, sf_dir: str) -> DataFrame:
    """INCREMENTAL MinHash dedup — the nightly-batch production shape:
    new documents (here every 4th doc id, standing in for today's
    crawl) are banded and probed against the EXISTING corpus's band
    index, never against each other and never re-banding history. The
    daily cost is O(|new|) band rows joined into a persisted,
    bucketed-by-(band, band_key) index, instead of the full self-join
    `dedup_minhash_lsh` runs — this is the difference between an
    O(corpus) nightly job and an O(delta) one at 100 TB.

    Reuses the identical signature/band construction
    (`minhash_band_rows`, md5-portable) and the same df-capped
    exact-Jaccard verification, so an accepted (new_doc, dup_of) match
    here is bit-identical to what the batch self-join would have
    found. Output: which new docs are near-dups of which indexed docs
    (the reject list the ingest gate consumes)."""
    bands = staged_minhash_bands(spark, sf_dir)
    incoming = bands.filter(F.col("doc_id") % 4 == 0)
    index = bands.filter(F.col("doc_id") % 4 != 0)
    candidates = (
        incoming.alias("new")
        .join(
            index.alias("old"),
            (F.col("new.band") == F.col("old.band"))
            & (F.col("new.band_key") == F.col("old.band_key")),
        )
        .select(
            F.col("new.doc_id").alias("new_doc"),
            F.col("old.doc_id").alias("dup_of"),
        )
        .distinct()
    )
    profiles = staged_shingle_profiles(spark, sf_dir)
    inter = F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return (
        candidates.join(
            profiles.select(
                F.col("doc_id").alias("new_doc"),
                F.col("n").alias("na"),
                F.col("arr").alias("arr_a"),
            ),
            "new_doc",
        )
        .join(
            profiles.select(
                F.col("doc_id").alias("dup_of"),
                F.col("n").alias("nb"),
                F.col("arr").alias("arr_b"),
            ),
            "dup_of",
        )
        .select("new_doc", "dup_of", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("new_doc", "dup_of")
    )


#: Winnowing: char k-gram size, window width, similarity floor.
WIN_K = 8
WIN_W = 8
WIN_SIM = 0.3


@query(
    "dedup_winnowing",
    oracle=f"""
    WITH corpus AS ({AUGMENTED_CORPUS_SQL}),
    grams AS (
      SELECT doc_id, i,
             CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), {WIN_K})),
                   1, 8)) AS BIGINT) AS h
      FROM corpus, unnest(range(1, len(text) - {WIN_K} + 2)) AS t(i)
      WHERE len(text) >= {WIN_K}
    ),
    wins AS (
      SELECT doc_id, i,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS fp,
             MAX(i) OVER (PARTITION BY doc_id) AS max_i
      FROM grams
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp
      FROM wins WHERE i <= max_i - {WIN_W - 1}
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM fps GROUP BY doc_id),
    idx AS ({_df_cap_sql("fps", "fp")}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, p.shared,
           round(CAST(p.shared AS DOUBLE) / least(sa.n, sb.n), 6) AS winnow_sim
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE CAST(p.shared AS DOUBLE) / least(sa.n, sb.n) >= {WIN_SIM}
    ORDER BY doc_a, doc_b
    """,
)
def q_dedup_winnowing(spark, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint near-dup detection (Schleimer, Wilkerson
    & Aiken 2003 — the MOSS algorithm): hash every {WIN_K}-char gram,
    slide a {WIN_W}-window over the hash sequence keeping each
    window's MINIMUM, and compare documents by their selected
    fingerprint SETS — guaranteed to detect any shared substring of
    length ≥ k + w − 1 while storing ~2/(w+1) of the grams. The
    char-level complement to the word-shingle MinHash family: catches
    verbatim reuse that tokenization hides (whitespace/punctuation
    edits). Selection here is by min VALUE per window (the classic
    rightmost-position tie rule changes which position is recorded,
    not which hash values survive — and matching is on values).

    Scale shape: fingerprint selection is ENTIRELY map-side — per doc
    one array of gram hashes, one transform taking each window's
    array_min, one array_distinct — so no per-position row explode
    (the earlier shape carried a full copy of the text on every one
    of its len(text) gram rows), no per-doc sort window, and no
    (doc, fp) distinct shuffle; the first shuffle any byte sees is
    the df-capped inverted-index join every other near-dup operator
    uses (GRAM_DF_CAP bounds hot-fingerprint fan-out at cap²).
    The gram-hash array is bound once via a single-element transform
    lambda so CollapseProject cannot re-inline its construction into
    every window's array_min (the adaboost explode-barrier lesson,
    solved here without the barrier). Similarity =
    shared / min(|A|,|B|) — the containment-style normalization that
    survives length mismatch."""
    fps = staged_winnow_fps(spark, sf_dir)
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("n"))
    idx = df_capped(fps, "fp")
    a = idx.select(F.col("doc_id").alias("doc_a"), "fp")
    b = idx.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    sim = F.round(
        F.col("shared").cast("double") / F.least("na", "nb"), 6
    )
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", "shared", sim.alias("winnow_sim"))
        .filter(F.col("winnow_sim") >= WIN_SIM)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_best_of_cluster",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 3000000, upper(text)
      FROM documents WHERE doc_id % 12 = 0
      UNION ALL
      SELECT doc_id + 4000000, text || ' !!! *** !!!'
      FROM documents WHERE doc_id % 12 = 0
    ),
    scored AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h,
             round(CAST(length(trim(regexp_replace(regexp_replace(
                     lower(text), '[^a-z0-9 ]', ' ', 'g'),
                     '\\s+', ' ', 'g'))) AS DOUBLE)
                   / length(text), 6) AS clean_ratio
      FROM corpus
    ),
    ranked AS (
      SELECT doc_id, h, clean_ratio,
             row_number() OVER (PARTITION BY h
                                ORDER BY clean_ratio DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY h) AS n
      FROM scored
    )
    SELECT h AS cluster_hash,
           CAST(n AS BIGINT) AS n_members,
           doc_id AS rep_doc_id,
           clean_ratio AS rep_clean_ratio,
           CAST(n - 1 AS BIGINT) AS n_dropped
    FROM ranked WHERE rk = 1 AND n >= 2
    ORDER BY cluster_hash
    """,
    tags=("dedup", "curation", "beyond"),
)
def q_dedup_best_of_cluster(spark, sf_dir: str) -> DataFrame:
    """Cluster-representative SELECTION — the policy step after
    duplicate detection: exact dedup keeps min-id (dedup_exact_hash),
    but a curation pipeline keeps the BEST copy. Documents cluster
    under a normalization key (lowercase, punctuation stripped,
    whitespace collapsed — so case variants and punctuation-mangled
    mirrors collide); within a cluster the representative is the copy
    with the highest cleanliness ratio |normalized| / |raw| (a junk-
    suffixed mirror scores lower; a pure case variant ties and the
    smallest doc_id wins). Every 12th document is planted with an
    uppercased mirror and a punctuation-appended mirror, so clusters
    deterministically exercise both tie-break arms.

    Scale: one map-side normalize+hash pass, ONE groupBy(h) with a
    max_by aggregate — no window, no sort, no pairwise anything; the
    plan is identical in shape to dedup_exact_hash (the oracle uses a
    rank window only because DuckDB's arg_max takes a single ordering
    key)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = (
        docs.unionByName(
            docs.filter(F.col("doc_id") % 12 == 0).select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.upper("text").alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 12 == 0).select(
                (F.col("doc_id") + 4000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" !!! *** !!!")).alias("text"),
            )
        )
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), r"\s+", " "
        )
    )
    scored = corpus.select(
        "doc_id",
        F.md5(norm).alias("h"),
        F.round(
            F.length(norm).cast("double") / F.length("text"), 6
        ).alias("clean_ratio"),
    )
    best = F.max_by(
        F.struct(F.col("doc_id"), F.col("clean_ratio")),
        F.struct(F.col("clean_ratio"), (-F.col("doc_id")).alias("nd")),
    )
    return (
        scored.groupBy(F.col("h").alias("cluster_hash"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            best.alias("best"),
        )
        .filter(F.col("n_members") >= 2)
        .select(
            "cluster_hash",
            "n_members",
            F.col("best.doc_id").alias("rep_doc_id"),
            F.col("best.clean_ratio").alias("rep_clean_ratio"),
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("cluster_hash")
    )


@query(
    "dedup_soft_downweight",
    oracle=f"""
    WITH corpus AS (
      {AUGMENTED_CORPUS_SQL}
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text, lang, source
      FROM documents WHERE doc_id % 20 = 0
    ),
    c AS (
      SELECT doc_id, source, md5(text) AS h,
             COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
      FROM corpus
    )
    SELECT doc_id, source, h AS content_hash,
           CAST(n_copies AS BIGINT) AS n_copies,
           round(1.0 / n_copies, 6) AS weight_r6
    FROM c ORDER BY doc_id
    """,
)
def q_dedup_soft_downweight(spark, sf_dir: str) -> DataFrame:
    """SOFT dedup — keep every copy but downweight it: each document
    gets loss weight 1/n_copies of its exact-content cluster, so a
    page crawled 10 000 times contributes one page's worth of
    gradient instead of dominating the epoch, while (unlike hard
    dedup) no variant is thrown away and the weights stay usable for
    mixture re-balancing downstream. This is the weighting
    counterpart of `dedup_exact_hash` (same corpus-with-exact-copies
    fixture, same md5 clustering).

    Spark-first shape: ONE count window partitioned by the content
    hash — key-partitioned (never a global window), one shuffle, and
    the per-row weight is expression arithmetic (1/n rounded per row,
    so no order-dependent double sums anywhere).

    Scale: identical to exact dedup's groupBy — the window's
    partition key is the content hash, near-uniform by construction;
    a pathological mega-cluster degrades to one big partition exactly
    as the groupBy would, with AQE skew split as the backstop."""
    corpus = augmented_corpus(spark, sf_dir).unionByName(
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            "text",
            "lang",
            "source",
        )
    )
    w = Window.partitionBy("h")
    return (
        corpus.select("doc_id", "source", F.md5("text").alias("h"))
        .withColumn("n_copies", F.count("*").over(w).cast("long"))
        .select(
            "doc_id",
            "source",
            F.col("h").alias("content_hash"),
            "n_copies",
            F.round(F.lit(1.0) / F.col("n_copies"), 6).alias("weight_r6"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_lsh_recall_audit",
    oracle=f"""
    WITH corpus AS ({AUGMENTED_CORPUS_SQL}),
    toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM corpus
    ),
    shingles AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        FROM toks) WHERE sh IS NOT NULL AND sh <> ''
    ),
    sigs AS (
      SELECT doc_id, i,
             MIN(('0x' || substr(md5(CAST(i AS VARCHAR) || '#' || sh), 1, 8))::BIGINT)
               AS minh
      FROM shingles, range(0, {MINHASH_K}) AS r(i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {BAND_SIZE} AS band,
             md5(string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i)) AS band_key
      FROM sigs GROUP BY doc_id, i // {BAND_SIZE}
    ),
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    idx AS ({_df_cap_sql('shingles', 'sh')}),
    truth AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM idx x
      JOIN idx y ON y.sh = x.sh AND x.doc_id < y.doc_id
      JOIN sizes sa ON sa.doc_id = x.doc_id
      JOIN sizes sb ON sb.doc_id = y.doc_id
      GROUP BY x.doc_id, y.doc_id, sa.n, sb.n
      HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*))
             >= {JACCARD_THRESHOLD}
    ),
    hit AS (
      SELECT COUNT(*) AS n_hit
      FROM truth t JOIN candidates c
        ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    )
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT COUNT(*) FROM candidates) AS BIGINT)
             AS n_candidates,
           CAST(n_hit AS BIGINT) AS n_hit,
           round(CAST(n_hit AS DOUBLE)
                 / (SELECT COUNT(*) FROM truth), 6) AS recall_r6,
           round(CAST(n_hit AS DOUBLE)
                 / (SELECT COUNT(*) FROM candidates), 6)
             AS candidate_precision_r6
    FROM hit
    """,
)
def q_dedup_lsh_recall_audit(spark, sf_dir: str) -> DataFrame:
    """Recall audit of the MinHash-LSH candidate generator against
    EXACT shingle-Jaccard ground truth — the measurement that turns
    "we use LSH" into "our dedup misses X% of true near-dups": truth =
    pairs with capped-index Jaccard ≥ {JACCARD_THRESHOLD} (the same
    exact-verification machinery dedup_minhash_lsh applies AFTER
    banding, here run as its own candidate generator), candidates =
    pairs sharing ≥1 LSH band. Emits recall (share of true pairs the
    bands surface) and candidate precision (share of banded pairs
    that are true near-dups) — the two dials MINHASH_K/BAND_SIZE trade
    against each other (S-curve: P[cand] = 1−(1−J^{BAND_SIZE})^{MINHASH_K // BAND_SIZE}).

    Spark-first shape: both generators are the EXISTING bounded plans
    (banded equi-join; df-capped inverted index) joined on the pair
    key — nothing all-pairs is introduced by auditing; counts are
    exact integers.

    Scale: the audit costs one extra pair-key join over the two
    bounded candidate sets; run it on a sampled partition in
    production for a continuous dedup-quality monitor."""
    sh = staged_shingles(spark, sf_dir, 3)
    bands = staged_minhash_bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    idx = df_capped(sh, "sh")
    x, y = idx.alias("x"), idx.alias("y")
    truth = (
        x.join(
            y,
            (F.col("y.sh") == F.col("x.sh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
        .join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .filter(
            F.col("inter").cast("double")
            / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    # Single-pass counting: a full-outer join on the pair key scores
    # truth size, candidate size, and the intersection in ONE
    # aggregation, so each generator subtree executes exactly once
    # (three separate count jobs would re-run the expensive
    # shingle-pair and band joins).
    j = truth.withColumn("t", F.lit(1)).join(
        candidates.withColumn("c", F.lit(1)),
        ["doc_a", "doc_b"],
        "full_outer",
    )
    counts = j.agg(
        F.sum(F.coalesce(F.col("t"), F.lit(0))).cast("long").alias("n_truth"),
        F.sum(F.coalesce(F.col("c"), F.lit(0)))
        .cast("long")
        .alias("n_candidates"),
        F.sum(
            F.when(F.col("t").isNotNull() & F.col("c").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_hit"),
    )
    return (
        counts
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_truth"), 6
            ).alias("recall_r6"),
            F.round(
                F.col("n_hit").cast("double") / F.col("n_candidates"), 6
            ).alias("candidate_precision_r6"),
        )
    )

