"""Published corpus-quality filter suites (beyond-reference).

Two filter families every LLM training-data pipeline ships:

- `text_gopher_filters` — the Gopher repetition/format rules (Rae et
  al. 2021, "Scaling Language Models: Methods, Analysis & Insights
  from Training Gopher", Table A1): word-count bounds, mean-word-
  length bounds, symbol-to-word ratio, bullet/ellipsis line ratios,
  alphabetic-word ratio, minimum stop-word presence.
- `text_ccnet_buckets` — CCNet's head/middle/tail split (Wenzek et
  al. 2020): per-language perplexity terciles under a corpus LM, the
  standard way to grade web text into quality tiers before mixing.

The synthetic corpus is clean word soup, so the Gopher query SEEDS
deterministic dirty variants per doc_id residue (same discipline as
text_pii_redact's planted emails) — every rule demonstrably fires.

Exactness: every Gopher rule is an integer cross-multiplication
(3·n_words ≤ n_chars instead of a float mean compare), so the flags
hash-match with no float involved anywhere. The CCNet tercile is an
NTILE over the round-6 perplexity score with doc_id tie-break —
deterministic rank input on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: Gopher thresholds (Rae et al. 2021, Table A1) — the word-count
#: lower bound keeps the published value; the corpus's 10-110-word
#: docs make it discriminative rather than vacuous.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
#: symbol-to-word < 0.1; bullet lines ≤ 0.9; ellipsis lines ≤ 0.3;
#: alphabetic words > 0.8 — all applied as integer cross-multiplies.
GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in")
GOPHER_MIN_STOPWORDS = 2

#: Distinct-stopword presence count, rendered once for the oracle.
_STOP_KINDS_SQL = " + ".join(
    "CASE WHEN list_contains(string_split_regex(text, '\\s+'), "
    "'" + sw + "') THEN 1 ELSE 0 END"
    for sw in GOPHER_STOPWORDS
)

_SEED_SQL = """
      SELECT doc_id, source,
             CASE doc_id % 13
               WHEN 0 THEN text || ' ### ## #### ### ## # ###'
               WHEN 1 THEN '- one' || chr(10) || '- two' || chr(10) ||
                           '- three' || chr(10) || '- four'
               WHEN 2 THEN 'alpha beta...' || chr(10) || 'gamma delta...'
                           || chr(10) || 'epsilon zeta...' || chr(10)
                           || 'keep this line'
               WHEN 3 THEN 'xx qq zz ww yy vv kk jj'
               ELSE text
             END AS text
      FROM documents
"""


@query(
    "text_gopher_filters",
    oracle=f"""
    WITH seeded AS ({_SEED_SQL}),
    feats AS (
      SELECT doc_id, source,
        len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
          AS n_words,
        length(regexp_replace(text, '\\s+', '', 'g')) AS n_wchars,
        length(text) - length(replace(text, '#', '')) AS n_hash,
        (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell,
        len(string_split(text, chr(10))) AS n_lines,
        len(list_filter(string_split(text, chr(10)),
                        x -> starts_with(x, '- '))) AS n_bullet,
        len(list_filter(string_split(text, chr(10)),
                        x -> ends_with(x, '...'))) AS n_ell_lines,
        len(list_filter(string_split_regex(text, '\\s+'),
                        x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
        {_STOP_KINDS_SQL} AS n_stop_kinds
      FROM seeded
    ),
    flags AS (
      SELECT source,
        CASE WHEN n_words < {GOPHER_MIN_WORDS}
               OR n_words > {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS f_words,
        CASE WHEN {GOPHER_MIN_MEAN_WORD_LEN} * n_words > n_wchars
               OR n_wchars > {GOPHER_MAX_MEAN_WORD_LEN} * n_words
             THEN 1 ELSE 0 END AS f_wordlen,
        CASE WHEN 10 * (n_hash + n_ell) >= n_words THEN 1 ELSE 0 END
          AS f_symbol,
        CASE WHEN 10 * n_bullet > 9 * n_lines THEN 1 ELSE 0 END AS f_bullet,
        CASE WHEN 10 * n_ell_lines > 3 * n_lines THEN 1 ELSE 0 END
          AS f_ellipsis,
        CASE WHEN 5 * n_alpha <= 4 * n_words THEN 1 ELSE 0 END AS f_alpha,
        CASE WHEN n_stop_kinds < {GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END
          AS f_stop
      FROM feats
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_words) AS BIGINT) AS fail_word_count,
           CAST(SUM(f_wordlen) AS BIGINT) AS fail_word_len,
           CAST(SUM(f_symbol) AS BIGINT) AS fail_symbol_ratio,
           CAST(SUM(f_bullet) AS BIGINT) AS fail_bullet_lines,
           CAST(SUM(f_ellipsis) AS BIGINT) AS fail_ellipsis_lines,
           CAST(SUM(f_alpha) AS BIGINT) AS fail_alpha_ratio,
           CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords,
           CAST(SUM(CASE WHEN f_words + f_wordlen + f_symbol + f_bullet
                          + f_ellipsis + f_alpha + f_stop = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM flags GROUP BY source ORDER BY source
    """,
    tags=("quality", "curation", "beyond"),
)
def q_text_gopher_filters(spark, sf_dir: str) -> DataFrame:
    """Gopher quality-rule sweep (Rae et al. 2021 Table A1) over the
    corpus, reported as per-source rule-failure counts — the audit a
    pipeline runs to decide which sources need which filters BEFORE
    dropping a single row. Dirty variants (symbol spam, all-bullet
    docs, ellipsis-line docs, stopword-free gibberish) are seeded
    deterministically by doc_id residue so every rule demonstrably
    fires on this corpus.

    Scale shape: ONE scan — every rule is a native string/array
    expression fused into the same projection (like
    validate_expectations), and the output is |sources| rows from one
    map-side-combinable aggregation. No rule needs corpus statistics,
    so there is no second pass and no broadcast. Exactness: every
    threshold is an integer cross-multiply (3·n_words ≤ n_chars, not
    a float mean) — no doubles anywhere."""
    seeded = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.col("text"), F.lit(" ### ## #### ### ## # ###")),
        )
        .when(F.col("doc_id") % 13 == 1, F.lit("- one\n- two\n- three\n- four"))
        .when(
            F.col("doc_id") % 13 == 2,
            F.lit("alpha beta...\ngamma delta...\nepsilon zeta...\nkeep this line"),
        )
        .when(F.col("doc_id") % 13 == 3, F.lit("xx qq zz ww yy vv kk jj"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    words = F.filter(F.split(F.col("text"), "\\s+"), lambda x: x != "")
    lines = F.split(F.col("text"), "\n")
    feats = seeded.select(
        "source",
        F.size(words).alias("n_words"),
        F.length(F.regexp_replace(F.col("text"), "\\s+", "")).alias("n_wchars"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
        ).alias("n_hash"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("..."))))
            / F.lit(3)
        )
        .cast("long")
        .alias("n_ell"),
        F.size(lines).alias("n_lines"),
        F.size(F.filter(lines, lambda x: x.startswith("- "))).alias("n_bullet"),
        F.size(F.filter(lines, lambda x: x.endswith("..."))).alias(
            "n_ell_lines"
        ),
        F.size(F.filter(words, lambda x: x.rlike("[a-z]"))).alias("n_alpha"),
        sum(
            F.when(F.array_contains(words, sw), 1).otherwise(0)
            for sw in GOPHER_STOPWORDS
        ).alias("n_stop_kinds"),
    )
    f_words = F.when(
        (F.col("n_words") < GOPHER_MIN_WORDS)
        | (F.col("n_words") > GOPHER_MAX_WORDS),
        1,
    ).otherwise(0)
    f_wordlen = F.when(
        (GOPHER_MIN_MEAN_WORD_LEN * F.col("n_words") > F.col("n_wchars"))
        | (F.col("n_wchars") > GOPHER_MAX_MEAN_WORD_LEN * F.col("n_words")),
        1,
    ).otherwise(0)
    f_symbol = F.when(
        10 * (F.col("n_hash") + F.col("n_ell")) >= F.col("n_words"), 1
    ).otherwise(0)
    f_bullet = F.when(10 * F.col("n_bullet") > 9 * F.col("n_lines"), 1).otherwise(0)
    f_ellipsis = F.when(
        10 * F.col("n_ell_lines") > 3 * F.col("n_lines"), 1
    ).otherwise(0)
    f_alpha = F.when(5 * F.col("n_alpha") <= 4 * F.col("n_words"), 1).otherwise(0)
    f_stop = F.when(F.col("n_stop_kinds") < GOPHER_MIN_STOPWORDS, 1).otherwise(0)
    flags = feats.select(
        "source",
        f_words.alias("f_words"),
        f_wordlen.alias("f_wordlen"),
        f_symbol.alias("f_symbol"),
        f_bullet.alias("f_bullet"),
        f_ellipsis.alias("f_ellipsis"),
        f_alpha.alias("f_alpha"),
        f_stop.alias("f_stop"),
    )
    total_fails = (
        F.col("f_words")
        + F.col("f_wordlen")
        + F.col("f_symbol")
        + F.col("f_bullet")
        + F.col("f_ellipsis")
        + F.col("f_alpha")
        + F.col("f_stop")
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("f_words").cast("long").alias("fail_word_count"),
            F.sum("f_wordlen").cast("long").alias("fail_word_len"),
            F.sum("f_symbol").cast("long").alias("fail_symbol_ratio"),
            F.sum("f_bullet").cast("long").alias("fail_bullet_lines"),
            F.sum("f_ellipsis").cast("long").alias("fail_ellipsis_lines"),
            F.sum("f_alpha").cast("long").alias("fail_alpha_ratio"),
            F.sum("f_stop").cast("long").alias("fail_stopwords"),
            F.sum(F.when(total_fails == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
        )
        .orderBy("source")
    )


#: CCNet buckets: perplexity terciles per language (1 = head/best,
#: 3 = tail/worst), computed over the SAME add-one unigram LM as
#: text_lm_perplexity.
CCNET_BUCKETS = 3

#: Two-level rank buckets for the exact per-lang NTILE (round 9).
CCNET_RANK_BUCKETS = 64


@query(
    "text_ccnet_buckets",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
      WHERE t <> ''
    ),
    counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
    totals AS (SELECT COUNT(*) AS n, COUNT(DISTINCT token) AS v FROM tok),
    per_doc AS (
      SELECT tok.doc_id,
             round(SUM(-ln(CAST(counts.c + 1 AS DOUBLE)
                           / (totals.n + totals.v))) / COUNT(*), 6)
               AS avg_neg_logp
      FROM tok JOIN counts USING (token) CROSS JOIN totals
      GROUP BY tok.doc_id
    ),
    bucketed AS (
      SELECT d.lang, p.avg_neg_logp,
             NTILE({CCNET_BUCKETS}) OVER (
               PARTITION BY d.lang
               ORDER BY p.avg_neg_logp, p.doc_id) AS bucket
      FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(MIN(avg_neg_logp), 6) AS min_score,
           round(MAX(avg_neg_logp), 6) AS max_score
    FROM bucketed GROUP BY lang, bucket ORDER BY lang, bucket
    """,
    tags=("quality", "curation", "beyond"),
)
def q_text_ccnet_buckets(spark, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020): per-language
    perplexity terciles under the corpus unigram LM — bucket 1 is the
    cleanest text, bucket 3 the candidate-discard tail. The tiering
    step between scoring (text_lm_perplexity) and mixing
    (sample_temperature_mixture).

    Plan shape: the LM score is the same two-shuffle pipeline as
    text_lm_perplexity (vocab join-back broadcast, per-doc agg); the
    tercile is an EXACT per-lang NTILE computed as a two-level rank
    (round 9) — within-(lang, score-range-bucket) row_number plus the
    bucket's cumulative count offset from a bounded table, closed into
    NTILE's uneven-split rule as ((r−1)·B) div n + 1 — because a
    window keyed on |langs| alone would funnel every language's
    per-doc scores through one task, and WindowGroupLimit cannot
    prune NTILE (every row keeps a bucket). Ranks are on the ROUND-6
    score with doc_id tie-break, so both engines assign identical
    buckets; the two-level split is bit-identical to the single
    window (verified against DuckDB's NTILE at sf0.01 and sf0.1)."""
    docs = load(spark, sf_dir, "documents")
    # The per-doc LM score table is the staged leg SHARED with
    # text_lm_perplexity (staged_lm_per_doc) — the three-read unigram
    # pipeline builds once per app and this query's rank stage (which
    # consumes the scores twice) reads the cache.
    from job_market_research_spark.functions.text import staged_lm_per_doc

    per_doc = staged_lm_per_doc(spark, sf_dir).select(
        "doc_id", "avg_neg_logp"
    )
    # Exact NTILE via the two-level rank (round 9): NTILE(B) over a
    # window keyed on |langs| would funnel every language's full
    # per-doc score set through one task. The ascending rank r is
    # computed as within-(lang, score-range-bucket) row_number plus
    # the bucket's cumulative row-count offset (the bucket function is
    # monotone in the round-6 score, so bucket order IS score order
    # and tied scores share a bucket), and NTILE's uneven-split rule
    # is the closed form ((r-1)·B) div n + 1 — bit-identical to the
    # window NTILE for every n (first n mod B tiles get the extra
    # row).
    scored = per_doc.join(docs.select("doc_id", "lang"), "doc_id")
    bounds = scored.groupBy("lang").agg(
        F.min("avg_neg_logp").alias("mn"), F.max("avg_neg_logp").alias("mx")
    )
    vb = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(CCNET_RANK_BUCKETS - 1),
            F.floor(
                (F.col("avg_neg_logp") - F.col("mn"))
                * CCNET_RANK_BUCKETS
                / (F.col("mx") - F.col("mn"))
            ),
        )
    )
    vbucketed = scored.join(F.broadcast(bounds), "lang").withColumn(
        "vb", vb.cast("int")
    )
    wvb = Window.partitionBy("lang", "vb").orderBy("avg_neg_logp", "doc_id")
    within = vbucketed.withColumn("ri", F.row_number().over(wvb))
    woff = Window.partitionBy("lang").orderBy("vb")
    offs = (
        vbucketed.groupBy("lang", "vb")
        .agg(F.count("*").alias("nb"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("nb").over(
                    woff.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "n", F.sum("nb").over(Window.partitionBy("lang"))
        )
        .select("lang", "vb", "off", "n")
    )
    bucketed = (
        within.join(F.broadcast(offs), ["lang", "vb"])
        .withColumn(
            "__rm1",
            (F.col("off") + F.col("ri") - 1).cast("long") * CCNET_BUCKETS,
        )
        .withColumn("bucket", F.expr("__rm1 DIV n") + 1)
    )
    return (
        bucketed.groupBy("lang", F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.min("avg_neg_logp"), 6).alias("min_score"),
            F.round(F.max("avg_neg_logp"), 6).alias("max_score"),
        )
        .orderBy("lang", "bucket")
    )


#: Watermark-detection knobs (Kirchenbauer et al. 2023): green-list
#: fraction gamma (hash parity → 1/2), and the z flag threshold.
WM_GAMMA = 0.5
WM_Z_FLAG = 4.0
WM_SALT = "wm-v1#"


@query(
    "text_watermark_detect",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, source,
             CAST(len(t) - 1 AS BIGINT) AS n_pairs,
             len(list_filter(range(2, len(t) + 1),
                 i -> CAST(('0x' || substr(md5('{WM_SALT}' || t[i-1] || '#'
                      || t[i]), 1, 8)) AS BIGINT) % 2 = 0)) AS n_green
      FROM toks WHERE len(t) >= 2
    ),
    scored AS (
      SELECT source, doc_id, n_pairs, n_green,
             round((n_green - {WM_GAMMA} * n_pairs)
                   / sqrt(n_pairs * {WM_GAMMA} * (1 - {WM_GAMMA})), 6) AS z
      FROM bigrams WHERE n_pairs > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN z > {WM_Z_FLAG} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           round(MAX(z), 6) AS max_z_r6
    FROM scored GROUP BY source ORDER BY source
    """,
    tags=("quality", "curation", "watermark", "beyond"),
)
def q_text_watermark_detect(spark, sf_dir: str) -> DataFrame:
    """Green-list watermark detection (Kirchenbauer et al. 2023): a
    watermarking LLM biases each token toward a 'green list' seeded by
    the previous token; a detector recomputes the same partition and
    z-tests each document's green fraction against the unwatermarked
    γ = {WM_GAMMA}. The curation question this answers at 100 TB:
    how much of a crawl is OUR OWN model's output (training on it
    collapses quality). Natural text scores z ≈ 0; this corpus is
    unwatermarked, so the per-source report showing max z well under
    {WM_Z_FLAG} IS the negative control — a planted-watermark
    positive control lives in the pytest pin.

    Plan shape: one tokenize scan; the green test is a pure bigram
    hash parity evaluated inside an array fold (no explode — counts
    come out of list_filter/size), so the corpus never fans out; one
    |sources|-row aggregate. The z denominator is sqrt of an integer
    product — identical doubles both engines, round-6."""
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z]+"), lambda x: x != ""
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", toks.alias("t")
    ).filter(F.size("t") >= 2)
    green = F.expr(
        "size(filter(sequence(2, size(t)), i -> "
        f"pmod(conv(substr(md5(concat('{WM_SALT}', "
        "element_at(t, CAST(i - 1 AS INT)), '#', "
        "element_at(t, CAST(i AS INT)))), 1, 8), 16, 10), 2) = 0))"
    )
    bigrams = docs.select(
        "source",
        "doc_id",
        (F.size("t") - 1).cast("long").alias("n_pairs"),
        green.cast("long").alias("n_green"),
    ).filter(F.col("n_pairs") > 0)
    z = F.round(
        (F.col("n_green") - WM_GAMMA * F.col("n_pairs"))
        / F.sqrt(F.col("n_pairs") * WM_GAMMA * (1 - WM_GAMMA)),
        6,
    )
    return (
        bigrams.select("source", z.alias("z"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("z") > WM_Z_FLAG, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.round(F.max("z"), 6).alias("max_z_r6"),
        )
        .orderBy("source")
    )


#: Seeded JSON-shape variants: the testdata's props is uniformly
#: {"k": N}, so the profiler plants realistic schema drift by
#: event_id residue (extra keys, a nested object, a null) — the
#: text_pii_redact seeding discipline for semi-structured data.
_JSON_SEED_SPARK = """
  CASE CAST(event_id % 5 AS INT)
    WHEN 0 THEN concat('{"k": ', get_json_object(props, '$.k'),
                       ', "src": "web"}')
    WHEN 1 THEN concat('{"k": ', get_json_object(props, '$.k'),
                       ', "device": "mobile", "v": 2}')
    WHEN 2 THEN concat('{"meta": {"k": ', get_json_object(props, '$.k'),
                       '}}')
    WHEN 3 THEN concat('{"k": ', get_json_object(props, '$.k'),
                       ', "ref": null}')
    ELSE props
  END
"""
_JSON_SEED_SQL = """
  CASE CAST(event_id % 5 AS INT)
    WHEN 0 THEN '{"k": ' || json_extract_string(props, '$.k')
                || ', "src": "web"}'
    WHEN 1 THEN '{"k": ' || json_extract_string(props, '$.k')
                || ', "device": "mobile", "v": 2}'
    WHEN 2 THEN '{"meta": {"k": ' || json_extract_string(props, '$.k')
                || '}}'
    WHEN 3 THEN '{"k": ' || json_extract_string(props, '$.k')
                || ', "ref": null}'
    ELSE props
  END
"""


@query(
    "profile_json_keys",
    oracle=f"""
    WITH seeded AS (
      SELECT event_type, ({_JSON_SEED_SQL}) AS props FROM events
    ),
    keyed AS (
      SELECT event_type, unnest(json_keys(props)) AS key FROM seeded
    )
    SELECT event_type, key, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM keyed GROUP BY 1, 2 ORDER BY event_type, key
    """,
    tags=("profile", "semistructured", "beyond"),
)
def q_profile_json_keys(spark, sf_dir: str) -> DataFrame:
    """Semi-structured schema profiler: top-level key frequency of the
    props JSON per event type — the first question against any
    landed JSON feed ("what shapes are actually in here, and at what
    rates") and the input to a from_json schema decision. Schema
    drift is planted deterministically (extra keys, a nested object,
    an explicit null) so the profile demonstrates real divergence.

    Scale: one scan; json_object_keys is a native JVM expression and
    the explode fans out ≤ |keys| per event; the aggregate is
    map-side combinable to |types|×|keys| rows. No from_json with a
    guessed schema anywhere — the profiler is what makes guessing
    unnecessary."""
    seeded = load(spark, sf_dir, "events").select(
        "event_type", F.expr(_JSON_SEED_SPARK).alias("props")
    )
    return (
        seeded.select(
            "event_type",
            F.explode(F.json_object_keys("props")).alias("key"),
        )
        .groupBy("event_type", "key")
        .agg(F.count("*").cast("long").alias("n_events"))
        .orderBy("event_type", "key")
    )


#: Chat-template construction shared by both engines: a [system,
#: user, assistant] transcript from each doc's first two words, with
#: planted violations by doc_id residue (checked in residue order).
_CHAT_SPARK = """
  CASE
    WHEN doc_id % 7 = 0 THEN
      concat('[{"role":"system","content":"assist"},',
             '{"role":"user","content":"', element_at(split(text, ' '), 1),
             '"}]')
    WHEN doc_id % 11 = 0 THEN
      concat('[{"role":"system","content":"assist"},',
             '{"role":"user","content":"', element_at(split(text, ' '), 1),
             '"},{"role":"assistant","content":""}]')
    WHEN doc_id % 13 = 0 THEN
      concat('[{"role":"system","content":"assist"},',
             '{"role":"user","content":"', element_at(split(text, ' '), 1),
             '"},{"role":"asistant","content":"',
             element_at(split(text, ' '), 2), '"}]')
    WHEN doc_id % 5 = 0 THEN
      concat('[{"role":"system","content":"assist"},',
             '{"role":"user","content":"', element_at(split(text, ' '), 1),
             '"},{"role":"user","content":"',
             element_at(split(text, ' '), 2),
             '"},{"role":"assistant","content":"ok"}]')
    ELSE
      concat('[{"role":"system","content":"assist"},',
             '{"role":"user","content":"', element_at(split(text, ' '), 1),
             '"},{"role":"assistant","content":"',
             element_at(split(text, ' '), 2), '"}]')
  END
"""
_CHAT_SQL = """
  CASE
    WHEN doc_id % 7 = 0 THEN
      '[{"role":"system","content":"assist"},'
      || '{"role":"user","content":"' || string_split(text, ' ')[1] || '"}]'
    WHEN doc_id % 11 = 0 THEN
      '[{"role":"system","content":"assist"},'
      || '{"role":"user","content":"' || string_split(text, ' ')[1]
      || '"},{"role":"assistant","content":""}]'
    WHEN doc_id % 13 = 0 THEN
      '[{"role":"system","content":"assist"},'
      || '{"role":"user","content":"' || string_split(text, ' ')[1]
      || '"},{"role":"asistant","content":"'
      || string_split(text, ' ')[2] || '"}]'
    WHEN doc_id % 5 = 0 THEN
      '[{"role":"system","content":"assist"},'
      || '{"role":"user","content":"' || string_split(text, ' ')[1]
      || '"},{"role":"user","content":"' || string_split(text, ' ')[2]
      || '"},{"role":"assistant","content":"ok"}]'
    ELSE
      '[{"role":"system","content":"assist"},'
      || '{"role":"user","content":"' || string_split(text, ' ')[1]
      || '"},{"role":"assistant","content":"'
      || string_split(text, ' ')[2] || '"}]'
  END
"""


@query(
    "text_chat_format_validate",
    oracle=f"""
    WITH chats AS (
      SELECT doc_id, source, ({_CHAT_SQL}) AS chat FROM documents
    ),
    parsed AS (
      SELECT doc_id, source,
             list_transform(CAST(json_extract(chat, '$[*].role') AS VARCHAR[]),
                            x -> trim(x, '"')) AS roles,
             list_transform(CAST(json_extract(chat, '$[*].content')
                                 AS VARCHAR[]),
                            x -> trim(x, '"')) AS contents
      FROM chats
    ),
    flags AS (
      SELECT source,
        CASE WHEN len(list_filter(roles,
               x -> x NOT IN ('system', 'user', 'assistant'))) > 0
             THEN 1 ELSE 0 END AS f_bad_role,
        CASE WHEN roles[len(roles)] <> 'assistant' THEN 1 ELSE 0 END
          AS f_bad_ending,
        CASE WHEN len(list_filter(range(2, len(roles) + 1),
               i -> roles[CAST(i AS INT)] = roles[CAST(i AS INT) - 1])) > 0
             THEN 1 ELSE 0 END AS f_bad_alternation,
        CASE WHEN len(list_filter(contents, x -> x = '')) > 0
             THEN 1 ELSE 0 END AS f_empty_content
      FROM parsed
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chats,
           CAST(SUM(f_bad_role) AS BIGINT) AS n_bad_role,
           CAST(SUM(f_bad_ending) AS BIGINT) AS n_bad_ending,
           CAST(SUM(f_bad_alternation) AS BIGINT) AS n_bad_alternation,
           CAST(SUM(f_empty_content) AS BIGINT) AS n_empty_content,
           CAST(SUM(CASE WHEN f_bad_role + f_bad_ending
                          + f_bad_alternation + f_empty_content = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
    FROM flags GROUP BY source ORDER BY source
    """,
    tags=("quality", "sft", "beyond"),
)
def q_text_chat_format_validate(spark, sf_dir: str) -> DataFrame:
    """Chat-template validation for SFT data: every transcript must
    use known roles, alternate speakers, end on an assistant turn and
    carry non-empty content — the four structural checks an
    instruction-tuning pipeline runs before a single token reaches
    the tokenizer (a truncated or role-corrupted transcript trains
    the model to stop mid-conversation). Transcripts are constructed
    deterministically from the corpus with violations planted per
    doc_id residue: truncation (%7), empty assistant (%11), role typo
    (%13), double-user turn (%5).

    Scale: one scan; role/content extraction is a native JSON path
    over the transcript string, the four rules are array expressions
    in the same projection, and the report is |sources| rows of
    integer counts — no parsing UDF, no schema guess."""
    chats = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_CHAT_SPARK).alias("chat")
    )
    parsed = chats.select(
        "source",
        F.from_json(
            F.col("chat"), "array<struct<role:string,content:string>>"
        ).alias("msgs"),
    ).select(
        "source",
        F.expr("transform(msgs, m -> m.role)").alias("roles"),
        F.expr("transform(msgs, m -> m.content)").alias("contents"),
    )
    f_bad_role = F.when(
        F.size(
            F.expr(
                "filter(roles, x -> x NOT IN ('system', 'user', 'assistant'))"
            )
        )
        > 0,
        1,
    ).otherwise(0)
    f_bad_ending = F.when(
        F.element_at(F.col("roles"), -1) != "assistant", 1
    ).otherwise(0)
    f_bad_alternation = F.when(
        F.size(
            F.expr(
                "filter(sequence(2, size(roles)), i -> "
                "element_at(roles, CAST(i AS INT)) = "
                "element_at(roles, CAST(i AS INT) - 1))"
            )
        )
        > 0,
        1,
    ).otherwise(0)
    f_empty = F.when(
        F.size(F.expr("filter(contents, x -> x = '')")) > 0, 1
    ).otherwise(0)
    flags = parsed.select(
        "source",
        f_bad_role.alias("f_bad_role"),
        f_bad_ending.alias("f_bad_ending"),
        f_bad_alternation.alias("f_bad_alternation"),
        f_empty.alias("f_empty_content"),
    )
    all_ok = (
        F.col("f_bad_role")
        + F.col("f_bad_ending")
        + F.col("f_bad_alternation")
        + F.col("f_empty_content")
        == 0
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").alias("n_chats"),
            F.sum("f_bad_role").cast("long").alias("n_bad_role"),
            F.sum("f_bad_ending").cast("long").alias("n_bad_ending"),
            F.sum("f_bad_alternation").cast("long").alias("n_bad_alternation"),
            F.sum("f_empty_content").cast("long").alias("n_empty_content"),
            F.sum(F.when(all_ok, 1).otherwise(0)).cast("long").alias("n_valid"),
        )
        .orderBy("source")
    )


#: Code-likeness thresholds (fractions ×1e6 compared as integers).
CODE_SYM_MICRO = 30_000     # ≥3% of chars are {}();=<> brackets etc.
CODE_KEYWORD_MIN = 2        # ≥2 distinct code keywords present


@query(
    "text_code_prose_classifier",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text)
                  - length(regexp_replace(text, '[{{}}()\\[\\];=<>|&]', '', 'g'))
                  AS BIGINT) AS n_sym,
             CAST((CASE WHEN text LIKE '%def %' THEN 1 ELSE 0 END)
                + (CASE WHEN text LIKE '%return %' THEN 1 ELSE 0 END)
                + (CASE WHEN text LIKE '%import %' THEN 1 ELSE 0 END)
                + (CASE WHEN text LIKE '%void %' THEN 1 ELSE 0 END)
                + (CASE WHEN text LIKE '%class %' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kw
      FROM documents WHERE length(text) > 0
    ),
    lab AS (
      SELECT source,
             CASE WHEN n_sym * 1000000 >= {CODE_SYM_MICRO} * n_chars
                       AND n_kw >= {CODE_KEYWORD_MIN}
                  THEN 1 ELSE 0 END AS is_code
      FROM feats
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_code) AS BIGINT) AS n_code,
           round(CAST(SUM(is_code) AS DOUBLE) / COUNT(*), 6)
             AS code_fraction_r6
    FROM lab GROUP BY source ORDER BY source
    """,
    tags=("text", "curation", "beyond"),
)
def q_text_code_prose_classifier(spark, sf_dir: str) -> DataFrame:
    """Code-vs-prose separation per source — the routing signal an
    LLM data mix needs before anything else (code and prose get
    different dedup thresholds, quality filters, and mixture
    weights): a doc is 'code' when its structural-symbol density
    ({{}}()[];=<>|&) clears 3% AND it contains ≥2 distinct code
    keywords (def/return/import/void/class). Both features are pure
    map-side expressions; the density compare is INTEGER
    (n_sym·10⁶ ≥ θ·n_chars — no float ratio, the Gopher-filter
    contract), so classification is bit-identical across engines.

    Scale: one scan → |sources| combinable aggregation. At 100 TB
    this is the cheapest possible router: no tokenization, no joins,
    regex once per doc."""
    text = F.col("text")
    n_chars = F.length(text).cast("long")
    n_sym = (
        F.length(text)
        - F.length(F.regexp_replace(text, r"[{}()\[\];=<>|&]", ""))
    ).cast("long")
    n_kw = sum(
        (
            F.when(text.contains(kw), 1).otherwise(0)
            for kw in ("def ", "return ", "import ", "void ", "class ")
        ),
        start=F.lit(0),
    ).cast("long")
    feats = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "source",
            ((n_sym * 1_000_000 >= CODE_SYM_MICRO * n_chars)
             & (n_kw >= CODE_KEYWORD_MIN))
            .cast("int")
            .alias("is_code"),
        )
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("is_code").cast("long").alias("n_code"),
            F.round(
                F.sum("is_code").cast("double") / F.count("*"), 6
            ).alias("code_fraction_r6"),
        )
        .orderBy("source")
    )
