"""Text-analytics operators (SURVEY §2.10 + training-data-pipeline text ops).

Covers the reference's NER/token-frequency surface (skillner/
skillner_logic.py:15-125, token_dist.json) re-expressed as broadcast
lexicon joins and native tokenization, plus the text-quality operators
a 100 TB training-data pipeline needs: language ID, quality scoring,
token counting, document fingerprinting. Everything is native column
expressions over `split`/`filter`/`transform` — no Python in the row
path, so whole-stage codegen holds across the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: Skill lexicon standing in for the reference's SKILL_DB phrase
#: dictionary (skillner_logic.py:15-30). type mirrors hard/soft.
#: Includes MULTI-WORD surface forms — the reference's PhraseMatcher
#: matches full phrases (skillner_logic.py:69-80 merges full_matches
#: with scored n-gram matches), so the token stream must carry
#: 2-/3-gram shingles, not just unigrams.
SKILL_LEXICON: list[tuple[str, str]] = [
    ("join", "hard"),
    ("scan", "hard"),
    ("merge", "hard"),
    ("hash", "hard"),
    ("sort", "hard"),
    ("filter", "hard"),
    ("window", "hard"),
    ("stream", "hard"),
    ("hash join", "hard"),
    ("sort merge", "hard"),
    ("window scan", "hard"),
    ("hash join scan", "hard"),
    ("docker", "hard"),
    ("fast", "soft"),
    ("slow", "soft"),
    ("small", "soft"),
    ("fast sort", "soft"),
]

#: One high-frequency marker token per language for the n-gram
#: language-ID heuristic.
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", "the"),
    ("fr", "le"),
    ("es", "el"),
    ("de", "der"),
    ("zh", "de"),
]

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization with empty tokens dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


#: Inflectional-suffix strip for the skill-NER recall normalizer
#: (reference: skillner_logic.py:15-125 lemmatizes via spaCy; the
#: native approximation is a single-pass suffix strip). Non-greedy
#: prefix ≥3 chars → the LONGEST listed suffix is stripped; the same
#: leftmost-first semantics hold in Java regex (Spark) and RE2
#: (DuckDB), so the oracle replays it with regexp_replace(..., '\\1').
#: "er"/"es" are deliberately ABSENT: the lexicon keeps canonical
#: surface forms, and stripping agentive -er would map "docker" to
#: "dock". E-elision ("merged" → "merg") is recovered by an extra
#: stem+'e' candidate key, not by smarter stripping.
STEM_PATTERN = r"^(.{3,}?)(izations|ization|izing|ized|izes|ings|ing|ed|s)$"


def stem(col: Column) -> Column:
    """Suffix-stripped form of a token (see STEM_PATTERN)."""
    return F.regexp_replace(col, STEM_PATTERN, "$1")


def _count_token(toks: Column, word: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == word)).cast("long")


@query(
    "text_token_dist",
    oracle="""
    SELECT t.token, COUNT(*) AS n
    FROM documents, unnest(string_split(text, ' ')) AS t(token)
    WHERE t.token <> ''
    GROUP BY 1 ORDER BY n DESC, token
    """,
)
def q_text_token_dist(spark, sf_dir: str) -> DataFrame:
    """Corpus token frequency distribution (reference artifact:
    skillner/token_dist.json). Explode + group — the shuffle carries
    only (token, partial count) pairs thanks to map-side combine."""
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_word_freq",
    oracle="""
    SELECT p_name AS titre_homogene, COUNT(*) AS n
    FROM part GROUP BY 1 ORDER BY n DESC, titre_homogene
    """,
)
def q_agg_word_freq(spark, sf_dir: str) -> DataFrame:
    """Frequency dictionary of normalized titles (reference:
    pipline.py:200-205 `dictionnaire_titres[t] += 1`)."""
    return (
        load(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("titre_homogene"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "text_skill_ner",
    oracle="""
    WITH lexicon(nom, type_skill) AS (VALUES
      ('join','hard'),('scan','hard'),('merge','hard'),('hash','hard'),
      ('sort','hard'),('filter','hard'),('window','hard'),('stream','hard'),
      ('hash join','hard'),('sort merge','hard'),('window scan','hard'),
      ('hash join scan','hard'),('docker','hard'),
      ('fast','soft'),('slow','soft'),('small','soft'),('fast sort','soft')),
    t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    st AS (SELECT doc_id,
                  list_transform(t, w -> regexp_replace(w,
                    '^(.{3,}?)(izations|ization|izing|ized|izes|ings|ing|ed|s)$',
                    '\1')) AS t
           FROM t),
    shingles AS (
      SELECT doc_id, unnest(t) AS token FROM t
      UNION ALL
      SELECT doc_id, unnest(t) AS token FROM st
      UNION ALL
      SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
                            i -> t[i] || ' ' || t[i+1])) FROM st
      UNION ALL
      SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      FROM st
      UNION ALL
      SELECT doc_id, unnest(list_transform(t, s -> s || 'e')) FROM st
    ),
    toks AS (
      SELECT DISTINCT doc_id, token FROM shingles
      WHERE token <> '' AND token IS NOT NULL
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN type_skill = 'hard' THEN nom END, ','
                      ORDER BY nom), '') AS hard_skills,
           COALESCE(string_agg(CASE WHEN type_skill = 'soft' THEN nom END, ','
                      ORDER BY nom), '') AS soft_skills
    FROM toks JOIN lexicon ON token = nom
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_text_skill_ner(spark, sf_dir: str) -> DataFrame:
    """Dictionary NER as a broadcast-lexicon join (reference:
    skillner_logic.py:15-125 spaCy PhraseMatcher over SKILL_DB; the
    PhraseMatcher matches MULTI-WORD surface forms, so the token
    stream here carries unigrams + 2-/3-gram shingles before the
    join — "hash join"-style skills match as phrases; its spaCy
    pipeline also LEMMATIZES, so the stream additionally carries
    suffix-stripped variants — "dockerized" matches "docker",
    "sorting" matches "sort" — via `stem` plus a stem+'e' candidate
    for e-elision, "merged" → "merg" → "merge").

    tokenize → stem → candidates = raw unigrams + 1/2/3-grams over
    the STEMMED token stream + stem+'e' unigrams, in one projection →
    broadcast join against the lexicon → distinct matched (doc,
    skill) → collect per-type skill sets. Grams are built from the
    stemmed stream ONLY: lexicon entries are canonical surface forms
    (stem-stable — the same contract spaCy's lemma-matching
    PhraseMatcher puts on patterns), so raw-token grams add no
    matches, just ~2× stream volume (measured: raw+stemmed grams
    1.95 s, this shape 1.4 s, no-stem baseline 1.3 s at sf0.1).
    Order matters at scale: the broadcast join prunes the widened
    shingle stream MAP-SIDE, so the only shuffled rows are lexicon
    matches — deduping before the join would shuffle the whole
    corpus-sized shingle stream instead (the shape this query shipped
    with until round 4, ~3× slower at sf0.1)."""
    lex = spark.createDataFrame(SKILL_LEXICON, ["nom", "type_skill"])
    # sequence(1, n) is DESCENDING when n < 1, so gate each shingle
    # arm on array size instead of relying on greatest().
    _GRAMS = """concat(
             {c},
             case when size({c}) >= 2 then
               transform(sequence(1, size({c}) - 1),
                 i -> concat_ws(' ', element_at({c}, i), element_at({c}, i + 1)))
             else array() end,
             case when size({c}) >= 3 then
               transform(sequence(1, size({c}) - 2),
                 i -> concat_ws(' ', element_at({c}, i), element_at({c}, i + 1),
                                element_at({c}, i + 2)))
             else array() end)"""
    # Per-ROW array_distinct (map-side, pre-explode — NOT the
    # corpus-wide shuffle dedup the docstring warns about): most
    # tokens stem to themselves, so raw unigrams and stemmed unigrams
    # overlap heavily.
    cand = F.expr(
        "array_distinct(concat(t, "
        + _GRAMS.format(c="ts")
        + ", transform(ts, s -> concat(s, 'e'))))"
    )
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("t"))
        .withColumn("ts", F.transform(F.col("t"), stem))
        .select("doc_id", F.explode(cand).alias("token"))
    )
    matched = (
        toks.join(F.broadcast(lex), toks.token == lex.nom)
        .select("doc_id", "nom", "type_skill")
        .distinct()
    )
    agg_type = lambda t: F.array_join(  # noqa: E731
        F.array_sort(F.collect_list(F.when(F.col("type_skill") == t, F.col("nom")))),
        ",",
    )
    return (
        matched.groupBy("doc_id")
        .agg(
            agg_type("hard").alias("hard_skills"),
            agg_type("soft").alias("soft_skills"),
        )
    )


@query(
    "text_lang_id",
    oracle="""
    WITH c AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), x -> x = 'the')) AS c_en,
        len(list_filter(string_split(text,' '), x -> x = 'le'))  AS c_fr,
        len(list_filter(string_split(text,' '), x -> x = 'el'))  AS c_es,
        len(list_filter(string_split(text,' '), x -> x = 'der')) AS c_de
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN c_en >= c_fr AND c_en >= c_es AND c_en >= c_de AND c_en > 0 THEN 'en'
                WHEN c_fr >= c_es AND c_fr >= c_de AND c_fr > 0 THEN 'fr'
                WHEN c_es >= c_de AND c_es > 0 THEN 'es'
                WHEN c_de > 0 THEN 'de'
                ELSE 'und' END AS lang_pred
    FROM c ORDER BY doc_id
    """,
)
def q_text_lang_id(spark, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (training-data pipeline op):
    count per-language marker tokens, first-maximum wins, 'und' when no
    marker fires. A production version swaps markers for character
    n-gram profiles — same plan shape (pure column expressions)."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    c_en = _count_token(toks, "the")
    c_fr = _count_token(toks, "le")
    c_es = _count_token(toks, "el")
    c_de = _count_token(toks, "der")
    pred = (
        F.when((c_en >= c_fr) & (c_en >= c_es) & (c_en >= c_de) & (c_en > 0), "en")
        .when((c_fr >= c_es) & (c_fr >= c_de) & (c_fr > 0), "fr")
        .when((c_es >= c_de) & (c_es > 0), "es")
        .when(c_de > 0, "de")
        .otherwise("und")
    )
    return docs.select("doc_id", "lang", pred.alias("lang_pred"))


@query(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT)
               AS n_tokens,
             CAST(len(list_filter(string_split(text,' '),
                  x -> x IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop,
             CAST(LENGTH(text) AS BIGINT) AS n_chars_m
      FROM documents
    )
    SELECT doc_id, n_tokens, n_stop,
           CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
           CAST(n_chars_m AS DOUBLE) / n_tokens AS avg_token_len
    FROM t WHERE n_tokens > 0 ORDER BY doc_id
    """,
)
def q_text_quality_score(spark, sf_dir: str) -> DataFrame:
    """Quality scoring signals (training-data pipeline op): token
    count, stopword count/ratio, average token length. Single-division
    doubles are bit-deterministic across engines (no accumulation)."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("long")
    n_chars = F.length("text").cast("long")
    return (
        docs.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            n_stop.alias("n_stop"),
            (n_stop.cast("double") / n_tokens).alias("stop_ratio"),
            (n_chars.cast("double") / n_tokens).alias("avg_token_len"),
        )
        .filter(F.col("n_tokens") > 0)
    )


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT)
             AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
             AS bpe_ish_tokens
    FROM documents ORDER BY doc_id
    """,
)
def q_text_token_count(spark, sf_dir: str) -> DataFrame:
    """Token counting two ways (training-data pipeline op): whitespace
    tokens and a BPE-ish regex segmentation (letters / digits / other)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text,' '), x -> x <> ''))), ' '))
             AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def q_text_fingerprint(spark, sf_dir: str) -> DataFrame:
    """Content-defined document fingerprint (training-data pipeline
    op): md5 over the sorted distinct token set — robust to token
    order, byte-identical across engines."""
    docs = load(spark, sf_dir, "documents")
    canon = F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " ")
    return docs.select("doc_id", F.md5(canon).alias("fingerprint"))


@query(
    "text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
      WHERE t <> ''
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    WHERE tf.doc_id < 50
    ORDER BY doc_id, token
    """,
)
def q_text_tfidf(spark, sf_dir: str) -> DataFrame:
    """TF-IDF scoring over the corpus — the quality/relevance feature a
    training-data pipeline ranks and filters by. Three aggregations
    (term freq, doc freq, corpus size), document frequency joined back
    broadcast (|vocab| rows ≪ |corpus×vocab|), corpus size fused as a
    broadcast 1-row aggregate crossJoin — ONE execution DAG, no
    separate driver-side count job. Scores use the round-6 float
    policy (ln is libm-dependent). The doc_id cap only bounds the
    RESULT — tf/df/n are computed over the full corpus."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    return (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
        .filter(F.col("doc_id") < 50)
    )


#: Redaction patterns (kept to the regex subset Java and RE2 share:
#: no backrefs, no lookaround).
PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
PII_PHONE = "\\+?[0-9][0-9 -]{7,14}[0-9]"


def redact_pii(col) -> "F.Column":
    """Mask emails then phone numbers in a text column — the scrub
    pass every training-data pipeline runs before tokenization. Pure
    native regexp_replace: JVM-side, codegen-friendly, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
    )


@query(
    "text_pii_redact",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +212 6' || CAST(doc_id % 100 AS VARCHAR)
                  || ' 12 34 56.' AS text
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+',
                            '[EMAIL]', 'g'),
             '\\+?[0-9][0-9 -]{7,14}[0-9]', '[PHONE]', 'g') AS clean_text
    FROM seeded ORDER BY doc_id
    """,
)
def q_text_pii_redact(spark, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: deterministic emails/phone numbers
    are seeded into each document (the testdata has none), then both
    engines redact with the same patterns. Spark's global-replace
    semantics match DuckDB's 'g' flag."""
    seeded = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +212 6"),
                (F.col("doc_id") % 100).cast("string"),
                F.lit(" 12 34 56."),
            ).alias("text"),
        )
    )
    return seeded.select(
        "doc_id", redact_pii("text").alias("clean_text")
    )


def staged_lm_per_doc(spark, sf_dir: str) -> DataFrame:
    """Persisted per-doc unigram-LM score table (doc_id, n_tokens,
    avg_neg_logp), one materialization per (app, sf_dir). This is the
    shared expensive leg of text_lm_perplexity AND text_ccnet_buckets
    (CCNet's tiering step starts from exactly these scores, and its
    rank stage consumes them twice) — staged, the three-read LM
    pipeline (vocab counts, N+V normalizer, per-doc join-back) runs
    once per app, which is the scored-table materialization the CCNet
    pipeline itself performs between scoring and bucketing."""

    from job_market_research_spark.staging import staged_frame

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        tok = docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
        ).filter(F.col("token") != "")
        counts = tok.groupBy("token").agg(F.count("*").alias("c"))
        stats = tok.agg(
            (F.count("*") + F.countDistinct("token"))
            .cast("double")
            .alias("__n_plus_v")
        )
        neg_logp = -F.log(
            (F.col("c") + 1).cast("double") / F.col("__n_plus_v")
        )
        return (
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

    return staged_frame(spark, "lm_per_doc", sf_dir, build
    )



@query(
    "text_lm_perplexity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
      WHERE t <> ''
    ),
    counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
    totals AS (
      SELECT COUNT(*) AS n, COUNT(DISTINCT token) AS v FROM tok
    ),
    scored AS (
      SELECT tok.doc_id,
             -ln(CAST(counts.c + 1 AS DOUBLE) / (totals.n + totals.v))
               AS neg_logp
      FROM tok JOIN counts USING (token) CROSS JOIN totals
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             round(SUM(neg_logp) / COUNT(*), 6) AS avg_neg_logp
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, avg_neg_logp,
           round(exp(avg_neg_logp), 6) AS perplexity
    FROM per_doc ORDER BY doc_id
    """,
)
def q_text_lm_perplexity(spark, sf_dir: str) -> DataFrame:
    """Unigram language-model perplexity per document — the CCNet-style
    quality signal a training-data pipeline filters on (docs whose
    token distribution diverges from the corpus LM score high).

    Add-one-smoothed unigram model fitted on the corpus itself:
    p(t) = (c(t)+1) / (N+V). Plan shape: one tokenize scan, one
    vocab-sized count aggregate joined back BROADCAST (|vocab| ≪
    |corpus|), one per-doc aggregate — two shuffles total, no
    all-pairs, no Python. N and V ride a broadcast 1-row aggregate
    crossJoined into the scoring stream — fused into the same
    execution DAG instead of a separate driver-scalar job. Float
    policy: -ln(p) is libm math, so the per-doc mean is rounded to 6
    decimals on both engines and the perplexity is exp() OF THE
    ROUNDED mean — both engines feed identical doubles into exp,
    making the hash deterministic. The per-doc score table is staged
    per app (staged_lm_per_doc), shared with text_ccnet_buckets."""
    per_doc = staged_lm_per_doc(spark, sf_dir)
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "avg_neg_logp",
        F.round(F.exp("avg_neg_logp"), 6).alias("perplexity"),
    )


#: Fixed linear quality-model weights (a distilled classifier's head;
#: training it is out of scope — scoring at corpus scale is the op).
QM_BIAS = -0.25
QM_W_STOP = 1.8     # stopword ratio: prose-ness signal
QM_W_AVGLEN = 0.05  # avg token length: gibberish/code detector
QM_W_TOKENS = 0.001  # length prior
#: Calibrated to split the synthetic corpus near its median score
#: (0.19) so the filter demonstrably keeps AND drops documents.
QM_THRESHOLD = 0.2


@query(
    "text_quality_model",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT)
               AS n_tokens,
             CAST(len(list_filter(string_split(text,' '),
                  x -> x IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop,
             CAST(LENGTH(text) AS BIGINT) AS n_chars_m
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             round({QM_BIAS}
                   + {QM_W_STOP} * (CAST(n_stop AS DOUBLE) / n_tokens)
                   + {QM_W_AVGLEN} * (CAST(n_chars_m AS DOUBLE) / n_tokens)
                   + {QM_W_TOKENS} * n_tokens, 6) AS score
      FROM t WHERE n_tokens > 0
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN score > {QM_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN score > {QM_THRESHOLD} THEN doc_id END) AS BIGINT)
             AS kept_checksum
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)
def q_text_quality_model(spark, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the FineWeb-style 'score every
    document with a small classifier, keep above threshold' pass):
    a fixed-weight LINEAR head over the quality features — ratios of
    exact integer counts, weighted in a fixed order, so both engines
    produce bit-identical scores (deliberately no exp/sigmoid: libm
    ulp drift across engines could flip a rounded boundary; a
    monotone linear score thresholds identically). Per-source keep
    counts + membership checksum. One narrow scan, one aggregation —
    embarrassingly parallel at any scale."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "of", "and", "to", "in"))
    ).cast("long")
    score = F.round(
        F.lit(QM_BIAS)
        + F.lit(QM_W_STOP) * (n_stop.cast("double") / n_tokens)
        + F.lit(QM_W_AVGLEN) * (F.length("text").cast("long").cast("double") / n_tokens)
        + F.lit(QM_W_TOKENS) * n_tokens,
        6,
    )
    scored = docs.filter(n_tokens > 0).select(
        "doc_id", "source", score.alias("score")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("score") > QM_THRESHOLD, 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.when(F.col("score") > QM_THRESHOLD, F.col("doc_id"))).alias(
                "kept_checksum"
            ),
        )
        .orderBy("source")
    )


@query(
    "text_repetition_signals",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' ! ! spam $ $ spam $ $'
                  ELSE text END AS text
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM corpus
    ),
    stats AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(toks,
                  x -> regexp_matches(x, '^[^a-z0-9]+$'))) AS BIGINT) AS n_symbol
      FROM toks
    ),
    words AS (
      SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
      FROM toks
    ),
    bigrams AS (
      SELECT a.doc_id, a.w || ' ' || b.w AS bg
      FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY 1, 2),
    bga AS (
      SELECT doc_id,
             CAST(MAX(c) AS BIGINT) AS top_bigram_count,
             CAST(SUM(c) AS BIGINT) AS n_bigrams
      FROM bgc GROUP BY 1
    )
    SELECT s.doc_id,
           s.n_tokens,
           CAST(s.n_tokens - s.n_distinct AS DOUBLE) / s.n_tokens
             AS dup_word_fraction,
           CAST(COALESCE(g.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
           CAST(COALESCE(g.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN COALESCE(g.n_bigrams, 0) = 0 THEN 0.0
                ELSE CAST(g.top_bigram_count AS DOUBLE) / g.n_bigrams
           END AS top_bigram_fraction,
           CAST(s.n_symbol AS DOUBLE) / s.n_tokens AS symbol_word_ratio
    FROM stats s LEFT JOIN bga g ON s.doc_id = g.doc_id
    WHERE s.n_tokens > 0
    ORDER BY s.doc_id
    """,
)
def q_text_repetition_signals(spark, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1)
    per document: duplicate-word fraction (1 - distinct/total), the
    most-frequent-bigram dominance fraction, and symbol-to-word ratio.
    Every 7th document gets planted spam ('! ! spam $ $ ...') so both
    the repetition and symbol signals separate docs.

    Plan shape: the scalar signals are pure array expressions inside
    whole-stage codegen (zero shuffle). The bigram dominance needs
    per-(doc, bigram) counts: explode -> partial-agg on the composite
    key (well distributed, no skew) -> per-doc max/sum. At 100 TB this
    is the standard two-level combine; no window function, no
    collect. All emitted doubles are single divisions of exact longs,
    so both engines agree bit-for-bit.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" ! ! spam $ $ spam $ $")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    base = docs.select("doc_id", tokens("text").alias("toks"))
    n = F.size("toks").cast("long")
    stats = base.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.size(F.filter("toks", lambda x: x.rlike("^[^a-z0-9]+$")))
        .cast("long")
        .alias("n_symbol"),
    ).filter(F.col("n_tokens") > 0)
    # sequence(0, -1) is DESCENDING under Spark semantics: guard docs
    # with < 2 tokens to an empty bigram array before exploding.
    bigram_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n.cast("int") - 2),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i + 1), F.element_at("toks", i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bgc = (
        base.select("doc_id", F.explode(bigram_arr).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    bga = bgc.groupBy("doc_id").agg(
        F.max("c").cast("long").alias("top_bigram_count"),
        F.sum("c").cast("long").alias("n_bigrams"),
    )
    return (
        stats.join(bga, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            ((F.col("n_tokens") - F.col("n_distinct")).cast("double")
             / F.col("n_tokens")).alias("dup_word_fraction"),
            F.coalesce(F.col("top_bigram_count"), F.lit(0))
            .cast("long")
            .alias("top_bigram_count"),
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            F.when(F.coalesce(F.col("n_bigrams"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("top_bigram_count").cast("double") / F.col("n_bigrams")
            )
            .alias("top_bigram_fraction"),
            (F.col("n_symbol").cast("double") / F.col("n_tokens")).alias(
                "symbol_word_ratio"
            ),
        )
        .orderBy("doc_id")
    )


#: Lowercase accent → ASCII fold map (PAIRED strings for translate()).
_ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüý"
_ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuy"


@query(
    "text_normalize_unicode",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0
                  THEN text || '  Café   Résumé naïve  É'
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(strip_accents(lower(text)),
                               '\\s+', ' ', 'g')) AS norm_text
    FROM corpus ORDER BY doc_id
    """,
)
def q_text_normalize_unicode(spark, sf_dir: str) -> DataFrame:
    """Unicode text normalization (the first pass of every tokenizer
    pipeline): lowercase, fold accented latin letters to ASCII, and
    collapse whitespace runs. Every 11th document gets planted
    accented+multi-space chrome so the fold actually fires. Pure
    narrow expressions (translate is a char-map, no regex backtracking
    beyond the whitespace collapse) — zero shuffle, full codegen.
    DuckDB's `strip_accents` is the oracle twin of the explicit
    translate map."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.col("text"), F.lit("  Café   Résumé naïve  É")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    norm = F.trim(
        F.regexp_replace(
            F.translate(F.lower(F.col("text")), _ACCENT_SRC, _ACCENT_DST),
            r"\s+",
            " ",
        )
    )
    return docs.select("doc_id", norm.alias("norm_text")).orderBy("doc_id")


#: NSFW/spam term blocklist (tiny demo dictionary — production lists
#: are thousands of terms and still broadcast-sized).
BLOCKLIST_TERMS = ("casino", "pills", "viagra")


@query(
    "filter_term_blocklist",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0
                  THEN text || ' buy cheap casino pills now'
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_intersect(
             list_distinct(list_filter(string_split(text, ' '),
                                       x -> x <> '')),
             ['casino', 'pills', 'viagra'])), ','), '') AS matched,
           len(list_intersect(
             list_distinct(list_filter(string_split(text, ' '),
                                       x -> x <> '')),
             ['casino', 'pills', 'viagra'])) = 0 AS keep
    FROM corpus ORDER BY doc_id
    """,
)
def q_filter_term_blocklist(spark, sf_dir: str) -> DataFrame:
    """Blocklist content filter (the C4 badwords pass): flag documents
    whose token set intersects a term blocklist; every 17th document
    gets planted spam so both branches exist. The blocklist is a
    literal array folded into the plan — at production size it is a
    broadcast dictionary either way; the scan stays narrow (set
    intersection per row, no explode, no shuffle)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(F.col("text"), F.lit(" buy cheap casino pills now")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    matched = F.array_sort(
        F.array_intersect(
            F.array_distinct(tokens("text")),
            F.array(*[F.lit(t) for t in BLOCKLIST_TERMS]),
        )
    )
    return docs.select(
        "doc_id",
        # comma-joined, not the raw array: the driver's pandas
        # canonicalization cannot sort list-typed output columns;
        # coalesce mirrors the oracle's '' for a NULL token array
        F.coalesce(F.array_join(matched, ","), F.lit("")).alias("matched"),
        (F.size(matched) == 0).alias("keep"),
    ).orderBy("doc_id")


#: Vocabulary size for the tokenizer-coverage audit.
VOCAB_TOP = 30


@query(
    "text_tokenizer_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT lang, u.t AS tok
      FROM documents,
           unnest(string_split_regex(text, '\\s+')) AS u(t)
      WHERE u.t <> ''
    ),
    lt AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY lang, tok
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, SUM(c) AS tc FROM lt GROUP BY tok
        ORDER BY tc DESC, tok LIMIT {VOCAB_TOP}
      )
    ),
    j AS (
      SELECT lt.lang, lt.tok, lt.c,
             (vocab.tok IS NOT NULL) AS in_vocab
      FROM lt LEFT JOIN vocab ON lt.tok = vocab.tok
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN in_vocab THEN c ELSE 0 END) AS BIGINT)
             AS covered_tokens,
           round(CAST(SUM(CASE WHEN in_vocab THEN c ELSE 0 END) AS DOUBLE)
                 / SUM(c), 6) AS coverage_r6,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT)
             AS oov_types,
           round(CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS oov_type_rate_r6
    FROM j GROUP BY lang ORDER BY lang
    """,
)
def q_text_tokenizer_coverage(spark, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: fix the top-VOCAB_TOP tokens by
    corpus frequency (deterministic (count, token) tie-break) as the
    "tokenizer vocabulary", then report per language what fraction of
    token OCCURRENCES the vocab covers and what fraction of TYPES
    fall out-of-vocabulary — the first diagnostic before committing a
    tokenizer to a multilingual mix (a language whose coverage
    collapses will fragment into bytes/unk and eat the token budget;
    cf. text_tokenizer_fertility, which measures the same risk as
    subword fan-out).

    Spark-first shape: ONE (lang, token) count pass feeds both the
    global vocab cut (a re-aggregation of the per-lang counts — the
    corpus is never re-tokenized) and the coverage join; the vocab is
    VOCAB_TOP rows, so the join BROADCASTS and the per-lang roll-up
    is map-side combinable. All metrics are exact integer ratios.

    Scale: token fan-out is the only corpus-sized stage; everything
    after keys on (lang, token) with map-side combine, and a hot
    token reduces before it ships."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("lang", F.explode(tokens("text")).alias("tok"))
    )
    lt = tok.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    vocab = (
        lt.groupBy("tok")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), F.asc("tok"))
        .limit(VOCAB_TOP)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    j = lt.join(F.broadcast(vocab), "tok", "left").select(
        "lang", "c", F.coalesce("in_vocab", F.lit(False)).alias("in_vocab")
    )
    return (
        j.groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("in_vocab"), 0).otherwise(1))
            .cast("long")
            .alias("oov_types"),
        )
        .select(
            "lang",
            "n_tokens",
            "covered_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("coverage_r6"),
            "n_types",
            "oov_types",
            F.round(
                F.col("oov_types").cast("double") / F.col("n_types"), 6
            ).alias("oov_type_rate_r6"),
        )
        .orderBy("lang")
    )


#: Cyrillic homoglyphs of latin a/e/o (U+0430, U+0435, U+043E) — the
#: classic confusable-spoofing trio. PAIRED strings for translate().
_CONF_LAT = "aeo"
_CONF_CYR = "аео"
_LATIN_LC = "abcdefghijklmnopqrstuvwxyz"


@query(
    "text_confusable_scripts",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN translate(text, 'aeo', 'аео')
                  ELSE text END AS t
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(length(t) - length(translate(t, 'аео', ''))
                  AS BIGINT) AS n_confusable,
             CAST(length(t) - length(translate(lower(t),
                  'abcdefghijklmnopqrstuvwxyz', '')) AS BIGINT) AS n_latin
      FROM corpus
    )
    SELECT doc_id, n_confusable, n_latin,
           n_confusable > 0 AND n_latin > 0 AS mixed_script,
           round(CAST(n_confusable AS DOUBLE)
                 / nullif(n_confusable + n_latin, 0), 6)
             AS confusable_ratio_r6
    FROM m ORDER BY doc_id
    """,
)
def q_text_confusable_scripts(spark, sf_dir: str) -> DataFrame:
    """Mixed-script confusable audit — the homoglyph-spoofing detector
    a web-scale curation pipeline runs before dedup and quality
    scoring: text whose latin letters are partially swapped for
    visually-identical Cyrillic codepoints (а/е/о) defeats exact and
    shingle dedup, poisons tokenizers (each spoofed word becomes an
    out-of-vocab token), and is a strong spam/SEO-cloaking signal.
    Every 3rd document gets the spoof planted (the same planted-chrome
    convention as text_normalize_unicode/filter_term_blocklist), then
    the detector — which sees only the spoofed corpus — counts
    confusable and latin codepoints per document and flags
    mixed-script rows with their confusable ratio.

    Counting is pure translate()/length() char-map arithmetic (no
    regex, no UDF): n_confusable = chars removed by folding the
    Cyrillic trio out, n_latin likewise over the lowercase latin
    alphabet — both engines count UTF-8 codepoints identically. The
    ratio is one deterministic double division of exact integers,
    rounded per the float policy.

    Scale: zero shuffles — a single scan projection in whole-stage
    codegen; the ORDER BY is presentation-only. A production fold-back
    (translate the trio to latin before fingerprinting) composes with
    dedup_exact_hash unchanged."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.translate(F.col("text"), _CONF_LAT, _CONF_CYR),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    n_conf = (
        F.length("t") - F.length(F.translate(F.col("t"), _CONF_CYR, ""))
    ).cast("long")
    n_lat = (
        F.length("t")
        - F.length(F.translate(F.lower(F.col("t")), _LATIN_LC, ""))
    ).cast("long")
    m = docs.select(
        "doc_id",
        n_conf.alias("n_confusable"),
        n_lat.alias("n_latin"),
    )
    return m.select(
        "doc_id",
        "n_confusable",
        "n_latin",
        ((F.col("n_confusable") > 0) & (F.col("n_latin") > 0)).alias(
            "mixed_script"
        ),
        F.round(
            F.col("n_confusable").cast("double")
            / F.nullif(F.col("n_confusable") + F.col("n_latin"), F.lit(0)),
            6,
        ).alias("confusable_ratio_r6"),
    ).orderBy("doc_id")
