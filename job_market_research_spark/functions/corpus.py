"""Corpus-preparation text operators: HTML stripping + duplicated-span
inventory (beyond-reference, training-data pipeline family).

- `text_html_strip`: the C4/CommonCrawl first step — markup never
  reaches the tokenizer. Tag removal is a single JVM-side
  regexp_replace; no UDF, no explode, scan-shaped (perfectly parallel,
  zero shuffle).
- `dedup_span_ngram`: span-level (not document-level) duplication — the
  "Deduplicating Training Data Makes Language Models Better"
  (Lee et al., 2022) observation that training corpora repeat
  SUBSTRINGS (boilerplate sentences, licence headers) across otherwise
  distinct documents. Full suffix-array dedup is a specialised batch
  job; the bounded relational form is an 8-token shingle inventory:
  every 8-gram occurring in ≥2 distinct documents, with its document
  and occurrence counts. Downstream, those grams drive span excision
  (same rebuild pattern as text_strip_boilerplate).

Scale shape for the span inventory: explode docs → 8-gram shingles
(len-7 rows per doc, bounded by the token cap) → groupBy(gram). The
gram key is high-cardinality and near-uniform, so the one shuffle is
balanced, and Spark plans the distinct doc count as a two-phase
aggregate (partial agg keyed on (gram, doc_id), then a map-side-
combinable count by gram) — a corpus-wide hot gram combines before
the final shuffle instead of flooding one reducer. The df-cap
(GRAM_DF_CAP, shared with ml/neardup.py) bounds the inventory
SEMANTICS: a gram in more than cap documents is corpus boilerplate /
stop-phrase noise, not a meaningful duplicated span — reporting it
would hand span-excision a gram that ablates half the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.functions.text import tokens
from job_market_research_spark.io import load
from job_market_research_spark.ml.neardup import GRAM_DF_CAP
from job_market_research_spark.registry import query

#: Span length (tokens) for the duplicated-span inventory.
SPAN_N = 8

#: Token cap per document — bounds shingle fan-out per row.
SPAN_TOKEN_CAP = 40

#: Boilerplate planted into every 23rd document so the corpus
#: deterministically contains cross-document duplicated spans.
_PLANT = "please apply online via the official careers portal before deadline"


@query(
    "text_html_strip",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN '<html><body><p class="main">' || text ||
                       '</p><div id="ad">sponsored</div></body></html>'
                  ELSE text END AS raw
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(raw, '<[^>]*>', ' ', 'g'),
                               '\\s+', ' ', 'g')) AS clean_text,
           CAST(len(regexp_extract_all(raw, '<[^>]*>')) AS BIGINT) AS n_tags
    FROM corpus ORDER BY doc_id
    """,
)
def q_text_html_strip(spark, sf_dir: str) -> DataFrame:
    """Markup removal: every 5th document is wrapped in HTML; tags are
    stripped with one global regexp_replace, whitespace re-collapsed,
    and the removed-tag count kept as a quality signal. Scan-shaped —
    the whole operator is three string expressions inside whole-stage
    codegen."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit('<html><body><p class="main">'),
                F.col("text"),
                F.lit('</p><div id="ad">sponsored</div></body></html>'),
            ),
        )
        .otherwise(F.col("text"))
        .alias("raw"),
    )
    stripped = F.trim(
        F.regexp_replace(
            F.regexp_replace("raw", r"<[^>]*>", " "), r"\s+", " "
        )
    )
    return docs.select(
        "doc_id",
        stripped.alias("clean_text"),
        F.size(F.regexp_extract_all("raw", F.lit(r"<[^>]*>"), 0)).cast("long").alias(
            "n_tags"
        ),
    ).orderBy("doc_id")


@query(
    "dedup_span_ngram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN doc_id % 23 = 0
                  THEN list_concat(
                    list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')[1:{SPAN_TOKEN_CAP}],
                    string_split('{_PLANT}', ' '))
                  ELSE list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '')[1:{SPAN_TOKEN_CAP}]
             END AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, array_to_string(t[i + 1: i + {SPAN_N}], ' ') AS gram
      FROM toks, unnest(range(0, greatest(len(t) - {SPAN_N} + 1, 0))) AS s(i)
    )
    SELECT gram,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM spans
    GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {GRAM_DF_CAP}
    ORDER BY gram
    """,
)
def q_dedup_span_ngram(spark, sf_dir: str) -> DataFrame:
    """Duplicated-span inventory: 8-token shingles occurring in 2..cap
    distinct documents, with document and occurrence counts. Every 23rd
    document carries a planted boilerplate sentence so the duplicated
    set is non-empty and deterministic. One explode + one groupBy(gram)
    shuffle; per-doc fan-out is bounded by the token cap; grams above
    GRAM_DF_CAP documents are excluded as stop-phrase noise (the
    SCALE.md df-cap — see module docstring for why the aggregation
    itself is already hot-gram-safe)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.slice(tokens("text"), 1, SPAN_TOKEN_CAP).alias("t"),
    )
    docs = docs.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 23 == 0,
            F.concat("t", F.split(F.lit(_PLANT), " ")),
        ).otherwise(F.col("t")),
    )
    spans = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= SPAN_N,
                F.expr(
                    f"transform(sequence(0, size(t) - {SPAN_N}),"
                    f" i -> array_join(slice(t, i + 1, {SPAN_N}), ' '))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    return (
        spans.groupBy("gram")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= GRAM_DF_CAP))
        .orderBy("gram")
    )


@query(
    "text_sentence_stats",
    oracle="""
    WITH sent AS (
      SELECT doc_id,
             list_filter(list_transform(
               string_split_regex(text, '[.!?]+'), s -> trim(s)),
               s -> s <> '') AS sentences
      FROM documents
    )
    SELECT doc_id,
           CAST(len(sentences) AS BIGINT) AS n_sentences,
           CAST(COALESCE(list_sum(list_transform(sentences,
                                                 s -> length(s))), 0)
                AS BIGINT) AS total_sentence_chars,
           CASE WHEN len(sentences) = 0 THEN 0.0
                ELSE round(CAST(list_sum(list_transform(sentences,
                                         s -> length(s))) AS DOUBLE)
                           / len(sentences), 6) END AS avg_sentence_len_r6
    FROM sent ORDER BY doc_id
    """,
)
def q_text_sentence_stats(spark, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats: terminal-punctuation split, trimmed
    non-empty sentences, per-doc count / total chars / mean length.
    The primitive under length-based curation gates (C4 drops docs
    with <3 sentences) and sentence-level chunking — token-based
    chunking (text_chunk_overlap) covers the other granularity.
    Scan-shaped: split/transform/aggregate all inside one projection,
    integer sums with one exact division at the end."""
    docs = load(spark, sf_dir, "documents")
    sentences = F.filter(
        F.transform(F.split("text", r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    d = docs.select("doc_id", sentences.alias("sentences"))
    total_chars = F.coalesce(
        F.aggregate(
            F.transform("sentences", lambda s: F.length(s).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
        F.lit(0),
    )
    n_sent = F.size("sentences").cast("long")
    return d.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        total_chars.alias("total_sentence_chars"),
        F.when(n_sent == 0, F.lit(0.0))
        .otherwise(F.round(total_chars.cast("double") / n_sent, 6))
        .alias("avg_sentence_len_r6"),
    ).orderBy("doc_id")


#: Novelty inventory result cap (stats are corpus-wide; only the
#: reported rows are bounded).
NOVELTY_DOC_CAP = 200


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM toks) WHERE g IS NOT NULL
    ),
    first_seen AS (
      SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY 1
    )
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS novelty_r6
    FROM grams gr JOIN first_seen f ON gr.g = f.g
    WHERE gr.doc_id < {NOVELTY_DOC_CAP}
    GROUP BY gr.doc_id ORDER BY gr.doc_id
    """,
)
def q_text_ngram_novelty(spark, sf_dir: str) -> DataFrame:
    """Novelty curve for curation: per document, the fraction of its
    3-word shingles appearing in NO earlier document (earlier = lower
    doc_id, the ingestion-order proxy). A collapsing novelty rate is
    the signal to stop ingesting a source; per-doc novelty below a
    floor is a drop rule (the doc is stitched from seen text).

    Two aggregations: gram → min(doc_id) (first-occurrence index —
    min is partial-agg safe, no df-cap needed because nothing joins
    pairwise), then gram→doc join back and a per-doc conditional
    count. Shuffle keys are gram then doc_id; hot stop-grams cost one
    combine-friendly min, never a candidate explosion. Ratios of
    exact integers — identical doubles both engines."""
    from job_market_research_spark.ml.neardup import word_shingles

    grams = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(word_shingles("text", 3)).alias("g"))
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        grams.join(first_seen, "g")
        .filter(F.col("doc_id") < NOVELTY_DOC_CAP)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            F.round(novel.cast("double") / F.count("*"), 6).alias("novelty_r6"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_excise_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN doc_id % 23 = 0
                  THEN list_concat(
                    list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')[1:{SPAN_TOKEN_CAP}],
                    string_split('{_PLANT}', ' '))
                  ELSE list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '')[1:{SPAN_TOKEN_CAP}]
             END AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, i, array_to_string(t[i + 1: i + {SPAN_N}], ' ') AS gram
      FROM toks, unnest(range(0, greatest(len(t) - {SPAN_N} + 1, 0))) AS s(i)
    ),
    inv AS (
      SELECT gram, MIN(doc_id) AS canon
      FROM spans GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {GRAM_DF_CAP}
    ),
    cov AS (
      SELECT DISTINCT s.doc_id, u.pos
      FROM spans s JOIN inv USING (gram),
           unnest(range(s.i, s.i + {SPAN_N})) AS u(pos)
      WHERE s.doc_id <> inv.canon
    ),
    rows_ AS (
      SELECT tk.doc_id, p.idx, tk.t[p.idx + 1] AS tok
      FROM toks tk, unnest(range(0, len(tk.t))) AS p(idx)
      WHERE tk.doc_id IN (SELECT doc_id FROM cov)
    ),
    marked AS (
      SELECT r.doc_id, r.idx, r.tok, c.pos IS NOT NULL AS excised
      FROM rows_ r LEFT JOIN cov c ON c.doc_id = r.doc_id AND c.pos = r.idx
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE NOT excised) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (WHERE excised) AS BIGINT) AS n_removed,
           coalesce(string_agg(tok, ' ' ORDER BY idx)
                      FILTER (WHERE NOT excised), '') AS kept_text
    FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "corpus", "beyond"),
)
def q_dedup_excise_spans(spark, sf_dir: str) -> DataFrame:
    """Duplicated-span EXCISION — the second half of the Lee et al.
    (2022) substring-dedup recipe that `dedup_span_ngram` inventories:
    every 8-token span occurring in 2..df-cap distinct documents keeps
    its first (min doc_id) occurrence and is cut from every other
    document, with the survivor text rebuilt positionally (the
    text_strip_boilerplate rebuild pattern). Output: one row per
    EDITED document — total/kept/removed token counts plus the
    rebuilt text; untouched documents pass through unreported.

    Scale shape: shingle explode (fan-out bounded by the token cap) →
    one groupBy(gram) for the inventory (df-capped, partial-agg
    combinable) → hash join spans⋈inventory on the high-cardinality
    gram key (both sides corpus-scale: shuffle join, NOT broadcast) →
    per-doc covered-position sets (≤ token-cap elements each) → a
    map-side lambda rebuild. No global sort, no window, no UDF; every
    shuffle key (gram, doc_id) is near-uniform. The df-cap is what
    keeps the excision sane AND the join bounded: a stop-phrase gram
    above the cap would both ablate half the corpus and fan the join
    out by cap² — same guard, same constant, as the inventory query.
    """
    # Fan the single-file local scan out to full width BEFORE the
    # shingle explode (the augmented_corpus discipline): the tokenize +
    # explode is CPU-bound map work consumed by TWO branches (inventory
    # build and coverage join), and a 1-2 split input would run both
    # near-serially.
    docs = (
        load(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.slice(tokens("text"), 1, SPAN_TOKEN_CAP).alias("t"),
        )
    )
    docs = docs.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 23 == 0,
            F.concat("t", F.split(F.lit(_PLANT), " ")),
        ).otherwise(F.col("t")),
    )
    spans = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= SPAN_N,
                F.expr(
                    f"transform(sequence(0, size(t) - {SPAN_N}),"
                    f" i -> struct(i AS i,"
                    f" array_join(slice(t, i + 1, {SPAN_N}), ' ') AS gram))"
                ),
            ).otherwise(
                F.array().cast("array<struct<i:int,gram:string>>")
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.gram").alias("gram"))
    inv = (
        spans.groupBy("gram")
        .agg(
            F.min("doc_id").alias("canon"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= GRAM_DF_CAP))
        .select("gram", "canon")
    )
    cov = (
        spans.join(inv, "gram")
        .filter(F.col("doc_id") != F.col("canon"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + SPAN_N - 1)).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("cov"))
    )
    kept = F.filter("t", lambda x, i: ~F.array_contains(F.col("cov"), i))
    return (
        docs.join(cov, "doc_id")
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_total"),
            kept.alias("kept"),
        )
        .select(
            "doc_id",
            "n_total",
            F.size("kept").cast("long").alias("n_kept"),
            (F.col("n_total") - F.size("kept")).cast("long").alias("n_removed"),
            F.coalesce(F.array_join("kept", " "), F.lit("")).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_readability_scores",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(greatest(len(list_filter(list_transform(
                    string_split_regex(text, '[.!?]+'), s -> trim(s)),
                    s -> s <> '')), 1) AS BIGINT) AS n_sentences,
             CAST(greatest(len(regexp_extract_all(lower(text),
                    '[aeiouy]+')), 1) AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
             AS flesch_r6,
           round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                 - 15.59, 6) AS fk_grade_r6
    FROM feats WHERE n_words > 0 ORDER BY doc_id
    """,
    tags=("text", "quality", "beyond"),
)
def q_text_readability_scores(spark, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document — the
    readability gates used alongside Gopher/C4 rules when curating
    educational/reading-level-targeted corpora (e.g. textbook-style
    filtering). Syllables are approximated by vowel-group runs (the
    standard dictionary-free proxy; whitespace breaks runs, so a
    corpus-wide regexp count equals the per-word sum), sentences by
    terminal punctuation (the text_sentence_stats splitter), with
    floor-1 guards so punctuation-free docs score rather than crash.

    Scale: three counting expressions inside whole-stage codegen —
    scan-shaped, zero shuffle, no UDF; the formulas are pure rational
    arithmetic over the integer counts (round-6 only at the end)."""
    txt = load(spark, sf_dir, "documents")
    n_words = F.size(tokens("text")).cast("long")
    n_sentences = F.greatest(
        F.size(
            F.filter(
                F.transform(
                    F.split("text", r"[.!?]+"), lambda s: F.trim(s)
                ),
                lambda s: s != "",
            )
        ),
        F.lit(1),
    ).cast("long")
    n_syllables = F.greatest(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)),
        F.lit(1),
    ).cast("long")
    feats = txt.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return feats.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 6).alias("flesch_r6"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 6).alias("fk_grade_r6"),
    ).orderBy("doc_id")
