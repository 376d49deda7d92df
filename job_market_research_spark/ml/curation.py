"""Training-data curation operators (beyond-reference).

Three ops every large-scale LLM training pipeline runs between raw
corpus and tokenizer, none of which the reference (an exact-key ETL)
has — expressed as pure relational plans so they scale with the
shuffle layer:

- **benchmark decontamination**: flag training documents sharing any
  word n-gram with an eval/benchmark set (the standard n-gram-overlap
  decontamination used for public-benchmark hygiene). The benchmark
  shingle index is bounded by the EVAL suite size, not the corpus, so
  broadcasting it is the genuinely-safe broadcast; the training side
  streams through a map-side semi-join and never shuffles its text.
- **weighted mixture sampling**: hit per-source target rates with the
  same stable md5 keying as ml/sampling.py — re-running, resharding or
  growing the corpus never flips a survivor decision, which is what
  makes mixture recipes reproducible across pipeline versions.
- **sequence packing**: greedy concat-and-chunk packing of documents
  into fixed-length training sequences as a running token sum per
  (source, shard-bucket) — exact integer math over a partitioned
  window. The hash sub-bucket bounds every window partition at
  corpus_size / (sources × buckets), so no single reducer ever sees a
  whole source — the 100 TB window-partitioning story, not just a
  single-partition demo.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.functions.text import tokens
from job_market_research_spark.io import load
from job_market_research_spark.ml.neardup import portable_hash, word_shingles
from job_market_research_spark.registry import query

#: Oracle twin of portable_hash (see ml/sampling.py).
_ORACLE_HASH = "CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT)"

#: Decontamination n-gram width. 5 words is the common public choice
#: (large enough to avoid idiom collisions, small enough to catch
#: paraphrase-free quoting).
DECON_NGRAM = 5

#: Packed-sequence length in whitespace tokens (demo value; a real
#: pipeline uses the model context length).
SEQ_LEN = 128

#: Shard sub-buckets for the packing window partition key.
PACK_BUCKETS = 4


def decontaminate(
    train: DataFrame, benchmark: DataFrame, n: int = DECON_NGRAM
) -> DataFrame:
    """Adds `contaminated` (0/1) to `train`: 1 iff the document shares
    at least one word n-gram with any benchmark document.

    Plan: benchmark → distinct shingles (eval-suite-bounded →
    broadcast) ⟕ train shingles (explode, map-side hash-join, distinct
    doc_ids) → left join back onto train. The train table is scanned
    once for shingling and once for the flag join; at 100 TB both are
    embarrassingly parallel and the only shuffle is the doc_id
    distinct, keyed uniformly.
    """
    bench_grams = (
        benchmark.select(F.explode(word_shingles("text", n)).alias("sh")).distinct()
    )
    hits = (
        train.select("doc_id", F.explode(word_shingles("text", n)).alias("sh"))
        .join(F.broadcast(bench_grams), "sh")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    return train.join(hits, "doc_id", "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(0))
    )


def mixture_sample(
    df: DataFrame, rates: dict[str, float], key: str = "doc_id",
    stratum: str = "source", buckets: int = 10000
) -> DataFrame:
    """Keep each stratum at its target rate, hash-deterministically.

    `rates` maps stratum value → keep fraction in [0, 1]. The rates
    table is a bounded dictionary (one row per source), so it joins by
    broadcast; the survivor decision is a pure function of
    (stratum, key) exactly as in ml/sampling.py. Strata absent from
    `rates` are dropped (rate 0).
    """
    spark = df.sparkSession
    rate_rows = [(k, int(round(v * buckets))) for k, v in sorted(rates.items())]
    rate_df = spark.createDataFrame(rate_rows, f"{stratum} string, keep_lt int")
    b = F.pmod(
        portable_hash(F.concat_ws("|", F.col(stratum), F.col(key).cast("string"))),
        F.lit(buckets),
    )
    return (
        df.join(F.broadcast(rate_df), stratum)
        .filter(b < F.col("keep_lt"))
        .drop("keep_lt")
    )


def upsample_mixture(
    df: DataFrame, rates: dict[str, float], key: str = "doc_id",
    stratum: str = "source", buckets: int = 10000
) -> DataFrame:
    """Mixture sampling with rates ABOVE 1: rate 2.3 emits every row
    twice (epochs) plus a deterministic 30% hash-kept third copy —
    how training recipes upsample scarce high-quality sources.

    Adds `copy_id` (1..n) so downstream shuffling/packing can spread
    the repeats. The per-row copy count is a pure function of
    (stratum, key): floor(rate) everywhere, +1 for rows whose hash
    bucket falls under the fractional part. Rows from strata absent in
    `rates` are dropped. The explode is by a tiny integer sequence —
    no join, no shuffle; output size is exactly rate × input per
    stratum in expectation, deterministic per row.
    """
    spark = df.sparkSession
    rate_rows = [
        (k, int(v), int(round((v - int(v)) * buckets)))
        for k, v in sorted(rates.items())
    ]
    rate_df = spark.createDataFrame(
        rate_rows, f"{stratum} string, whole int, frac_lt int"
    )
    b = F.pmod(
        portable_hash(F.concat_ws("|", F.col(stratum), F.col(key).cast("string"))),
        F.lit(buckets),
    )
    n_copies = F.col("whole") + F.when(b < F.col("frac_lt"), 1).otherwise(0)
    # sequence(1, 0) is a DESCENDING range in Spark, not empty — rows
    # with zero copies must short-circuit to an empty array so explode
    # drops them.
    copies = F.when(n_copies >= 1, F.sequence(F.lit(1), n_copies)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.join(F.broadcast(rate_df), stratum)
        .withColumn("copy_id", F.explode(copies))
        .drop("whole", "frac_lt")
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    stratum: str = "source",
    seq_len: int = SEQ_LEN,
    pack_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Greedy concat-and-chunk sequence packing: documents are laid
    end-to-end in deterministic key order within each
    (stratum, hash-bucket) shard and chunked every `seq_len` tokens.

    Emits per document: `n_tokens`, `bucket`, `seq_id` (which packed
    sequence the document STARTS in) and `offset` (token offset inside
    that sequence) — exact integers from one partitioned running sum,
    so both engines agree bit-for-bit. The hash bucket keeps every
    window partition at shard size regardless of how big one source
    is; packing has no semantic order requirement, so any
    deterministic order per shard is valid.
    """
    n_tok = F.size(F.split(F.trim(F.col(text_col)), " "))
    bucket = F.pmod(portable_hash(F.col(key).cast("string")), F.lit(pack_buckets))
    w = (
        Window.partitionBy(stratum, "bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("bucket", bucket)
        .withColumn("cum", F.sum("n_tokens").over(w))
    )
    start = F.col("cum") - F.col("n_tokens")
    return (
        out.withColumn(
            "seq_id", F.expr(f"(cum - n_tokens) div {seq_len}").cast("long")
        )
        .withColumn("offset", F.pmod(start, F.lit(seq_len)).cast("long"))
        .drop("cum")
    )


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------

#: Train corpus with PLANTED contamination (mirrors neardup's
#: augmented-corpus trick): every benchmark doc (doc_id % 97 == 0)
#: gets a "quoting" train doc (doc_id + 3000000) that drops the first
#: token — guaranteed shared 5-grams, deterministic on both engines.
_DECON_CORPUS_SQL = """
      SELECT doc_id, text, source FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 3000000 AS doc_id,
             regexp_replace(text, '^[^ ]+ ', '') AS text, source
      FROM documents WHERE doc_id % 97 = 0
"""


def _decon_frames(spark, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    quoting = benchmark.select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.regexp_replace("text", r"^[^ ]+ ", "").alias("text"),
        "source",
    )
    train = docs.filter(F.col("doc_id") % 97 != 0).unionByName(quoting)
    return train, benchmark


@query(
    "text_decontaminate",
    oracle=f"""
    WITH train AS ({_DECON_CORPUS_SQL}),
    bench AS (SELECT text FROM documents WHERE doc_id % 97 = 0),
    bgrams AS (
      SELECT DISTINCT g FROM (
        SELECT unnest(list_transform(
                 range(1, greatest(len(string_split(trim(text), ' ')) - {DECON_NGRAM - 2}, 1)),
                 i -> array_to_string(string_split(trim(text), ' ')[i : i + {DECON_NGRAM - 1}], ' ')))
               AS g
        FROM bench) WHERE g IS NOT NULL
    ),
    tgrams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(string_split(trim(text), ' ')) - {DECON_NGRAM - 2}, 1)),
                 i -> array_to_string(string_split(trim(text), ' ')[i : i + {DECON_NGRAM - 1}], ' ')))
               AS g
        FROM train) WHERE g IS NOT NULL
    ),
    hits AS (SELECT DISTINCT doc_id FROM tgrams JOIN bgrams USING (g))
    SELECT t.source,
           CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean,
           CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN t.doc_id END) AS BIGINT)
             AS contaminated_checksum
    FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
    GROUP BY 1 ORDER BY 1
    """,
)
def q_text_decontaminate(spark, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination over the documents corpus with
    planted quoting docs: per source, how many training documents
    share a 5-gram with the benchmark slice (doc_id % 97 == 0), with
    an id checksum proving BOTH engines flag the same documents. Every
    planted quote (+3M ids) must be caught."""
    train, benchmark = _decon_frames(spark, sf_dir)
    flagged = decontaminate(train, benchmark)
    return (
        flagged.groupBy("source")
        .agg(
            F.sum("contaminated").alias("n_contaminated"),
            F.sum(1 - F.col("contaminated")).alias("n_clean"),
            F.sum(
                F.when(F.col("contaminated") == 1, F.col("doc_id"))
            ).alias("contaminated_checksum"),
        )
        .orderBy("source")
    )


@query(
    "sample_mixture_weighted",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source,
             (CAST(substr(source, 4) AS INT) % 4 + 1) * 2500 AS keep_lt
      FROM documents
    )
    SELECT source, CAST(MIN(keep_lt) AS DOUBLE) / 10000 AS rate,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM rated
    WHERE {_ORACLE_HASH.format(col="source || '|' || CAST(doc_id AS VARCHAR)")}
            % 10000 < keep_lt
    GROUP BY 1 ORDER BY 1
    """,
)
def q_sample_mixture_weighted(spark, sf_dir: str) -> DataFrame:
    """Weighted mixture sampling: each source keeps its own target
    fraction (here src{{i}} keeps (i%4+1)/4 — a 25/50/75/100% recipe),
    decided by the stable hash so the mixture is reproducible. The
    checksum proves the exact survivor sets match across engines."""
    docs = load(spark, sf_dir, "documents")
    # the recipe is CONFIG (src{i} keeps (i%4+1)/4), not derived from
    # the data — no collect()-an-extra-job to discover sources; keys
    # for sources absent at this sf are harmless (inner rate join).
    rates = {f"src{i}": (i % 4 + 1) / 4 for i in range(100)}
    kept = mixture_sample(docs, rates)
    return (
        kept.groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("doc_id").alias("id_checksum"))
        .withColumn(
            "rate",
            ((F.expr("CAST(substr(source, 4) AS INT)") % 4 + 1) * F.lit(2500.0))
            / 10000,
        )
        .select("source", "rate", "n_kept", "id_checksum")
        .orderBy("source")
    )


@query(
    "sample_mixture_upsample",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source,
             1 + (CAST(substr(source, 4) AS INT) % 2) AS whole,
             CASE WHEN CAST(substr(source, 4) AS INT) % 4 = 0
                  THEN 5000 ELSE 0 END AS frac_lt
      FROM documents
    ),
    copies AS (
      SELECT doc_id, source,
             whole + CASE WHEN
               {_ORACLE_HASH.format(col="source || '|' || CAST(doc_id AS VARCHAR)")}
                 % 10000 < frac_lt THEN 1 ELSE 0 END AS n_copies
      FROM rated
    ),
    exploded AS (
      SELECT doc_id, source,
             CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy_id
      FROM copies
    )
    SELECT source, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id * copy_id) AS BIGINT) AS copy_checksum
    FROM exploded GROUP BY 1 ORDER BY 1
    """,
)
def q_sample_mixture_upsample(spark, sf_dir: str) -> DataFrame:
    """Epoch-style upsampling: src{{i}} repeats 1+(i%2) times, plus a
    deterministic half-weight extra copy where i%4==0 (rates 1.0/1.5/
    2.0/2.5 cycling). The copy-weighted checksum proves both engines
    emit the identical multiset of (doc, copy) rows."""
    docs = load(spark, sf_dir, "documents")
    # static recipe, same rationale as sample_mixture_weighted
    rates = {
        f"src{i}": (1 + i % 2) + (0.5 if i % 4 == 0 else 0.0) for i in range(100)
    }
    up = upsample_mixture(docs, rates)
    return (
        up.groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.col("doc_id") * F.col("copy_id")).alias("copy_checksum"),
        )
        .orderBy("source")
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             {_ORACLE_HASH.format(col="doc_id")} % {PACK_BUCKETS} AS bucket
      FROM documents
    ),
    runs AS (
      SELECT doc_id, source, bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT doc_id, source, bucket, n_tokens,
           CAST((cum - n_tokens) // {SEQ_LEN} AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % {SEQ_LEN} AS BIGINT) AS offset
    FROM runs ORDER BY source, bucket, doc_id
    """,
)
def q_pack_sequences(spark, sf_dir: str) -> DataFrame:
    """Sequence packing over the corpus: per (source, hash-bucket)
    shard, documents are concatenated in doc_id order and chunked into
    {SEQ_LEN}-token training sequences; each doc reports its sequence
    id and intra-sequence offset. Pure integer window math — both
    engines agree exactly."""
    docs = load(spark, sf_dir, "documents")
    packed = pack_sequences(docs)
    # per-row output, order-insensitive driver hash → no trailing sort
    return packed.select(
        "doc_id", "source", "bucket", "n_tokens", "seq_id", "offset"
    )


#: A line (sentence) appearing in at least this many DISTINCT documents
#: is boilerplate (nav chrome, cookie banners, disclaimers).
BOILERPLATE_DOC_FREQ = 3


def strip_boilerplate_lines(
    df: DataFrame, text_col: str = "text", key: str = "doc_id",
    sep: str = ". ", min_doc_freq: int = BOILERPLATE_DOC_FREQ
) -> DataFrame:
    """Corpus-level boilerplate removal (the C4/RefinedWeb line-dedup
    pass): split each document into lines, count each line's DISTINCT
    document frequency, drop lines at/above the threshold from EVERY
    document, and reassemble the text in original line order.

    Plan: explode with position → df-count per line (one aggregation,
    map-side partial) → broadcast-join the hot-line set back (it is
    small: boilerplate is by definition the repetitive minority) →
    re-aggregate lines per doc sorted by position. Two corpus shuffles
    (the df count and the per-doc rebuild); the hot-line anti-join is
    map-side.
    """
    # F.split takes a REGEX; escape so a literal ". " separator does not
    # shred the text on any-char-plus-space (DuckDB string_split is literal).
    lines = df.select(
        key,
        F.posexplode(F.split(F.col(text_col), F.lit(re.escape(sep)))).alias(
            "pos", "line"
        ),
    ).filter(F.col("line") != "")
    hot = (
        lines.groupBy("line")
        .agg(F.countDistinct(key).alias("df"))
        .filter(F.col("df") >= min_doc_freq)
        .select("line")
    )
    kept = lines.join(F.broadcast(hot), "line", "left_anti")
    rebuilt = kept.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_kept_lines"),
    )
    total = lines.groupBy(key).agg(F.count("*").alias("n_lines"))
    return total.join(rebuilt, key, "left").select(
        key,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_kept_lines"), F.lit(0)).cast("long").alias("n_kept_lines"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept_lines"), F.lit(0)))
        .cast("long")
        .alias("n_removed_lines"),
    )


@query(
    "text_strip_boilerplate",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN 'subscribe to our newsletter. ' || text
                       || '. all rights reserved'
                  ELSE text END AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id, pos, line FROM (
        SELECT doc_id,
               unnest(string_split(text, '. ')) AS line,
               generate_subscripts(string_split(text, '. '), 1) AS pos
        FROM corpus)
      WHERE line <> ''
    ),
    hot AS (
      SELECT line FROM lines GROUP BY line
      HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_DOC_FREQ}
    ),
    kept AS (
      SELECT l.* FROM lines l LEFT JOIN hot h ON l.line = h.line
      WHERE h.line IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(line, '. ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept_lines
      FROM kept GROUP BY doc_id
    ),
    total AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           CAST(COALESCE(r.n_kept_lines, 0) AS BIGINT) AS n_kept_lines,
           CAST(t.n_lines - COALESCE(r.n_kept_lines, 0) AS BIGINT)
             AS n_removed_lines
    FROM total t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    ORDER BY t.doc_id
    """,
)
def q_text_strip_boilerplate(spark, sf_dir: str) -> DataFrame:
    """Boilerplate line removal over the corpus, with planted chrome:
    every 5th document gets a newsletter banner + rights footer, which
    cross the document-frequency threshold and must be stripped from
    ALL of them while every organic line survives. Both engines must
    rebuild the identical cleaned text in original line order."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("subscribe to our newsletter. "),
                F.col("text"),
                F.lit(". all rights reserved"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return strip_boilerplate_lines(docs).orderBy("doc_id")


#: Chunking geometry: 32-token chunks, stride 24 (8-token overlap).
CHUNK_SIZE = 32
CHUNK_STRIDE = 24


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    starts AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE}))
               AS start
      FROM toks
    )
    SELECT doc_id,
           CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           array_to_string(toks[start + 1 : start + {CHUNK_SIZE}], ' ')
             AS chunk_text,
           CAST(least({CHUNK_SIZE}, len(toks) - start) AS BIGINT)
             AS n_chunk_tokens
    FROM starts
    WHERE start < len(toks)
    ORDER BY doc_id, chunk_id
    """,
)
def q_text_chunk_overlap(spark, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (the embed-long-docs pipeline
    op): 32-token chunks on a 24-token stride so consecutive chunks
    overlap by 8 tokens and no boundary sentence is lost. Pure array
    expressions — the chunk starts are a sequence, the chunk text a
    slice — so the whole thing is one narrow codegen stage; the only
    data growth is the intended ~size/stride duplication factor, and
    chunks inherit the parent's partitioning (no shuffle at all).
    """
    toks_df = load(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    n = F.size("toks")
    starts = F.filter(
        F.sequence(
            F.lit(0),
            F.greatest(n - 1, F.lit(0)),
            F.lit(CHUNK_STRIDE),
        ),
        lambda s: s < n,
    )
    return (
        toks_df.select(
            "doc_id",
            "toks",
            n.alias("n"),
            F.explode(starts).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, CHUNK_SIZE), " "
            ).alias("chunk_text"),
            F.least(F.lit(CHUNK_SIZE), F.col("n") - F.col("start"))
            .cast("long")
            .alias("n_chunk_tokens"),
        )
        .orderBy("doc_id", "chunk_id")
    )


#: E2E pipeline gates: token floor, stop-ratio floor (3% expressed as
#: an integer cross-multiplication), deterministic keep rate (%).
PIPE_MIN_TOKENS = 20
PIPE_STOP_PCT = 3
PIPE_KEEP_PCT = 50
PIPE_LANGS = ("en", "fr", "es", "de")

_PIPE_LANGS_SQL = ", ".join(f"'{l}'" for l in PIPE_LANGS)


@query(
    "pipeline_curation_e2e",
    oracle=f"""
    WITH deduped AS (
      SELECT doc_id, text, lang, source FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1
    ),
    scored AS (
      SELECT doc_id, lang, source,
             CAST(len(list_filter(string_split(text,' '), x -> x <> ''))
                  AS BIGINT) AS n_tok,
             CAST(len(list_filter(string_split(text,' '),
                  x -> x IN ('the','a','of','and','to','in')))
                  AS BIGINT) AS n_stop
      FROM deduped
    ),
    gated AS (
      SELECT *,
             n_tok >= {PIPE_MIN_TOKENS}
               AND 100 * n_stop >= {PIPE_STOP_PCT} * n_tok
               AND lang IN ({_PIPE_LANGS_SQL}) AS keep_quality
      FROM scored
    ),
    sampled AS (
      SELECT *,
             keep_quality AND
             {_ORACLE_HASH.format(col="'pipe|' || CAST(doc_id AS VARCHAR)")}
               % 100 < {PIPE_KEEP_PCT} AS keep_final
      FROM gated
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN keep_quality THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality,
           CAST(SUM(CASE WHEN keep_final THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(SUM(CASE WHEN keep_final THEN n_tok ELSE 0 END) AS BIGINT)
             AS sampled_tokens
    FROM sampled GROUP BY 1, 2 ORDER BY source, lang
    """,
)
def q_pipeline_curation_e2e(spark, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline as ONE composed plan: exact dedup
    (min-doc_id survivor per content hash) → quality gate (token
    floor + stopword-ratio floor as an integer cross-multiplication —
    no float threshold) → language allowlist → deterministic
    hash-sampled keep rate → per-(source, lang) yield report. This is
    the shape of a real pretraining-data run, proving the operator
    families compose into one Catalyst plan: the dedup window, the
    scan-shaped scoring, and the sampling decision all pipeline
    between two shuffles (content-hash, then the bounded report key).

    Every decision is exact-integer or hash-deterministic, so the
    whole pipeline is retry/reshard-stable and the oracle replays it
    end-to-end — per-stage counts (candidates → quality → sampled)
    make the yield at each gate auditable."""
    docs = load(spark, sf_dir, "documents")
    survivor = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id")
    )
    deduped = docs.withColumn("rn", survivor).filter(F.col("rn") == 1)
    toks = tokens("text")
    scored = deduped.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(
            F.filter(toks, lambda x: x.isin("the", "a", "of", "and", "to", "in"))
        )
        .cast("long")
        .alias("n_stop"),
    )
    keep_quality = (
        (F.col("n_tok") >= PIPE_MIN_TOKENS)
        & (100 * F.col("n_stop") >= PIPE_STOP_PCT * F.col("n_tok"))
        & F.col("lang").isin(*PIPE_LANGS)
    )
    keep_final = keep_quality & (
        portable_hash(F.concat(F.lit("pipe|"), F.col("doc_id").cast("string")))
        % 100
        < PIPE_KEEP_PCT
    )
    return (
        scored.withColumn("keep_quality", keep_quality)
        .withColumn("keep_final", keep_final)
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("keep_quality"), 1).otherwise(0))
            .cast("long")
            .alias("n_quality"),
            F.sum(F.when(F.col("keep_final"), 1).otherwise(0))
            .cast("long")
            .alias("n_sampled"),
            F.sum(F.when(F.col("keep_final"), F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("sampled_tokens"),
        )
        .orderBy("source", "lang")
    )


#: Token-budget allocation: the global budget and epoch cap note — the
#: budget is deliberately below the corpus total at every SF so the
#: waterline is interesting.
MIX_BUDGET_TOKENS = 50_000


@query(
    "mixture_token_budget",
    oracle=f"""
    WITH per_src AS (
      SELECT source,
             CAST(SUM(len(list_filter(string_split(text, ' '),
                  x -> x <> ''))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT source, tokens,
             CAST(ROW_NUMBER() OVER (ORDER BY tokens, source) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS m,
             CAST(COALESCE(SUM(tokens) OVER (
               ORDER BY tokens, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS prefix
      FROM per_src
    ),
    flagged AS (
      SELECT *,
             (tokens * (m - i + 1) <= {MIX_BUDGET_TOKENS} - prefix)
               AS saturated
      FROM ranked
    ),
    cut AS (
      SELECT COALESCE(MAX(CASE WHEN saturated THEN i END), 0) AS i_star,
             COALESCE(MAX(CASE WHEN saturated THEN prefix + tokens END), 0)
               AS sat_sum,
             MAX(m) AS m
      FROM flagged
    )
    SELECT f.source, f.tokens,
           CASE WHEN f.saturated THEN f.tokens
                ELSE least(f.tokens, CAST(floor(
                  CAST({MIX_BUDGET_TOKENS} - c.sat_sum AS DOUBLE)
                  / (c.m - c.i_star)) AS BIGINT)) END AS allocated,
           f.saturated,
           round(CAST(CASE WHEN f.saturated THEN f.tokens
                ELSE least(f.tokens, CAST(floor(
                  CAST({MIX_BUDGET_TOKENS} - c.sat_sum AS DOUBLE)
                  / (c.m - c.i_star)) AS BIGINT)) END AS DOUBLE)
                 / f.tokens, 6) AS epochs_r6
    FROM flagged f CROSS JOIN cut c
    ORDER BY f.source
    """,
    tags=("mixture", "beyond"),
)
def q_mixture_token_budget(spark, sf_dir: str) -> DataFrame:
    """Token-budget water-filling across sources: given a global
    training-token budget, give every source an equal share except
    that no source can contribute more than it has — the exact
    waterline allocation (the closed-form solve of
    max-min-fairness / the first stage of a DoReMi-style mixture
    before model-driven reweighting). Sources smaller than the
    waterline saturate (all their tokens used, epochs = 1.0); the rest
    split the remainder equally.

    The waterline is found CLOSED-FORM, not iteratively: sort sources
    by token count ascending, and source i saturates iff
    tokens_i·(m-i+1) ≤ budget - prefix_i — an ALL-INTEGER test (no
    float waterline comparisons), monotone in i, so the saturated set
    is a prefix and θ = (budget - saturated_sum)/(m - i*) falls out in
    one pass. floor(θ) keeps allocations integral (Σ alloc ≤ budget
    with remainder < m tokens).

    Scale shape: the corpus reduces to ONE |sources|-row aggregate
    (map-side token sums); every window after that runs on the
    bounded source table (allowlisted in test_plan_hygiene) and the
    scalar cut broadcasts back. At 100 TB this is one corpus scan, one
    tiny shuffle."""
    per_src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(
                F.size(F.filter(F.split("text", " "), lambda x: x != ""))
            )
            .cast("long")
            .alias("tokens")
        )
    )
    w = Window.orderBy("tokens", "source")
    ranked = per_src.select(
        "source",
        "tokens",
        F.row_number().over(w).cast("long").alias("i"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("m"),
        F.coalesce(
            F.sum("tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("prefix"),
    )
    flagged = ranked.withColumn(
        "saturated",
        F.col("tokens") * (F.col("m") - F.col("i") + 1)
        <= F.lit(MIX_BUDGET_TOKENS) - F.col("prefix"),
    )
    cut = flagged.agg(
        F.coalesce(
            F.max(F.when(F.col("saturated"), F.col("i"))), F.lit(0)
        ).alias("i_star"),
        F.coalesce(
            F.max(
                F.when(F.col("saturated"), F.col("prefix") + F.col("tokens"))
            ),
            F.lit(0),
        ).alias("sat_sum"),
        F.max("m").alias("m_tot"),
    )
    alloc = F.when(F.col("saturated"), F.col("tokens")).otherwise(
        F.least(
            F.col("tokens"),
            F.floor(
                (F.lit(MIX_BUDGET_TOKENS) - F.col("sat_sum")).cast("double")
                / (F.col("m_tot") - F.col("i_star"))
            ).cast("long"),
        )
    )
    return (
        flagged.crossJoin(F.broadcast(cut))
        .select(
            "source",
            "tokens",
            alloc.alias("allocated"),
            "saturated",
            F.round(alloc.cast("double") / F.col("tokens"), 6).alias(
                "epochs_r6"
            ),
        )
        .orderBy("source")
    )


#: RAG index composition: hashed-projection embedding dims, value cap
#: per (dim, token), coarse-bucket count, retrieval depth, fixed query.
RAG_DIMS = 8
RAG_BUCKETS = 4
RAG_TOP = 5
RAG_QUERY = "spark hash stream"

#: One 60-bit md5 PER TOKEN; each of the 8 dims reads a different
#: 4-bit lane (stride-7 rotation over the 60 bits). The old form
#: hashed every (dim, token) pair — 8 md5 per token was the whole cost
#: of the e2e pipeline (8.7 s → ~3 s at sf0.1). Lane overlap is fine:
#: this is the deterministic stand-in encoder, not a real embedding.
_RAG_HL_SPARK = (
    "transform(ctoks, t -> CAST(conv(substr(md5(t), 1, 15), 16, 10) AS LONG))"
)
_RAG_HL_SQL = (
    "list_transform(ctoks, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)"
)
_RAG_EMB_SPARK = (
    f"transform(sequence(0, {RAG_DIMS - 1}), j -> aggregate(chl, 0L,"
    " (acc, h) -> acc + (shiftright(h, CAST((7 * j) % 46 AS INT)) & 15L)))"
)
_RAG_EMB_SQL = (
    f"list_transform(range(0, {RAG_DIMS}), j -> list_sum(list_transform("
    "chl, h -> (h >> CAST((7 * j) % 46 AS INT)) & 15)))"
)


@query(
    "pipeline_rag_index_e2e",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
             toks[start + 1 : start + {CHUNK_SIZE}] AS ctoks
      FROM (SELECT doc_id, toks,
                   unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE}))
                     AS start
            FROM toks)
      WHERE start < len(toks)
    ),
    hashed AS (
      SELECT doc_id, chunk_id, {_RAG_HL_SQL} AS chl FROM chunks
    ),
    embedded AS (
      SELECT doc_id, chunk_id, {_RAG_EMB_SQL} AS v FROM hashed
    ),
    indexed AS (
      SELECT doc_id, chunk_id, v,
             list_sum(v) % {RAG_BUCKETS} AS bucket,
             sqrt(CAST(list_sum(list_transform(v, x -> x * x)) AS DOUBLE))
               AS nrm
      FROM embedded
    ),
    q AS (
      SELECT {_RAG_EMB_SQL} AS v,
             list_sum({_RAG_EMB_SQL}) % {RAG_BUCKETS} AS bucket
      FROM (SELECT {_RAG_HL_SQL} AS chl
            FROM (SELECT list_filter(string_split('{RAG_QUERY}', ' '),
                                     x -> x <> '') AS ctoks))
    ),
    probed AS (
      SELECT i.doc_id, i.chunk_id,
             round(CAST(list_sum(list_transform(range(1, len(i.v) + 1),
                    k -> i.v[k] * q.v[k])) AS DOUBLE)
                   / (i.nrm * sqrt(CAST(list_sum(list_transform(q.v,
                      x -> x * x)) AS DOUBLE))), 6) AS cosine
      FROM indexed i, q
      WHERE i.bucket = q.bucket AND i.nrm > 0
    )
    SELECT doc_id, chunk_id, cosine FROM probed
    ORDER BY cosine DESC, doc_id, chunk_id LIMIT {RAG_TOP}
    """,
    tags=("pipeline", "ann", "beyond"),
)
def q_pipeline_rag_index_e2e(spark, sf_dir: str) -> DataFrame:
    """End-to-end RAG indexing pipeline as ONE composed plan:
    chunk (sliding 32/24 windows, `text_chunk_overlap`'s shape) →
    embed (deterministic hashed projection per chunk — the
    dependency-free stand-in for a real encoder, same role as the
    multimodal fake-decode) → coarse-bucket assignment (IVF stand-in:
    a pure function of the vector, replayable; production uses learned
    centroids via `ml_kmeans_lite`) → probe the query's bucket only →
    cosine top-{RAG_TOP} chunks. The full retrieval story
    (`text_chunk_overlap` + `embed_mean_pool` + `ann_ivf_topk` exist
    separately; this query proves the COMPOSITION stays one lazy DAG).

    Scale: chunking and embedding are narrow map stages (chunks
    inherit the parent's partitioning); the bucket filter cuts the
    scored set to 1/{RAG_BUCKETS}; top-k is TakeOrderedAndProject.
    Embedding values are integer sums (exact both engines); only the
    final cosine divides doubles, round-6."""
    toks_df = load(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    n = F.size("toks")
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(CHUNK_STRIDE)),
        lambda s: s < n,
    )
    chunks = toks_df.select(
        "doc_id",
        F.explode(starts).alias("start"),
        "toks",
    ).select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.expr(f"slice(toks, start + 1, {CHUNK_SIZE})").alias("ctoks"),
    )
    # Two distinct re-evaluation hazards, two distinct guards:
    # - The explode-of-singleton is a deliberate projection-collapse
    #   BARRIER: downstream bucket/nrm/cosine all reference `v`, and
    #   CollapseProject would otherwise inline the full md5+fold
    #   embedding expression into each of them (higher-order functions
    #   get no common-subexpression elimination) — measured 4× the
    #   embedding cost without it. The Generate materializes v ONCE.
    # - `chl` must be LET-BOUND inside the embedding expression (the
    #   single-element-array transform idiom): projecting it as its
    #   own column does NOT survive CollapseProject, which re-inlines
    #   the md5 token-hash list into the per-dimension lambda — every
    #   chunk re-hashed its 32 tokens once per dim, 8 md5/token again
    #   despite the one-hash-per-token design above (the r16 before
    #   plan shows md5 inside the per-j lambda). Binding it as the
    #   lone element of a literal array evaluates it once per chunk
    #   regardless of collapsing: interleaved A/B 0.30× at sf0.1
    #   (2.78 s → 0.84 s, values byte-identical).
    embedded = chunks.select(
        "doc_id",
        "chunk_id",
        F.expr(
            f"element_at(transform(array({_RAG_HL_SPARK}), chl ->"
            f" {_RAG_EMB_SPARK}), 1)"
        ).alias("v0"),
    ).select("doc_id", "chunk_id", F.explode(F.array("v0")).alias("v"))
    indexed = embedded.select(
        "doc_id",
        "chunk_id",
        "v",
        F.expr(f"aggregate(v, 0L, (a, x) -> a + x) % {RAG_BUCKETS}").alias(
            "bucket"
        ),
        F.sqrt(
            F.expr("aggregate(v, 0L, (a, x) -> a + x * x)").cast("double")
        ).alias("nrm"),
    )
    qdf = spark.range(1).select(
        F.expr(
            f"filter(split('{RAG_QUERY}', ' '), x -> x != '')"
        ).alias("ctoks")
    )
    q = qdf.select(F.expr(_RAG_HL_SPARK).alias("chl")).select(
        F.expr(_RAG_EMB_SPARK).alias("qv")
    ).select(
        "qv",
        F.expr(f"aggregate(qv, 0L, (a, x) -> a + x) % {RAG_BUCKETS}").alias(
            "qbucket"
        ),
        F.sqrt(
            F.expr("aggregate(qv, 0L, (a, x) -> a + x * x)").cast("double")
        ).alias("qnrm"),
    )
    probed = (
        indexed.join(
            F.broadcast(q), F.col("bucket") == F.col("qbucket")
        )
        .filter(F.col("nrm") > 0)
        .select(
            "doc_id",
            "chunk_id",
            F.round(
                F.expr(
                    "aggregate(zip_with(v, qv, (x, y) -> x * y), 0L,"
                    " (a, x) -> a + x)"
                ).cast("double")
                / (F.col("nrm") * F.col("qnrm")),
                6,
            ).alias("cosine"),
        )
    )
    return probed.orderBy(F.desc("cosine"), "doc_id", "chunk_id").limit(
        RAG_TOP
    )


#: Paragraph width (tokens) for corpus-wide paragraph-level dedup.
PARA_W = 10


@query(
    "dedup_paragraph_exact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    paras AS (
      SELECT doc_id, r.p AS p,
             array_to_string(
               list_slice(toks, r.p * {PARA_W} + 1, (r.p + 1) * {PARA_W}),
               ' ') AS para
      FROM t,
           unnest(range(0, CAST(ceil(len(toks) / {PARA_W}.0) AS INT))) AS r(p)
    ),
    k AS (
      SELECT doc_id, p, para,
             ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, p) = 1
               AS kept
      FROM paras
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS kept_ratio_r6,
           COALESCE(string_agg(CASE WHEN kept THEN para END, ' ' ORDER BY p),
                    '') AS retained_text
    FROM k GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_dedup_paragraph_exact(spark, sf_dir: str) -> DataFrame:
    """Corpus-wide PARAGRAPH-level exact dedup (the sub-document
    granularity CCNet/Dolma-style pipelines dedup at): every document
    is split into fixed PARA_W-token paragraphs, each paragraph kept
    only at its FIRST corpus occurrence (min (doc_id, position)), and
    each document is re-assembled from its surviving paragraphs in
    order. Duplicate boilerplate that exact doc-level dedup
    (dedup_exact_hash) misses — headers/footers shared across
    otherwise-distinct pages — is excised while unique prose remains.

    Spark-first shape: paragraph construction is MAP-SIDE (a
    transform+slice over the token array, one explode — no shuffle to
    build paragraphs); the first-occurrence winner is a
    map-side-combinable min(struct(doc_id, p)) per paragraph text, NOT
    a corpus-wide rank window; reassembly is a bounded per-doc
    collect_list (≤ len(doc)/PARA_W elements) sorted in-expression.
    The oracle replays the winner rule with a rank window — same rows.

    Scale: two shuffles (paragraph-text winner agg keyed on the
    paragraph string, then per-doc regroup); the paragraph key is
    ~PARA_W words, so a hot boilerplate paragraph reduces map-side
    before it ships. At 100 TB swap the raw-string key for xxhash64
    (kept as text here so the oracle is engine-neutral)."""
    paras = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.trim("text"), " ").alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform("
                    f"  sequence(0,"
                    f"    cast(ceil(size(toks) / {PARA_W}.0) as int) - 1),"
                    f"  p -> struct(p as p,"
                    f"    array_join(slice(toks, p * {PARA_W} + 1, {PARA_W}),"
                    f"               ' ') as para))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.p").alias("p"), F.col("s.para").alias("para"))
    )
    winners = paras.groupBy("para").agg(
        F.min(F.struct("doc_id", "p")).alias("w")
    )
    kept = paras.join(winners, "para").select(
        "doc_id",
        "p",
        "para",
        (
            (F.col("doc_id") == F.col("w.doc_id")) & (F.col("p") == F.col("w.p"))
        ).alias("kept"),
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.collect_list(
                F.when(F.col("kept"), F.struct("p", "para"))
            ).alias("ks"),
        )
        .select(
            "doc_id",
            F.col("n_paras").cast("long").alias("n_paras"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.round(
                F.col("n_kept").cast("double") / F.col("n_paras"), 6
            ).alias("kept_ratio_r6"),
            F.array_join(
                F.expr("transform(array_sort(ks), x -> x.para)"), " "
            ).alias("retained_text"),
        )
        .orderBy("doc_id")
    )
