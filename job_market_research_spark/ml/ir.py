"""Information-retrieval / tokenizer-prep operators (beyond-reference).

Two corpus-level primitives every large-scale training-data pipeline
ends up needing:

- `text_bm25_topk`: Okapi BM25 ranking of the `documents` corpus for a
  fixed query-term set. This is the retrieval scorer used both for
  quality-targeted data selection (rank corpus docs against a seed
  query set, keep the head) and for building dedup/decontamination
  candidate pools. The plan is the canonical two-aggregation shape:
  per-(doc, term) TF on the term-filtered token stream, per-term DF,
  and the corpus scalars (N, avgdl) fused in as a broadcast one-row
  aggregate — one execution DAG, no separate `count()` job.
- `text_bpe_pair_counts`: the first step of byte-pair-encoding
  tokenizer training — global counts of adjacent symbol pairs. The
  scale trick (same one the original BPE implementations use): count
  UNIQUE words first, then enumerate each unique word's pairs once,
  weighted by the word's corpus frequency. Pair enumeration cost is
  O(|vocab| × word_len), not O(|corpus tokens| × word_len), and the
  final group-by key space is bounded by the symbol alphabet squared
  — a perfect partial-aggregation (map-side combine) shape at 100 TB.

Float policy: BM25 per-term scores are plain double math (`ln`,
division — deterministic on both engines, same as `text_tfidf`); the
per-document sum over query terms is made order-independent by casting
each term score to DECIMAL before summing, then rounding the final
double to 6 dp (registry policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query
from job_market_research_spark.staging import staged_frame

#: Fixed BM25 probe terms (present across the synthetic corpus at
#: moderate document frequency — exercises the df/idf spread).
BM25_TERMS: tuple[str, ...] = ("spark", "hash", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 15

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


def staged_ws_tcounts(spark, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, token, tf) whitespace token counts of
    `documents` — the IR family's shared inverted-index leg, staged
    once per (app, sf_dir). BM25, Rocchio PRF, query likelihood,
    vocab JSD and the Zipf fit all consume this identical frame; each
    previously re-ran the corpus explode + (doc, token) shuffle
    (r11 verdict item 4 generalized family-wide). Bag-of-token
    consumers only — operators needing token ADJACENCY (PMI, bigram
    LM/entropy, BPE pair counts) keep their positional streams."""

    def build() -> DataFrame:
        docs = (
            load(spark, sf_dir, "documents")
            # widen the 1-file local scan so the explode runs at full
            # parallelism (one byte-cheap shuffle of the raw rows)
            .repartition(spark.sparkContext.defaultParallelism)
            .select("doc_id", "text")
        )
        return (
            docs.select(
                "doc_id",
                F.explode(
                    F.filter(F.split("text", r"\s+"), lambda x: x != "")
                ).alias("token"),
            )
            .groupBy("doc_id", "token")
            .agg(F.count("*").alias("tf"))
        )

    return staged_frame(spark, "ws_tcounts", sf_dir, build)


def staged_ws_doclen(spark, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, dl) whitespace document lengths, derived
    FROM THE DOCUMENTS TABLE (one row per document, dl = 0 for an
    empty/whitespace-only text) — NOT as Σtf over `staged_ws_tcounts`,
    which would silently drop zero-token documents and skew
    n_docs/avgdl away from the DuckDB oracles' `dl ... FROM documents`
    CTEs the moment the corpus contains an empty doc (today's corpus
    has none, but the parity must hold by construction, not by a data
    property). Shared by every BM25-shaped scorer."""

    return staged_frame(spark, "ws_doclen", sf_dir,
        lambda: load(spark, sf_dir, "documents").select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
            .cast("long")
            .alias("dl"),
        ),
    )


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    dl AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE token IN ({_TERMS_SQL}) GROUP BY 1, 2
    ),
    df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf GROUP BY 1
    ),
    scored AS (
      SELECT tf.doc_id,
             ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / s.avgdl)) AS term_score
      FROM tf
      JOIN df USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id,
           round(CAST(SUM(CAST(term_score AS DECIMAL(28,14))) AS DOUBLE),
                 6) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_K}
    """,
    tags=("ir", "beyond"),
)
def q_text_bm25_topk(spark, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k over `documents` for the fixed probe terms.

    Plan shape (the one that survives 100 TB): scores ride the staged
    per-(doc, term) count table (`staged_ws_tcounts` — the IR family's
    shared inverted-index materialization), term-filtered before any
    join so the scoring joins carry only query-term hits; DF is a tiny
    aggregate over that filtered frame (broadcast to the join); N/avgdl
    ride a broadcast one-row aggregate crossJoin (no separate count()
    job — same fusion as `text_tfidf`). Final top-k is
    TakeOrderedAndProject, not a global sort. Per-term scores are
    summed per doc in exact DECIMAL so Spark's partial aggregation
    order cannot perturb the hash.
    """
    tcounts = staged_ws_tcounts(spark, sf_dir)
    dl = staged_ws_doclen(spark, sf_dir)
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = tcounts.filter(F.col("token").isin(*BM25_TERMS))
    # tcounts is unique per (doc_id, token): COUNT(*) == COUNT(DISTINCT doc_id)
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("term_score").cast("decimal(28,14)")).cast("double"),
                6,
            ).alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP_K)
    )


#: Keep the merge-candidate report bounded regardless of corpus size.
BPE_TOP_PAIRS = 50


@query(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH words AS (
      SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> '' GROUP BY 1
    ),
    pairs AS (
      SELECT substr(word, i, 2) AS pair, freq
      FROM words, unnest(generate_series(1, len(word) - 1)) AS g(i)
      WHERE len(word) >= 2
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT {BPE_TOP_PAIRS}
    """,
    tags=("ir", "tokenizer", "beyond"),
)
def q_text_bpe_pair_counts(spark, sf_dir: str) -> DataFrame:
    """Adjacent symbol-pair counts — the merge-candidate table of BPE
    tokenizer training (symbols = characters on the first round).

    Scale shape: aggregate the corpus to its UNIQUE word vocabulary
    first (one corpus-sized shuffle that every later BPE round
    reuses), then enumerate each unique word's adjacent pairs once,
    weighted by word frequency. The final count's key space is the
    symbol alphabet squared — bounded — so the group-by is almost
    entirely map-side combine. A 100 TB corpus with a 10M-word vocab
    does the pair work on 10M rows, not 10T tokens.
    """
    docs = load(spark, sf_dir, "documents").select("text")
    words = (
        docs.select(
            F.explode(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = words.filter(F.length("word") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(BPE_TOP_PAIRS)
    )


#: Collocation-extraction knobs: report the PMI_TOP strongest adjacent
#: bigrams seen at least PMI_MIN_COUNT times.
PMI_MIN_COUNT = 5
PMI_TOP = 30


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    uni AS (
      SELECT u.tk AS token, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok, unnest(t) AS u(tk) GROUP BY 1
    ),
    big AS (
      SELECT t[i] AS x, t[i + 1] AS y, CAST(COUNT(*) AS BIGINT) AS cxy
      FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_uni,
             (SELECT CAST(SUM(cxy) AS BIGINT) FROM big) AS n_big
      FROM uni
    )
    SELECT b.x, b.y, b.cxy,
           round(ln((CAST(b.cxy AS DOUBLE) * t.n_uni * t.n_uni)
                    / (CAST(t.n_big AS DOUBLE) * ux.c * uy.c)), 6) AS pmi
    FROM big b
    JOIN uni ux ON ux.token = b.x
    JOIN uni uy ON uy.token = b.y
    CROSS JOIN tot t
    WHERE b.cxy >= {PMI_MIN_COUNT}
    ORDER BY pmi DESC, b.x, b.y LIMIT {PMI_TOP}
    """,
    tags=("ir", "beyond"),
)
def q_text_pmi_collocations(spark, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations over ADJACENT token
    pairs — the standard multi-word-expression miner for building
    tokenizer merge lists and phrase lexicons.

    Adjacency (not within-doc all-pairs) keeps pair generation linear
    in corpus tokens; both count tables aggregate with map-side
    partials, the unigram table is vocab-sized (broadcast into the
    bigram join), and the corpus totals ride one broadcast 1-row
    aggregate. PMI = ln(c_xy·N²/(B·c_x·c_y)) computed as one double
    expression over exact integer counts — counts are cast to DOUBLE
    before multiplying so a 100 TB corpus (c·N² ≫ int64) cannot
    overflow; identical expression order on both engines.
    """
    docs = load(spark, sf_dir, "documents").select(
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("t")
    )
    uni = (
        docs.select(F.explode("t").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    big = (
        docs.select(
            F.explode(
                F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i - 1] AS x, t[i] AS y))")
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count("*").alias("cxy"))
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n_uni")).crossJoin(
        big.agg(F.sum("cxy").cast("long").alias("n_big"))
    )
    ux = uni.select(F.col("token").alias("x"), F.col("c").alias("cx"))
    uy = uni.select(F.col("token").alias("y"), F.col("c").alias("cy"))
    scored = (
        big.filter(F.col("cxy") >= PMI_MIN_COUNT)
        .join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            "cxy",
            F.round(
                F.log(
                    (F.col("cxy").cast("double") * F.col("n_uni") * F.col("n_uni"))
                    / (F.col("n_big").cast("double") * F.col("cx") * F.col("cy"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "x", "y").limit(PMI_TOP)


#: Keyword extraction: top-K terms per document, result capped to the
#: first KW_DOC_CAP doc_ids (tf/df/N still computed corpus-wide).
KW_TOP, KW_DOC_CAP = 3, 100


@query(
    "text_keywords_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
      WHERE t <> ''
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS s
      FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY s DESC, token) AS rk
      FROM scored
    )
    SELECT doc_id, CAST(rk AS INT) AS rk, token, round(s, 6) AS tfidf_r6
    FROM ranked WHERE rk <= {KW_TOP} AND doc_id < {KW_DOC_CAP}
    ORDER BY doc_id, rk
    """,
)
def q_text_keywords_topk(spark, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the TF-IDF head (top KW_TOP
    terms) of every document — the lightweight tagger a curation
    pipeline uses for topic routing and mixture bookkeeping when an
    LLM labeler is too expensive for the full corpus. Same three-agg
    DAG as `text_tfidf` (df joined back broadcast, N fused as a
    broadcast one-row agg), plus ONE doc_id-keyed window for the
    per-doc rank — scores are tf·ln(N/df) on exact integers, so the
    (score desc, token) rank order is engine-independent."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.log(F.col("__n_docs") / F.col("df"))).alias("s"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("s"), "token")
    )
    return (
        scored.withColumn("rk", rk)
        .filter((F.col("rk") <= KW_TOP) & (F.col("doc_id") < KW_DOC_CAP))
        .select(
            "doc_id",
            F.col("rk").cast("int").alias("rk"),
            "token",
            F.round("s", 6).alias("tfidf_r6"),
        )
        .orderBy("doc_id", "rk")
    )


#: BPE training rounds (merges learned).
BPE_ROUNDS = 6


def _bpe_word_vocab(spark, sf_dir: str) -> DataFrame:
    """Unique lowercase words with corpus frequency, each encoded as
    pipe-wrapped character symbols: 'hello' → '|h||e||l||l||o|'. The
    wrapping makes `replace('|a||b|' → '|ab|')` EXACTLY the greedy
    left-to-right merge fold (no shared characters between adjacent
    symbol tokens, and a replacement is never rescanned), and both
    engines' replace() share those semantics."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(
            "w",
            "freq",
            F.expr(
                "concat('|', array_join(transform(sequence(1, length(w)),"
                " i -> substring(w, i, 1)), '||'), '|')"
            ).alias("enc"),
        )
    )


_BPE_V0_SQL = """
      SELECT w, freq,
             '|' || array_to_string(list_transform(range(1, length(w) + 1),
                     i -> substr(w, i, 1)), '||') || '|' AS enc
      FROM (
        SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS freq
        FROM documents,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
        WHERE t <> '' GROUP BY 1
      )
"""


def _bpe_pair_stage_sql(src: str) -> str:
    """Pair-count + argmax CTE bodies over a vocab stage."""
    return f"""(
      SELECT pair, SUM(freq) AS cnt FROM (
        SELECT freq,
               unnest(list_transform(range(1, greatest(len(s), 1)),
                      i -> s[i] || ' ' || s[i + 1])) AS pair
        FROM (SELECT freq,
                     string_split(substr(enc, 2, length(enc) - 2), '||') AS s
              FROM {src})
      ) WHERE pair IS NOT NULL GROUP BY 1
    )"""


def _bpe_oracle(rounds: int = BPE_ROUNDS) -> str:
    parts = [f"    WITH v0 AS ({_BPE_V0_SQL})"]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
    p{t} AS {_bpe_pair_stage_sql(f"v{t - 1}")},
    m{t} AS (SELECT pair, cnt FROM p{t}
             ORDER BY cnt DESC, pair LIMIT 1),
    v{t} AS (
      SELECT w, freq,
             replace(enc,
               '|' || replace(m.pair, ' ', '||') || '|',
               '|' || replace(m.pair, ' ', '') || '|') AS enc
      FROM v{t - 1}, m{t} m
    )"""
        )
    unions = "\n      UNION ALL\n".join(
        f"      SELECT {t} AS rank, pair, cnt FROM m{t}" for t in range(1, rounds + 1)
    )
    parts.append(
        f"""
    SELECT CAST(rank AS INT) AS rank,
           string_split(pair, ' ')[1] AS merge_left,
           string_split(pair, ' ')[2] AS merge_right,
           replace(pair, ' ', '') AS merged,
           CAST(cnt AS BIGINT) AS support
    FROM (
{unions}
    ) ORDER BY rank"""
    )
    return "".join(parts)


@query("text_bpe_train_merges", oracle=_bpe_oracle())
def q_text_bpe_train_merges(spark, sf_dir: str) -> DataFrame:
    """True iterative BPE training: BPE_ROUNDS rounds of 'count all
    adjacent symbol pairs (weighted by word frequency), merge the most
    frequent everywhere, recount' — completing the tokenizer story
    `text_bpe_pair_counts` starts (that query is round 1's count; this
    learns the merge TABLE). Deterministic tie-break (count desc, pair
    asc); output = the learned merges with their support.

    Scale shape: the corpus is reduced ONCE to the unique-word vocab
    with frequencies; every round then costs one bounded vocab pass
    (pair explode → alphabet²-bounded partial-agg count) + a 1-row
    argmax collect; the merge applies as a map-side replace(). This is
    O(rounds × |vocab|) after the single corpus scan — the same
    vocab-first discipline as the pair-count query, and the driver
    holds one pair per round.

    Cross-engine exactness: counts are integers; the pipe-wrapped
    encoding makes replace() the exact greedy fold in BOTH engines
    (no shared separator chars, replacements never rescanned), so
    every round's vocab state is string-identical."""
    learned, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        learned, "rank int, merge_left string, merge_right string,"
        " merged string, support long"
    ).orderBy("rank")


#: Memoized (learned merges, encoded vocab) per (app, sf_dir, rounds):
#: the count-merge-recount loop runs rounds× (pair agg + .first() +
#: checkpoint) and THREE queries consume its result (train_merges,
#: bpe_encode, tokenizer_fertility) — one training per app suffices
#: (same-session A/B at sf0.1: bpe_encode 1.6 -> 0.2 s, fertility
#: 1.8 -> 0.5 s). The vocab frame is localCheckpoint'ed
#: (lineage-free), so sharing it across queries is as safe as a
#: staged persist. A broader staged alpha-token-count frame was
#: measured and REJECTED this round: the (doc, lang, token) staging
#: shuffle + lost scan-explode codegen fusion cost MORE than the
#: reuse saved (~+1.8 s on the 11-query family one-shot sweep) —
#: unlike the dedup/IR-whitespace/ANN chains where the shared leg is
#: deep. Staging pays only when the shared derivation is expensive
#: relative to one fused corpus pass.
_BPE_MEMO: dict[tuple, tuple] = {}


def _bpe_train(spark, sf_dir: str, rounds: int = BPE_ROUNDS):
    """Run the BPE count-merge-recount loop; returns (learned merges as
    (rank, left, right, merged, support) tuples, final encoded vocab
    DataFrame). Shared by `text_bpe_train_merges` (emits the merge
    table) and `text_bpe_encode` (emits the segmented vocab); memoized
    per app — see _BPE_MEMO."""
    import os

    app = spark.sparkContext.applicationId
    key = (app, os.path.abspath(sf_dir), rounds)
    hit = _BPE_MEMO.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _BPE_MEMO if k[0] != app]:
        del _BPE_MEMO[k]
    vocab = _bpe_word_vocab(spark, sf_dir)
    vocab = vocab.repartition(
        vocab.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint()
    learned = []
    # sequence(1, 0) is DESCENDING in Spark, so single-symbol words
    # must short-circuit to an empty pair array explicitly.
    pair_expr = (
        "if(size(syms) < 2, array(),"
        " transform(sequence(1, size(syms) - 1),"
        " i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))))"
    )
    for rank in range(1, rounds + 1):
        pairs = (
            vocab.select(
                "freq",
                F.split(
                    F.expr("substring(enc, 2, length(enc) - 2)"), "\\|\\|"
                ).alias("syms"),
            )
            .select("freq", F.explode(F.expr(pair_expr)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "pair").first()
        a, b = top["pair"].split(" ")
        learned.append((rank, a, b, a + b, int(top["cnt"])))
        vocab = vocab.withColumn(
            "enc",
            F.expr(f"replace(enc, '|{a}||{b}|', '|{a}{b}|')"),
        ).localCheckpoint()
    _BPE_MEMO[key] = (learned, vocab)
    return learned, vocab


#: Encode report size: the BPE_ENC_TOP most frequent words.
BPE_ENC_TOP = 30


def _bpe_encode_oracle(rounds: int = BPE_ROUNDS) -> str:
    """Same unrolled count-merge-recount CTE chain as `_bpe_oracle`,
    but the final select reads the ENCODED VOCAB state v{rounds}
    instead of the merge table."""
    parts = [f"    WITH v0 AS ({_BPE_V0_SQL})"]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
    p{t} AS {_bpe_pair_stage_sql(f"v{t - 1}")},
    m{t} AS (SELECT pair, cnt FROM p{t}
             ORDER BY cnt DESC, pair LIMIT 1),
    v{t} AS (
      SELECT w, freq,
             replace(enc,
               '|' || replace(m.pair, ' ', '||') || '|',
               '|' || replace(m.pair, ' ', '') || '|') AS enc
      FROM v{t - 1}, m{t} m
    )"""
        )
    parts.append(
        f"""
    SELECT w, freq,
           replace(substr(enc, 2, length(enc) - 2), '||', ' ') AS seg,
           CAST(len(string_split(substr(enc, 2, length(enc) - 2), '||'))
                AS INT) AS n_tokens
    FROM v{rounds}
    ORDER BY freq DESC, w LIMIT {BPE_ENC_TOP}"""
    )
    return "".join(parts)


@query("text_bpe_encode", oracle=_bpe_encode_oracle())
def q_text_bpe_encode(spark, sf_dir: str) -> DataFrame:
    """Tokenize with the trained BPE merges: apply the BPE_ROUNDS
    learned merges to the word vocabulary and emit each head word's
    segmentation and token count — the APPLY side of the tokenizer
    story (`text_bpe_train_merges` learns the table; this encodes with
    it). The per-word token count over the frequency-weighted vocab is
    exactly the corpus "fertility" statistic tokenizer teams track.

    Scale shape: encoding is a map-side fold — each learned merge is
    one `replace()` over the pipe-wrapped encoding, applied to the
    UNIQUE-word vocab (never the raw corpus; a 100 TB corpus encodes
    its 10M-word vocab once and joins the segmentation back by word if
    full-text tokenization is needed). The oracle replays the whole
    train+encode chain unrolled, so the output is proven
    string-identical across engines, not just count-identical."""
    _, vocab = _bpe_train(spark, sf_dir)
    inner = F.expr("substring(enc, 2, length(enc) - 2)")
    return (
        vocab.select(
            "w",
            "freq",
            F.regexp_replace(inner, r"\|\|", " ").alias("seg"),
            F.size(F.split(inner, r"\|\|")).cast("int").alias("n_tokens"),
        )
        .orderBy(F.desc("freq"), "w")
        .limit(BPE_ENC_TOP)
    )


#: Hybrid-retrieval fusion: depth of each input ranking, RRF constant
#: (the canonical k=60 from Cormack et al. 2009), report size.
RRF_DEPTH = 50
RRF_K = 60
RRF_TOP = 20

#: BM25-scored docs (doc_id, bm25 round-6) as a reusable SQL fragment —
#: the same scoring chain as `text_bm25_topk`'s oracle, unlimited.
_BM25_SCORED_SQL = f"""
    tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    dl AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE token IN ({_TERMS_SQL}) GROUP BY 1, 2
    ),
    dfx AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf GROUP BY 1
    ),
    bm25 AS (
      SELECT doc_id,
             round(CAST(SUM(CAST(
               ln(1.0 + (s.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / s.avgdl)) AS DECIMAL(28,14)))
               AS DOUBLE), 6) AS bm25
      FROM tf
      JOIN dfx USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY doc_id
    )
"""


def _bm25_scores(spark, sf_dir: str) -> DataFrame:
    """All BM25-scored docs for the fixed probe terms (doc_id, bm25
    round-6) — `text_bm25_topk` is this plus a top-k; `ir_hybrid_rrf`
    ranks it to RRF_DEPTH."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias(
            "token"
        ),
    )
    dl = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
        .cast("long")
        .alias("dl"),
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(
            F.sum(F.col("term_score").cast("decimal(28,14)")).cast("double"), 6
        ).alias("bm25")
    )


@query(
    "ir_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_SCORED_SQL},
    lex AS (
      SELECT doc_id, CAST(row_number() OVER (
               ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank
      FROM bm25 QUALIFY lex_rank <= {RRF_DEPTH}
    ),
    e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS nrm
      FROM embeddings
    ),
    q AS (
      SELECT embedding::DOUBLE[] AS qv,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS qnrm
      FROM embeddings WHERE vec_id = 0
    ),
    cos AS (
      SELECT e.vec_id AS doc_id,
             round(list_sum(list_transform(range(1, len(e.v) + 1),
                            i -> e.v[i] * q.qv[i])) / (e.nrm * q.qnrm), 6)
               AS cosine
      FROM e, q WHERE e.vec_id <> 0
    ),
    vec AS (
      SELECT doc_id, CAST(row_number() OVER (
               ORDER BY cosine DESC, doc_id) AS BIGINT) AS vec_rank
      FROM cos QUALIFY vec_rank <= {RRF_DEPTH}
    )
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           l.lex_rank, v.vec_rank,
           round(COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + v.vec_rank), 0.0), 6) AS rrf
    FROM lex l FULL OUTER JOIN vec v USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
    """,
    tags=("ir", "beyond"),
)
def q_ir_hybrid_rrf(spark, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by Reciprocal Rank Fusion
    (Cormack et al. 2009): BM25 ranking over `documents` and cosine
    ranking over the aligned `embeddings` (vec_id ≡ doc_id), each cut
    at RRF_DEPTH, fused as sum(1/(k + rank)) — the standard way a RAG /
    data-selection pipeline combines sparse and dense retrievers
    without score calibration.

    Scale shape: each leg is its own already-scale-audited plan (BM25 =
    term-filtered two-agg DAG; cosine = one scan vs a broadcast query
    vector); both global rankings cut at a CONSTANT depth, so the
    fusion join is RRF_DEPTH×RRF_DEPTH-bounded — at 100 TB the rankings
    come from per-partition top-k + merge (TakeOrdered), never a global
    sort of the corpus. Ranks are integers over round-6 scores with id
    tie-breaks (engine-stable); the fused score adds exactly two
    doubles (IEEE addition of two terms is order-exact), re-rounded to
    6.

    Each leg's rank is computed by cutting to the top RRF_DEPTH FIRST
    (`orderBy().limit()` → TakeOrderedAndProject, per-partition top-k +
    driver merge) and only then numbering the now-CONSTANT-sized frame
    with a global window — the window input is ≤ RRF_DEPTH rows by
    construction (allowlisted in tests/test_plan_hygiene.py), so no
    corpus-sized single-partition sort exists anywhere in the plan."""
    from pyspark.sql.window import Window

    lex = (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(RRF_DEPTH)
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "lex_rank")
    )
    from job_market_research_spark.ml.similarity import (
        QUERY_VEC_ID,
        _query_vector,
        as_double_vec,
        cosine,
        l2_norm,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("v")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("v")))
    qv = _query_vector(spark, sf_dir).withColumn("qnrm", l2_norm(F.col("qv")))
    cos = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qnrm")).alias(
                "cosine"
            ),
        )
    )
    vec = (
        cos.orderBy(F.desc("cosine"), "doc_id")
        .limit(RRF_DEPTH)
        .withColumn(
            "vec_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "vec_rank")
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("vec_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(RRF_TOP)


#: Bigram-LM knobs: absolute discount (0.75 = binary-exact 3/4), and
#: the scored-doc cap for the bounded report.
KN_DISCOUNT = 0.75
KN_DOC_CAP = 100


@query(
    "text_bigram_lm_kn",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)
    ),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
           FROM big GROUP BY 1, 2),
    cu AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cx,
                  CAST(COUNT(*) AS BIGINT) AS nr
           FROM cb GROUP BY 1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nl
             FROM cb GROUP BY 1),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM cb),
    scored AS (
      SELECT b.doc_id,
             -ln(((cb.c - {KN_DISCOUNT}) / cu.cx)
                 + ({KN_DISCOUNT} * cu.nr / cu.cx)
                   * (CAST(cont.nl AS DOUBLE) / tt.n_types)) AS bits
      FROM big b
      JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
      JOIN cu ON cu.w1 = b.w1
      JOIN cont ON cont.w2 = b.w2
      CROSS JOIN tt
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(CAST(bits AS DECIMAL(28,14))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_nll_r6
    FROM scored
    WHERE doc_id < {KN_DOC_CAP}
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("ir", "lm", "beyond"),
)
def q_text_bigram_lm_kn(spark, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model, trained AND
    applied as aggregations (Kneser & Ney 1995; Chen & Goodman 1998):
    P(w2|w1) = max(c(w1w2)−D,0)/c(w1) + D·N₁₊(w1·)/c(w1) ·
    N₁₊(·w2)/|bigram types| — absolute discounting with the
    continuation-count backoff that makes KN the strongest count-based
    LM. The per-doc average negative log-likelihood upgrades
    `text_lm_perplexity`'s unigram scorer: the standard
    quality/fluency gate a curation pipeline trains on its OWN corpus
    (no external model download).

    Every model table is a counting aggregation: bigram counts,
    left-context totals + right-type counts (one groupBy over the
    bigram table), continuation counts, and the type total as a
    broadcast 1-row agg. Scoring joins the model back onto the bigram
    stream BY KEY (w1, then w2) — at 100 TB these are co-partitioned
    hash joins on the same keys the model tables were built with, and
    every observed bigram has c ≥ 1 so the discounted term never goes
    negative (max() elided by construction). Per-doc NLL terms sum in
    exact DECIMAL (libm ln ulps cannot reorder the round-6 result).

    D = 0.75 is exactly representable in binary, so the discounted
    numerator (c − 0.75) is IEEE-identical on both engines."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != "").alias(
            "t"
        ),
    )
    big = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "if(size(t) < 2, array(), transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i - 1] AS w1, t[i] AS w2)))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    cb = big.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    cu = cb.groupBy("w1").agg(
        F.sum("c").alias("cx"), F.count("*").alias("nr")
    )
    cont = cb.groupBy("w2").agg(F.count("*").alias("nl"))
    tt = cb.agg(F.count("*").alias("n_types"))
    p = (
        (F.col("c") - KN_DISCOUNT) / F.col("cx")
        + (KN_DISCOUNT * F.col("nr") / F.col("cx"))
        * (F.col("nl").cast("double") / F.col("n_types"))
    )
    scored = (
        big.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .select("doc_id", (-F.log(p)).alias("bits"))
    )
    return (
        scored.filter(F.col("doc_id") < KN_DOC_CAP)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("bits").cast("decimal(28,14)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_nll_r6"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_tokenizer_fertility",
    oracle=_bpe_encode_oracle().replace(
        f"""
    SELECT w, freq,
           replace(substr(enc, 2, length(enc) - 2), '||', ' ') AS seg,
           CAST(len(string_split(substr(enc, 2, length(enc) - 2), '||'))
                AS INT) AS n_tokens
    FROM v{BPE_ROUNDS}
    ORDER BY freq DESC, w LIMIT {BPE_ENC_TOP}""",
        f""",
    seg AS (
      SELECT w,
             CAST(len(string_split(substr(enc, 2, length(enc) - 2), '||'))
                  AS BIGINT) AS n_tokens
      FROM v{BPE_ROUNDS}
    ),
    corpus_words AS (
      SELECT lang, t AS w
      FROM documents,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
      WHERE t <> ''
    )
    SELECT c.lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(SUM(s.n_tokens) AS DOUBLE) / COUNT(*), 6)
             AS fertility_r6
    FROM corpus_words c JOIN seg s USING (w)
    GROUP BY c.lang ORDER BY c.lang""",
    ),
    tags=("ir", "tokenizer", "beyond"),
)
def q_text_tokenizer_fertility(spark, sf_dir: str) -> DataFrame:
    """Corpus tokenizer fertility BY LANGUAGE — the metric tokenizer
    teams actually ship (tokens-per-word; a language with 2× fertility
    pays 2× the context budget): the trained BPE segmentation
    (`text_bpe_encode`) joined BACK onto the full token stream by
    word, exactly the join-back pattern that query's docstring
    promises for full-text tokenization. Reveals per-language
    tokenizer bias from one vocab-sized join.

    Scale shape: the segmentation table is vocab-sized and keyed by
    word; the corpus token stream joins it BY KEY (co-partitioned at
    100 TB, broadcastable when the vocab is small) and collapses
    immediately to |langs| rows with exact integer sums."""
    _, vocab = _bpe_train(spark, sf_dir)
    seg = vocab.select(
        "w",
        F.size(
            F.split(F.expr("substring(enc, 2, length(enc) - 2)"), r"\|\|")
        )
        .cast("long")
        .alias("n_tokens"),
    )
    corpus_words = (
        load(spark, sf_dir, "documents")
        .select(
            "lang",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    return (
        corpus_words.join(seg, "w")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count("*"), 6
            ).alias("fertility_r6"),
        )
        .orderBy("lang")
    )


#: Pseudo-relevance-feedback knobs: feedback depth, expansion-term
#: count, Rocchio beta for expansion weight, min expansion-term shape.
PRF_FB = 5
PRF_EXP_TERMS = 5
PRF_BETA = 0.4
PRF_TOP_K = 10


@query(
    "ir_rocchio_prf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    dl AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf1 AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE token IN ({_TERMS_SQL}) GROUP BY 1, 2
    ),
    df1 AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf1 GROUP BY 1
    ),
    pass1 AS (
      SELECT tf1.doc_id,
             round(CAST(SUM(CAST(
               ln(1.0 + (s.n_docs - df1.df + 0.5) / (df1.df + 0.5))
                 * (tf1.tf * ({BM25_K1} + 1.0))
                 / (tf1.tf + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * dl.dl / s.avgdl))
               AS DECIMAL(28,14))) AS DOUBLE), 6) AS bm25
      FROM tf1 JOIN df1 USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY tf1.doc_id
    ),
    fb AS (
      SELECT doc_id FROM pass1 ORDER BY bm25 DESC, doc_id LIMIT {PRF_FB}
    ),
    cand AS (
      SELECT token, CAST(SUM(1) AS BIGINT) AS fb_tf
      FROM tok WHERE doc_id IN (SELECT doc_id FROM fb)
        AND regexp_full_match(token, '[a-z]{{4,}}')
        AND token NOT IN ({_TERMS_SQL})
      GROUP BY token
    ),
    cand_df AS (
      SELECT tok.token, CAST(COUNT(DISTINCT tok.doc_id) AS BIGINT) AS df
      FROM tok JOIN cand USING (token) GROUP BY tok.token
    ),
    exp_terms AS (
      SELECT c.token,
             round(c.fb_tf * ln(1.0 + (s.n_docs - d.df + 0.5)
                                / (d.df + 0.5)), 6) AS w_r6
      FROM cand c JOIN cand_df d USING (token) CROSS JOIN stats s
      ORDER BY w_r6 DESC, c.token LIMIT {PRF_EXP_TERMS}
    ),
    qterms AS (
      SELECT t AS token, 1.0 AS wq
      FROM unnest([{_TERMS_SQL}]) AS u(t)
      UNION ALL
      SELECT token, {PRF_BETA} AS wq FROM exp_terms
    ),
    tf2 AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE token IN (SELECT token FROM qterms) GROUP BY 1, 2
    ),
    df2 AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf2 GROUP BY 1
    )
    SELECT tf2.doc_id,
           round(CAST(SUM(CAST(
             q.wq * ln(1.0 + (s.n_docs - df2.df + 0.5) / (df2.df + 0.5))
               * (tf2.tf * ({BM25_K1} + 1.0))
               / (tf2.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / s.avgdl))
             AS DECIMAL(28,14))) AS DOUBLE), 6) AS bm25_prf
    FROM tf2
    JOIN qterms q USING (token)
    JOIN df2 USING (token)
    JOIN dl USING (doc_id)
    CROSS JOIN stats s
    GROUP BY tf2.doc_id
    ORDER BY bm25_prf DESC, doc_id LIMIT {PRF_TOP_K}
    """,
    tags=("ir", "beyond"),
)
def q_ir_rocchio_prf(spark, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback in ONE DAG: BM25 pass 1 for
    the fixed probe terms → top-PRF_FB feedback docs → expansion-term
    selection (feedback term frequency × corpus idf, alpha-only
    tokens ≥ 4 chars, original terms excluded, top-PRF_EXP_TERMS by
    round-6 weight) → BM25 pass 2 over the expanded query with
    original terms at weight 1 and expansion terms at Rocchio
    beta = PRF_BETA → final top-k. The classic recall lever when the
    literal query under-describes the information need (Rocchio 1971;
    the RM3-style tf×idf selection).

    Scale shape: all four token-stream consumers (pass-1 tf, expansion
    candidates, candidate df, pass-2 tf) plus doc length ride the
    STAGED per-(doc, token) count table (`staged_ws_tcounts` /
    `staged_ws_doclen` — the IR family's shared inverted-index
    materialization, persisted once per app): one explode + one
    map-side-combined shuffle for the whole family, where the round-6
    plan re-derived the explode per branch (4 corpus tokenizations per
    run; r11 verdict item 4). The feedback-doc semi-join and the
    expansion/query term tables are bounded (PRF_FB docs' vocab, then
    ≤ 8 terms) and broadcast; every top-k is TakeOrderedAndProject.
    Per-doc sums ride exact DECIMAL like text_bm25_topk. At 100 TB the
    stage becomes a written-out term-count table — the classic
    inverted-index materialization — still one corpus pass."""
    tcounts = staged_ws_tcounts(spark, sf_dir)
    dl = staged_ws_doclen(spark, sf_dir)
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    def bm25_score(tf_col, df_col, dl_col):
        return (
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - df_col + 0.5) / (df_col + 0.5)
            )
            * (tf_col * (BM25_K1 + 1.0))
            / (
                tf_col
                + BM25_K1 * (1.0 - BM25_B + BM25_B * dl_col / F.col("avgdl"))
            )
        )

    tf1 = tcounts.filter(F.col("token").isin(*BM25_TERMS))
    # tcounts is unique per (doc_id, token): COUNT(*) == COUNT(DISTINCT doc_id)
    df1 = tf1.groupBy("token").agg(F.count("*").alias("df"))
    pass1 = (
        tf1.join(F.broadcast(df1), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            bm25_score(F.col("tf"), F.col("df"), F.col("dl")).alias("ts"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("ts").cast("decimal(28,14)")).cast("double"), 6
            ).alias("bm25")
        )
    )
    fb = pass1.orderBy(F.desc("bm25"), "doc_id").limit(PRF_FB).select("doc_id")
    # ONE aggregation over the eligible token rows computes BOTH the
    # feedback term frequency (tf summed over feedback docs only — a
    # broadcast left join marks membership) and the corpus document
    # frequency (tcounts is unique per (doc, token), so COUNT(*) = df);
    # the former two-pass shape (cand agg + df semi-join re-pass) ran
    # the corpus leg twice (r11 verdict item 4).
    cand = (
        tcounts.filter(
            F.col("token").rlike("^[a-z]{4,}$")
            & ~F.col("token").isin(*BM25_TERMS)
        )
        .join(
            F.broadcast(fb.select("doc_id", F.lit(True).alias("_fb"))),
            "doc_id",
            "left",
        )
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("_fb"), F.col("tf")).otherwise(0))
            .cast("long")
            .alias("fb_tf"),
            F.count("*").cast("long").alias("df"),
        )
        .filter(F.col("fb_tf") > 0)
    )
    exp_terms = (
        cand.crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.round(
                F.col("fb_tf")
                * F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ).alias("w_r6"),
            "df",
        )
        .orderBy(F.desc("w_r6"), "token")
        .limit(PRF_EXP_TERMS)
    )
    # qterms carries each token's corpus df THROUGH from the stats the
    # chain already computed — df1 for the original terms (tcounts is
    # unique per (doc, token), so its COUNT(*) equals pass-2's
    # COUNT(DISTINCT doc_id) for those tokens) and cand.df for the
    # expansion terms (same rows pass 2 sees: the semi-join never
    # changes a token's document set). The former separate `df2`
    # re-aggregation of the corpus leg was one more DEPENDENT bounded
    # job in the warm chain (r12 verdict item 5: ~8 sequential
    # barriers on 116k cached rows is local-mode latency, and at 100 TB
    # it is a whole extra corpus-leg shuffle) — deriving df from the
    # already-broadcast stats removes the job AND the shuffle.
    qterms = (
        spark.createDataFrame(
            [(t,) for t in BM25_TERMS], "token string"
        )
        .select("token", F.lit(1.0).alias("wq"))
        .join(F.broadcast(df1), "token", "left")
        .unionByName(
            exp_terms.select("token", F.lit(PRF_BETA).alias("wq"), "df")
        )
    )
    # ONE broadcast of qterms does both pass-2 jobs at once: the inner
    # join IS the semi-filter (qterms tokens are unique by construction)
    # and attaches wq/df to the surviving rows. The former separate
    # `left_semi` on a narrower projection built a SECOND broadcast
    # exchange over the same feedback/candidate chain — different
    # projection, so ReuseExchange could not dedupe it and the whole
    # pass-1 + candidate aggregation executed twice per run (measured
    # ~0.84 s/rebuild warm at sf0.1, the bulk of the r12 verdict's
    # "8 dependent bounded jobs" residual).
    return (
        tcounts.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("wq") * bm25_score(F.col("tf"), F.col("df"), F.col("dl"))
            ).alias("ts"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("ts").cast("decimal(28,14)")).cast("double"), 6
            ).alias("bm25_prf")
        )
        .orderBy(F.desc("bm25_prf"), "doc_id")
        .limit(PRF_TOP_K)
    )


#: Dirichlet smoothing pseudo-count for the query-likelihood scorer
#: (small relative to the classic 2000: the synthetic docs are ~50
#: tokens, and mu should sit near the average doc length).
QL_MU = 100
QL_TOP_K = 15


@query(
    "ir_query_likelihood",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, u.t AS token
      FROM documents,
           unnest(string_split_regex(text, '\\s+')) AS u(t)
      WHERE u.t <> ''
    ),
    dl AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS dl
      FROM documents
    ),
    c AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ctot FROM tok),
    cf AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cf
      FROM tok WHERE token IN ('spark', 'hash', 'stream')
      GROUP BY token
    ),
    constq AS (
      SELECT CAST(SUM(CAST(round(ln(CAST(cf AS DOUBLE) / ctot), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS cq
      FROM cf CROSS JOIN c
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE token IN ('spark', 'hash', 'stream')
      GROUP BY doc_id, token
    ),
    hits AS (
      SELECT tf.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
             CAST(SUM(CAST(round(ln(1 + tf
                        / ({QL_MU} * (CAST(cf.cf AS DOUBLE) / c.ctot))), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS hsum
      FROM tf JOIN cf USING (token) CROSS JOIN c
      GROUP BY tf.doc_id
    )
    SELECT dl.doc_id,
           CAST(COALESCE(h.n_hit_terms, 0) AS BIGINT) AS n_hit_terms,
           round(cq + 3 * ln({QL_MU} / (dl.dl + {QL_MU}))
                 + COALESCE(h.hsum, 0.0), 6) AS ql_score_r6
    FROM dl
    LEFT JOIN hits h ON h.doc_id = dl.doc_id
    CROSS JOIN constq
    ORDER BY ql_score_r6 DESC, dl.doc_id LIMIT {QL_TOP_K}
    """,
)
def q_ir_query_likelihood(spark, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001) — the language-model ranking that complements BM25:
    score(q,d) = Σ_t ln((tf + μ·p(t|C)) / (dl + μ)). Computed via the
    SPARSE decomposition that makes LM retrieval feasible at corpus
    scale: score = Σ_t ln p(t|C) + |q|·ln(μ/(dl+μ)) + Σ_{{t:tf>0}}
    ln(1 + tf/(μ·p(t|C))) — the first term is a per-corpus scalar,
    the second needs only the map-side doc length, and only the THIRD
    touches (doc, term) rows, which are term-filtered before the
    shuffle exactly like text_bm25_topk. A doc with zero query terms
    still ranks (smoothing's whole point), with no dense doc×term
    join anywhere.

    Float policy: per-term ln scores round-6 then DECIMAL-sum (the
    BM25/MI contract — order-free across partial aggregation); the
    final score is one fixed-shape double expression round-6.

    Scale: one term-filtered (doc, term) shuffle + broadcast scalars;
    top-k is TakeOrdered. Kept INLINE (not on staged_ws_tcounts): the
    r12 sweep measured the cached-read path 2× slower for this
    shallow-reuse shape — one fused scan beats one cache pass when the
    frame is consumed once."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tok = docs.select("doc_id", F.explode(toks_arr).alias("token"))
    dl = docs.select("doc_id", F.size(toks_arr).cast("long").alias("dl"))
    c = tok.agg(F.count("*").cast("double").alias("ctot"))
    qf = tok.filter(F.col("token").isin("spark", "hash", "stream"))
    cf = qf.groupBy("token").agg(F.count("*").cast("long").alias("cf"))
    constq = (
        cf.crossJoin(F.broadcast(c))
        .agg(
            F.sum(
                F.round(F.log(F.col("cf").cast("double") / F.col("ctot")), 6)
                .cast("decimal(18,6)")
            )
            .cast("double")
            .alias("cq")
        )
    )
    tf = qf.groupBy("doc_id", "token").agg(F.count("*").cast("long").alias("tf"))
    hits = (
        tf.join(F.broadcast(cf), "token")
        .crossJoin(F.broadcast(c))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hit_terms"),
            F.sum(
                F.round(
                    F.log(
                        1
                        + F.col("tf")
                        / (QL_MU * (F.col("cf").cast("double") / F.col("ctot")))
                    ),
                    6,
                ).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("hsum"),
        )
    )
    return (
        dl.join(hits, "doc_id", "left")
        .crossJoin(F.broadcast(constq))
        .select(
            "doc_id",
            F.coalesce("n_hit_terms", F.lit(0)).cast("long").alias(
                "n_hit_terms"
            ),
            F.round(
                F.col("cq")
                + 3 * F.log(QL_MU / (F.col("dl") + F.lit(QL_MU)).cast("double"))
                + F.coalesce("hsum", F.lit(0.0)),
                6,
            ).alias("ql_score_r6"),
        )
        .orderBy(F.desc("ql_score_r6"), "doc_id")
        .limit(QL_TOP_K)
    )


#: Vocabulary-drift monitor: top-V term budget and the OOV bucket tag.
JSD_VOCAB = 200
_JSD_OOV = "<oov>"


@query(
    "text_vocab_jsd",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % 2 AS g, u.t AS token
      FROM documents,
           unnest(string_split_regex(text, '\\s+')) AS u(t)
      WHERE u.t <> ''
    ),
    topv AS (
      SELECT token FROM tok GROUP BY token
      ORDER BY COUNT(*) DESC, token LIMIT {JSD_VOCAB}
    ),
    mapped AS (
      SELECT g,
             CASE WHEN token IN (SELECT token FROM topv)
                  THEN token ELSE '{_JSD_OOV}' END AS term
      FROM tok
    ),
    c AS (
      SELECT term,
             CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM mapped GROUP BY term
    ),
    tot AS (
      SELECT CAST(SUM(c0) AS BIGINT) AS t0, CAST(SUM(c1) AS BIGINT) AS t1
      FROM c
    ),
    terms AS (
      SELECT CAST(round(
               0.5 * (CASE WHEN c0 > 0 THEN (CAST(c0 AS DOUBLE) / t0)
                 * ln((CAST(c0 AS DOUBLE) / t0)
                      / ((CAST(c0 AS DOUBLE) / t0
                          + CAST(c1 AS DOUBLE) / t1) / 2)) ELSE 0 END)
             + 0.5 * (CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / t1)
                 * ln((CAST(c1 AS DOUBLE) / t1)
                      / ((CAST(c0 AS DOUBLE) / t0
                          + CAST(c1 AS DOUBLE) / t1) / 2)) ELSE 0 END),
               9) AS DECIMAL(28,9)) AS t
      FROM c CROSS JOIN tot
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_terms,
           tot.t0 AS tokens_even, tot.t1 AS tokens_odd,
           round(CAST((SELECT SUM(t) FROM terms) AS DOUBLE), 6) AS jsd_nats_r6
    FROM tot
    """,
    tags=("text", "drift", "beyond"),
)
def q_text_vocab_jsd(spark, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the term distributions of the
    two hash-split corpus halves — the vocabulary-drift monitor a
    training pipeline runs between crawl snapshots (JSD is symmetric
    and bounded by ln 2, so a fixed alert threshold is meaningful,
    unlike KL which blows up on any new term). The distribution is
    the global top-{JSD_VOCAB} terms plus one OOV bucket, so the
    statistic's support — and the final reduce — is bounded by
    config, not by vocabulary size.

    Per-term contributions ½p·ln(p/m) + ½q·ln(q/m) (m the mixture)
    are fixed-shape doubles over exact integer count ratios, rounded
    9 then DECIMAL-summed over the ≤ V+1 bounded term table; a term
    absent from one half contributes only its present side (the 0·ln0
    limit), handled by an explicit guard on both engines.

    Scale: one (token) aggregation for the top-V cut
    (TakeOrdered, broadcast back), one (term, half) combinable count,
    constant-size algebra after.

    r14: rides the family's staged (doc_id, token, tf) table —
    occurrence counts become tf sums, identical tokenization — and
    the bounded (term, c0, c1) table is staged too: its four
    consumers (totals, contributions, the sum, the term count) each
    re-derived the whole corpus lineage otherwise (census 8→1
    scans)."""

    def build_counts() -> DataFrame:
        tok = staged_ws_tcounts(spark, sf_dir).select(
            (F.col("doc_id") % 2).alias("g"), "token", "tf"
        )
        topv = (
            tok.groupBy("token")
            .agg(F.sum("tf").alias("n"))
            .orderBy(F.desc("n"), "token")
            .limit(JSD_VOCAB)
            .select("token", F.lit(1).alias("in_v"))
        )
        return (
            tok.join(F.broadcast(topv), "token", "left")
            .select(
                "g",
                "tf",
                F.when(F.col("in_v").isNotNull(), F.col("token"))
                .otherwise(F.lit(_JSD_OOV))
                .alias("term"),
            )
            .groupBy("term")
            .agg(
                F.sum(F.when(F.col("g") == 0, F.col("tf")).otherwise(0))
                .cast("long")
                .alias("c0"),
                F.sum(F.when(F.col("g") == 1, F.col("tf")).otherwise(0))
                .cast("long")
                .alias("c1"),
            )
        )

    c = staged_frame(spark, "jsd_term_counts", sf_dir, build_counts)
    tot = c.agg(
        F.sum("c0").cast("long").alias("t0"),
        F.sum("c1").cast("long").alias("t1"),
    )
    p = F.col("c0").cast("double") / F.col("t0")
    q = F.col("c1").cast("double") / F.col("t1")
    m = (p + q) / 2
    contrib = 0.5 * F.when(F.col("c0") > 0, p * F.log(p / m)).otherwise(
        0.0
    ) + 0.5 * F.when(F.col("c1") > 0, q * F.log(q / m)).otherwise(0.0)
    terms = c.crossJoin(F.broadcast(tot)).select(
        F.round(contrib, 9).cast("decimal(28,9)").alias("t")
    )
    s = terms.agg(F.sum("t").cast("double").alias("sj"))
    nt = c.agg(F.count("*").cast("long").alias("n_terms"))
    return (
        nt.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(s))
        .select(
            "n_terms",
            F.col("t0").alias("tokens_even"),
            F.col("t1").alias("tokens_odd"),
            F.round(F.col("sj"), 6).alias("jsd_nats_r6"),
        )
    )


#: Zipf-fit vocabulary head size (top-K tokens by frequency).
ZIPF_K = 100


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT u.t AS token
      FROM documents,
           unnest(string_split_regex(text, '\\s+')) AS u(t)
      WHERE u.t <> ''
    ),
    cnt AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ),
    top AS (
      SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT {ZIPF_K}
    ),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS r FROM top
    ),
    terms AS (
      SELECT CAST(round(ln(r), 9) AS DECIMAL(28,9)) AS x,
             CAST(round(ln(c), 9) AS DECIMAL(28,9)) AS y,
             CAST(round(ln(r) * ln(r), 9) AS DECIMAL(28,9)) AS xx,
             CAST(round(ln(r) * ln(c), 9) AS DECIMAL(28,9)) AS xy,
             CAST(round(ln(c) * ln(c), 9) AS DECIMAL(28,9)) AS yy
      FROM ranked
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xx) AS DOUBLE) AS sxx,
             CAST(SUM(xy) AS DOUBLE) AS sxy,
             CAST(SUM(yy) AS DOUBLE) AS syy
      FROM terms
    )
    SELECT k AS k_terms,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope_r6,
           round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k,
                 6) AS intercept_r6,
           round((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6) AS r2_r6
    FROM m
    """,
    tags=("text", "curation", "beyond"),
)
def q_text_zipf_fit(spark, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus frequency head: OLS slope of
    ln(frequency) on ln(rank) over the top-100 (ZIPF_K) tokens, with
    intercept and R². Natural language sits near slope −1 with high
    R²; a corpus whose head deviates hard (slope ≫ −1 = suspiciously
    flat, low R² = non-linguistic token soup — logs, tables, boiler-
    plate) fails the cheapest distributional sanity check there is,
    which is why Zipf diagnostics sit next to perplexity in curation
    stacks (and complement text_vocab_jsd's drift view of the same
    head).

    Exactness (the text_vocab_jsd recipe): each of the K per-rank
    ln-moments is a fixed-shape double over exact integers, rounded 9
    and DECIMAL-summed — order-independent — then the closed-form
    slope/intercept/R² algebra runs on identical doubles in both
    engines and is rounded to 6.

    Scale: ONE combinable (token) count aggregation, a TakeOrdered
    top-ZIPF_K cut (per-partition top-k + driver merge, never a
    global vocab sort), then a rank window over the now-CONSTANT
    ZIPF_K-row frame (plan-hygiene allowlisted) and a 1-row reduce."""
    from pyspark.sql.window import Window

    tok = load(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("token")
    )
    cnt = tok.groupBy("token").agg(F.count("*").cast("long").alias("c"))
    top = cnt.orderBy(F.desc("c"), "token").limit(ZIPF_K)
    ranked = top.withColumn(
        "r",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), "token"))
        .cast("long"),
    )
    lx = F.log(F.col("r").cast("double"))
    ly = F.log(F.col("c").cast("double"))

    def d9(col):
        return F.round(col, 9).cast("decimal(28,9)")

    terms = ranked.select(
        d9(lx).alias("x"),
        d9(ly).alias("y"),
        d9(lx * lx).alias("xx"),
        d9(lx * ly).alias("xy"),
        d9(ly * ly).alias("yy"),
    )
    m = terms.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("yy").cast("double").alias("syy"),
    )
    k = F.col("k").cast("double")
    cov = k * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = k * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = k * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return m.select(
        F.col("k").alias("k_terms"),
        F.round(slope, 6).alias("slope_r6"),
        F.round((F.col("sy") - slope * F.col("sx")) / k, 6).alias(
            "intercept_r6"
        ),
        F.round(cov * cov / (varx * vary), 6).alias("r2_r6"),
    )


@query(
    "text_bigram_entropy_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT lang, u.g[1] AS w1, u.g[2] AS w2
      FROM toks,
           unnest(list_transform(range(1, greatest(len(t), 1)),
                                 i -> [t[i], t[i + 1]])) AS u(g)
      WHERE len(t) >= 2 AND u.g[1] <> '' AND u.g[2] <> ''
    ),
    pair AS (
      SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2, 3
    ),
    ctx AS (
      SELECT lang, w1, CAST(SUM(c) AS BIGINT) AS cw
      FROM pair GROUP BY 1, 2
    ),
    tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n
      FROM pair GROUP BY 1
    ),
    terms AS (
      SELECT p.lang,
             CAST(round(-(CAST(p.c AS DOUBLE) / t.n)
                        * ln(CAST(p.c AS DOUBLE) / x.cw), 9)
                  AS DECIMAL(28,9)) AS h
      FROM pair p
      JOIN ctx x ON x.lang = p.lang AND x.w1 = p.w1
      JOIN tot t ON t.lang = p.lang
    )
    SELECT terms.lang,
           (SELECT n FROM tot WHERE tot.lang = terms.lang) AS n_bigrams,
           round(CAST(SUM(h) AS DOUBLE), 6) AS cond_entropy_nats_r6
    FROM terms GROUP BY terms.lang ORDER BY lang
    """,
    tags=("text", "infotheory", "beyond"),
)
def q_text_bigram_entropy_rate(spark, sf_dir: str) -> DataFrame:
    """Conditional bigram entropy H(next | prev) per language — the
    information-rate signal that separates natural prose (≈ 5–9 nats)
    from boilerplate and keyword-stuffed spam (≪ 1: the next token is
    nearly determined by the previous one). The number quality
    filters reach for when repetition RATIOS (text_repetition_signals)
    are fooled by long-period templates: H = −Σ_{w1,w2} p(w1,w2) ·
    ln p(w2|w1), estimated from corpus bigram counts.

    Exactness: every probability is a ratio of exact integer counts;
    per-bigram terms are fixed-shape doubles rounded 9 then
    DECIMAL-summed per language (order-free across the partial
    aggregation), one closing round-6.

    Scale: bigrams enumerate map-side from each doc's token array
    (no pre-explode self-join); ONE corpus-sized shuffle on
    (lang, w1, w2) with map-side combine; the context and total
    tables derive from that aggregate, not the corpus. The final
    reduce is |langs| rows."""
    toks_arr = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    docs = load(spark, sf_dir, "documents").select(
        "lang", toks_arr.alias("t")
    ).filter(F.size("t") >= 2)
    bg = docs.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] as w1, t[i] as w2))")
        ).alias("g"),
    ).select("lang", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    pair = bg.groupBy("lang", "w1", "w2").agg(
        F.count("*").cast("long").alias("c")
    )
    ctx = pair.groupBy("lang", "w1").agg(F.sum("c").cast("long").alias("cw"))
    tot = pair.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    terms = (
        pair.join(ctx, ["lang", "w1"])
        .join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "n",
            F.round(
                -(F.col("c").cast("double") / F.col("n"))
                * F.log(F.col("c").cast("double") / F.col("cw")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("h"),
        )
    )
    return (
        terms.groupBy("lang", "n")
        .agg(F.round(F.sum("h").cast("double"), 6).alias("cond_entropy_nats_r6"))
        .select("lang", F.col("n").alias("n_bigrams"), "cond_entropy_nats_r6")
        .orderBy("lang")
    )


@query(
    "agg_good_turing_unseen",
    oracle="""
    WITH tok AS (
      SELECT lang, u.t AS token
      FROM documents,
           unnest(string_split_regex(text, '\\s+')) AS u(t)
      WHERE u.t <> ''
    ),
    tc AS (
      SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    m AS (
      SELECT lang,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_doubletons
      FROM tc GROUP BY lang
    )
    SELECT lang, n_tokens, n_types, n_singletons,
           round(CAST(n_singletons AS DOUBLE) / n_tokens, 6)
             AS p_unseen_gt_r6,
           round(CASE WHEN n_doubletons > 0 THEN
                 n_types + (CAST(n_singletons AS DOUBLE) * n_singletons)
                           / (2.0 * n_doubletons)
                 ELSE n_types + CAST(n_singletons AS DOUBLE)
                                * (n_singletons - 1) / 2.0 END, 6)
             AS chao1_richness_r6
    FROM m ORDER BY lang
    """,
    tags=("text", "species", "beyond"),
)
def q_agg_good_turing_unseen(spark, sf_dir: str) -> DataFrame:
    """Good–Turing unseen-mass and Chao1 vocabulary richness per
    language — the two species-estimation numbers a tokenizer/corpus
    plan needs: P(next token is a NEW type) ≈ N₁/N (the Good–Turing
    leave-one-out identity, singletons over tokens), and the Chao1
    lower bound on TOTAL vocabulary size S ≈ S_obs + N₁²/(2N₂)
    (bias-corrected form when doubletons vanish). Together they answer
    'how much more vocabulary is out there if we crawl more of this
    language' — the text twin of agg_capture_recapture.

    Exact integer counts from a single (lang, token) aggregation;
    both estimates are fixed-shape double closed forms rounded 6.

    Scale: ONE corpus-sized shuffle on (lang, token) with map-side
    combine, then |langs| moment rows. No top-k cut — the frequency-
    of-frequency reduction is already bounded."""
    tok = load(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("token"),
    )
    tc = tok.groupBy("lang", "token").agg(F.count("*").cast("long").alias("c"))
    m = tc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_singletons"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_doubletons"),
    )
    n1 = F.col("n_singletons").cast("double")
    chao1 = F.when(
        F.col("n_doubletons") > 0,
        F.col("n_types") + n1 * n1 / (2.0 * F.col("n_doubletons")),
    ).otherwise(F.col("n_types") + n1 * (F.col("n_singletons") - 1) / 2.0)
    return m.select(
        "lang",
        "n_tokens",
        "n_types",
        "n_singletons",
        F.round(n1 / F.col("n_tokens"), 6).alias("p_unseen_gt_r6"),
        F.round(chao1, 6).alias("chao1_richness_r6"),
    ).orderBy("lang")


#: BM25F-lite: first TITLE_LEN tokens form the "title" field, which
#: counts W_TITLE times in the weighted term frequency.
BM25F_TITLE_LEN = 5
BM25F_W_TITLE = 3
BM25F_TOP_K = 15


@query(
    "ir_bm25f_fielded",
    oracle=f"""
    WITH arr AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
               AS t
      FROM documents
    ),
    tok AS (
      SELECT doc_id, t[g.i] AS token,
             CASE WHEN g.i <= {BM25F_TITLE_LEN} THEN {BM25F_W_TITLE}
                  ELSE 1 END AS w
      FROM arr, unnest(generate_series(1, len(t))) AS g(i)
    ),
    dl AS (
      SELECT doc_id, CAST(SUM(w) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, CAST(SUM(w) AS BIGINT) AS tf
      FROM tok WHERE token IN ({_TERMS_SQL}) GROUP BY 1, 2
    ),
    df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf GROUP BY 1
    ),
    scored AS (
      SELECT tf.doc_id,
             ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / s.avgdl)) AS term_score
      FROM tf
      JOIN df USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id,
           round(CAST(SUM(CAST(term_score AS DECIMAL(28,14))) AS DOUBLE),
                 6) AS bm25f
    FROM scored GROUP BY doc_id
    ORDER BY bm25f DESC, doc_id LIMIT {BM25F_TOP_K}
    """,
    tags=("ir", "beyond"),
)
def q_ir_bm25f_fielded(spark, sf_dir: str) -> DataFrame:
    """BM25F-lite field-boosted ranking: the first {BM25F_TITLE_LEN}
    tokens act as the TITLE field and count {BM25F_W_TITLE}× in the
    weighted term frequency (and in the weighted document length —
    the BM25F convention that keeps the saturation curve shared), so
    a query term in the headline outranks the same term buried in the
    body — the field weighting every real search deployment applies
    that flat BM25 (text_bm25_topk) cannot express.

    Same exactness contract as BM25: per-term scores are plain
    deterministic double math, per-doc sums are DECIMAL (order-free),
    round-6; positions come from ONE posexplode (no second
    tokenization to find the title).

    Scale: identical plan shape to text_bm25_topk — term-filtered
    weighted-TF shuffle, broadcast DF and corpus scalars, TakeOrdered
    top-k."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("pos", "token"),
    ).select(
        "doc_id",
        "token",
        F.when(F.col("pos") < BM25F_TITLE_LEN, BM25F_W_TITLE)
        .otherwise(1)
        .alias("w"),
    )
    dl = tok.groupBy("doc_id").agg(F.sum("w").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.sum("w").cast("long").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("term_score").cast("decimal(28,14)")).cast("double"),
                6,
            ).alias("bm25f")
        )
        .orderBy(F.desc("bm25f"), "doc_id")
        .limit(BM25F_TOP_K)
    )
