"""Scalar string / conditional / JSON functions (SURVEY §2.8).

Native-expression re-implementations of the reference's scattered
Python string munging: regex segmentation of raw posting text
(bayt.py:79-113, MarocAnn.py:66-129), JSON payload extraction from LLM
output (pipline.py:50-79, init_groq.py:122-162), keyword rule
classification (init_groq.py:164-228), filename-derived source
attribution (backup.py:30-33) and unique output naming
(transform_job.py:241-249).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.operators.cleaning import lower_norm, split_csv, trim_cast
from job_market_research_spark.registry import query


def classify_by_keywords(col: str | Column, rules: list[tuple[str, str]], default: str) -> Column:
    """CASE-WHEN keyword classifier — the reference's deterministic
    fallback for LLM enrichment (init_groq.py:164-228). `rules` is an
    ordered [(substring, label)] list; first hit wins."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for kw, label in rules:
        cond = c.contains(kw)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default) if expr is not None else F.lit(default)


@query(
    "fn_split_csv",
    oracle="""
    SELECT p_partkey,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
           string_split(p_name, ' ')[1] AS first_token
    FROM part ORDER BY p_partkey
    """,
)
def q_fn_split_csv(spark, sf_dir: str) -> DataFrame:
    """Separator-split into arrays (reference: transform_job.py:205-217
    splits secteur/hard_skills/soft_skills on ',\\s*')."""
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.size(split_csv("p_name", " ")).cast("long").alias("n_tokens"),
            F.element_at(split_csv("p_name", " "), 1).alias("first_token"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_trim_cast",
    oracle="""
    SELECT p_partkey, TRIM(CAST(p_size AS VARCHAR)) AS size_str,
           TRIM('  ' || p_type || ' ') AS type_norm
    FROM part ORDER BY p_partkey
    """,
)
def q_fn_trim_cast(spark, sf_dir: str) -> DataFrame:
    """trim(cast(...)) normalization (reference: transform_job.py:218-220)."""
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            trim_cast("p_size").alias("size_str"),
            F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_norm"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_lower_norm",
    oracle="""
    SELECT DISTINCT LOWER(TRIM(c_mktsegment)) AS segment_key
    FROM customer ORDER BY segment_key
    """,
)
def q_fn_lower_norm(spark, sf_dir: str) -> DataFrame:
    """Natural-key normalization before dimension matching."""
    return (
        load(spark, sf_dir, "customer")
        .select(lower_norm("c_mktsegment").alias("segment_key"))
        .distinct()
        .orderBy("segment_key")
    )


@query(
    "fn_length",
    oracle="""
    SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS text_len, n_chars
    FROM documents ORDER BY doc_id
    """,
)
def q_fn_length(spark, sf_dir: str) -> DataFrame:
    """LENGTH-derived metrics (reference: join1.yaml derived
    description_length/competences_length columns)."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").cast("long").alias("text_len"), "n_chars")
        .orderBy("doc_id")
    )


@query(
    "fn_case_when",
    oracle="""
    SELECT CASE WHEN p_name LIKE '%widget%' THEN 'hardware'
                WHEN p_name LIKE '%bolt%'   THEN 'fastener'
                WHEN p_name LIKE '%ring%'   THEN 'jewelry'
                ELSE 'other' END AS category,
           COUNT(*) AS n
    FROM part GROUP BY 1 ORDER BY 1
    """,
)
def q_fn_case_when(spark, sf_dir: str) -> DataFrame:
    """Ordered keyword rule classification (the LLM fallback rules)."""
    rules = [("widget", "hardware"), ("bolt", "fastener"), ("ring", "jewelry")]
    return (
        load(spark, sf_dir, "part")
        .select(classify_by_keywords("p_name", rules, "other").alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("n"))
        .orderBy("category")
    )


@query(
    "fn_concat_text",
    oracle="""
    SELECT c_custkey, concat_ws(' | ', c_name, c_mktsegment) AS blob
    FROM customer ORDER BY c_custkey
    """,
)
def q_fn_concat_text(spark, sf_dir: str) -> DataFrame:
    """Text concatenation for downstream NER input (reference:
    skillner_logic.py:47 description+competences concat)."""
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", F.concat_ws(" | ", "c_name", "c_mktsegment").alias("blob"))
        .orderBy("c_custkey")
    )


@query(
    "fn_regex_segment",
    oracle="""
    SELECT doc_id,
           COALESCE(NULLIF(regexp_extract(text, '(join|scan|merge)', 1), ''), 'none')
             AS first_op,
           COALESCE(NULLIF(regexp_extract(text, '([a-z]+) (fast|slow)', 2), ''), 'none')
             AS speed_word
    FROM documents ORDER BY doc_id
    """,
)
def q_fn_regex_segment(spark, sf_dir: str) -> DataFrame:
    """Regex text segmentation (reference: bayt.py:79-113 splits raw
    postings into description/competences blocks by header patterns)."""
    none_if_empty = lambda c: F.coalesce(F.nullif(c, F.lit("")), F.lit("none"))  # noqa: E731
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            none_if_empty(F.regexp_extract("text", r"(join|scan|merge)", 1)).alias(
                "first_op"
            ),
            none_if_empty(F.regexp_extract("text", r"([a-z]+) (fast|slow)", 2)).alias(
                "speed_word"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events ORDER BY event_id
    """,
)
def q_fn_json_extract(spark, sf_dir: str) -> DataFrame:
    """JSON payload extraction (reference: init_groq.py:122-162 pulls
    the JSON object out of LLM text). `get_json_object` evaluates
    JVM-side; for full-record parsing use `from_json` with a schema."""
    return (
        load(spark, sf_dir, "events")
        .select("event_id", F.get_json_object("props", "$.k").try_cast("long").alias("k"))
        .orderBy("event_id")
    )


@query(
    "fn_uuid_name",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(*) AS n_wellformed, COUNT(*) AS n_unique
    FROM part
    """,
)
def q_fn_uuid_name(spark, sf_dir: str) -> DataFrame:
    """Unique run naming via uuid (reference: transform_job.py:241-249
    `processed_jobs_<date>_<uuid8>.json`). The uuid values are
    nondeterministic, so the oracle checks the *invariants*: every row
    gets a well-formed id and ids never collide."""
    df = load(spark, sf_dir, "part").withColumn("run_id", F.expr("uuid()"))
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(
                F.col("run_id").rlike(
                    r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
                ),
                1,
            ).otherwise(0)
        ).alias("n_wellformed"),
        F.countDistinct("run_id").alias("n_unique"),
    )


@query("fn_source_from_filename", oracle="SELECT 'lineitem' AS source_name")
def q_fn_source_from_filename(spark, sf_dir: str) -> DataFrame:
    """Derive the source label from the input filename (reference:
    backup.py:30-33 — `offres_emploi_(.+)\\.json` → via). Uses
    `input_file_name()` over the scan, so it distributes."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            F.regexp_extract(F.input_file_name(), r"([a-z]+)\.parquet", 1).alias(
                "source_name"
            )
        )
        .distinct()
    )


@query(
    "fn_qualification_int",
    oracle="""
    SELECT CASE WHEN p_size % 7 BETWEEN 1 AND 5 THEN p_size % 7 ELSE 3 END
             AS qualification,
           COUNT(*) AS n
    FROM part GROUP BY 1 ORDER BY 1
    """,
)
def q_fn_qualification_int(spark, sf_dir: str) -> DataFrame:
    """Tolerant bounded-int coercion (reference: pipline.py:60-66 —
    LLM's niveau_qualification clamped to 1-5, junk → default)."""
    raw = (F.col("p_size") % 7).cast("int")
    qual = F.when(raw.between(1, 5), raw).otherwise(F.lit(3)).cast("int")
    return (
        load(spark, sf_dir, "part")
        .select(qual.alias("qualification"))
        .groupBy("qualification")
        .agg(F.count("*").alias("n"))
        .orderBy("qualification")
    )


def llm_json_fence(col):
    """Extract the JSON payload from LLM markdown output: the body of
    a ```json fenced block, or a bare payload when no fence exists
    (reference: pipline.py:51-57 `clean_response` regex
    ```(?:json)?\\s*([\\s\\S]*?)\\s*``` with a bare-array fallback;
    init_groq.py does the same dance). Native regexp_extract — the
    whole LLM-response post-processing stage stays JVM-side."""
    fenced = F.regexp_extract(col, r"```(?:json)?\s*([\s\S]*?)\s*```", 1)
    return F.when(fenced != "", fenced).otherwise(F.trim(col))


@query(
    "fn_llm_json_fence",
    oracle="""
    WITH resp AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN '```json' || chr(10) ||
                 '{"niveau_qualification": ' || CAST(doc_id % 7 AS VARCHAR)
                 || ', "titre_homogene": "dev"}' || chr(10) || '```'
               WHEN 1 THEN 'Sure, here you go: ```{"niveau_qualification": "senior"}``` hope it helps'
               WHEN 2 THEN '{"niveau_qualification": 5}'
               ELSE 'no json here at all'
             END AS text
      FROM documents
    ),
    ex AS (
      SELECT doc_id,
             CASE WHEN regexp_extract(text, '```(?:json)?\\s*([\\s\\S]*?)\\s*```', 1) <> ''
                  THEN regexp_extract(text, '```(?:json)?\\s*([\\s\\S]*?)\\s*```', 1)
                  ELSE trim(text) END AS payload
      FROM resp
    )
    SELECT doc_id,
           COALESCE(TRY_CAST(CASE WHEN json_valid(payload)
                  THEN json_extract_string(payload, '$.niveau_qualification')
                  END AS BIGINT), 0) AS niveau_qualification,
           COALESCE(CASE WHEN json_valid(payload)
                  THEN json_extract_string(payload, '$.titre_homogene') END, '')
             AS titre_homogene
    FROM ex ORDER BY doc_id
    """,
)
def q_fn_llm_json_fence(spark, sf_dir: str) -> DataFrame:
    """LLM-response post-processing (reference clean_response,
    pipline.py:51-80): strip the markdown code fence, tolerant-parse
    the JSON, coerce niveau_qualification to int with the reference's
    0 fallback for junk ('senior', no JSON). Four deterministic
    response shapes cycle through the corpus: proper ```json fence,
    unlabeled fence with a junk field, bare JSON, no JSON at all."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    text = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit('```json\n{"niveau_qualification": '),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(', "titre_homogene": "dev"}\n```'),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.lit('Sure, here you go: ```{"niveau_qualification": "senior"}``` hope it helps'),
        )
        .when(F.col("doc_id") % 4 == 2, F.lit('{"niveau_qualification": 5}'))
        .otherwise(F.lit("no json here at all"))
    )
    payload = llm_json_fence(text)
    return (
        docs.select(
            "doc_id",
            F.coalesce(
                F.get_json_object(payload, "$.niveau_qualification").try_cast("long"),
                F.lit(0),
            ).alias("niveau_qualification"),
            F.coalesce(
                F.get_json_object(payload, "$.titre_homogene"), F.lit("")
            ).alias("titre_homogene"),
        )
        .orderBy("doc_id")
    )


def prepare_llm_payload(title, description, competences):
    """LLM payload preparation (reference: pipline.py:38-48
    `prepare_offer`): cap title at 200 chars and description at 1000
    (prompt-budget hygiene), split the '-'-separated competences
    string into trimmed non-empty entries. All native — the payload
    prep for millions of offers never leaves the JVM."""
    comp = F.filter(
        F.transform(F.split(competences, "-"), lambda c: F.trim(c)),
        lambda c: c != "",
    )
    return (
        F.substring(title, 1, 200).alias("title"),
        F.substring(description, 1, 1000).alias("description"),
        comp.alias("competences"),
    )


@query(
    "fn_payload_prepare",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 200) AS title,
           CAST(length(substr(repeat(text || ' ', 30), 1, 1000)) AS BIGINT)
             AS desc_len,
           coalesce(array_to_string(list_filter(list_transform(string_split(
               replace(substr(text, 1, 90), ' ', '-'), '-'),
             c -> trim(c)), c -> c <> ''), '|'), '') AS competences
    FROM documents ORDER BY doc_id
    """,
)
def q_fn_payload_prepare(spark, sf_dir: str) -> DataFrame:
    """prepare_offer analog on the documents corpus: text stands in
    for the title (200-char cap), a 30x repeat for the long
    description (proving the 1000-char cap bites), and a dash-joined
    prefix for the competences string. Output must match DuckDB on the
    exact truncation boundaries and the trimmed split."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    title, desc, comp = prepare_llm_payload(
        F.col("text"),
        F.repeat(F.concat(F.col("text"), F.lit(" ")), 30),
        F.regexp_replace(F.substring("text", 1, 90), " ", "-"),
    )
    return (
        docs.select(
            "doc_id",
            title,
            F.length(desc).cast("long").alias("desc_len"),
            # pipe-joined, not the raw array: the driver's pandas
            # canonicalization cannot sort list-typed output columns;
            # coalesce mirrors the oracle's '' for a NULL token array
            F.coalesce(F.array_join(comp, "|"), F.lit("")).alias("competences"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_luhn_check",
    oracle="""
    WITH nums AS (
      SELECT user_id,
             lpad(CAST(user_id * 48271 % 100000000 AS VARCHAR), 8, '0')
               || lpad(CAST(user_id * 69621 % 100000000 AS VARCHAR), 8, '0')
               AS pan
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    digits AS (
      SELECT user_id, pan,
             CAST(substr(reverse(pan), i, 1) AS BIGINT) AS d,
             i
      FROM nums, unnest(generate_series(1, 16)) AS t(i)
    ),
    summed AS (
      SELECT user_id, pan,
             CAST(SUM(CASE WHEN i % 2 = 0 THEN
                   CASE WHEN 2 * d > 9 THEN 2 * d - 9 ELSE 2 * d END
                 ELSE d END) AS BIGINT) AS s
      FROM digits GROUP BY user_id, pan
    )
    SELECT user_id, pan, s AS luhn_sum,
           CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END AS luhn_valid
    FROM summed ORDER BY user_id LIMIT 40
    """,
    tags=("functions", "pii", "beyond"),
)
def q_fn_luhn_check(spark, sf_dir: str) -> DataFrame:
    """Luhn checksum validation as a pure relational expression — the
    checksum that separates ACTUAL card numbers from random 16-digit
    strings, i.e. the precision filter a PII scanner (text_pii_redact)
    runs on its card-shaped regex hits so dashboards aren't flooded
    with false positives (only ~10% of random digit strings pass
    Luhn). Synthesized deterministic PANs per user; digits explode
    from the REVERSED string (Luhn doubles every second digit from
    the RIGHT — doubling from the left is the classic bug, caught
    here by any odd-position PAN), double-and-subtract-9 per even
    position, integer sum mod 10.

    All integer arithmetic end-to-end; capped 40-row report.

    Scale: map-side digit explode (16× fan-out inside the row's
    projection), one combinable aggregation keyed by user."""
    nums = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.concat(
                F.lpad((F.col("user_id") * 48271 % 100000000).cast("string"), 8, "0"),
                F.lpad((F.col("user_id") * 69621 % 100000000).cast("string"), 8, "0"),
            ).alias("pan"),
        )
    )
    digits = nums.select(
        "user_id",
        "pan",
        F.posexplode(F.split(F.reverse("pan"), "(?!$)")).alias("pos", "ch"),
    ).select(
        "user_id",
        "pan",
        (F.col("pos") + 1).alias("i"),
        F.col("ch").cast("long").alias("d"),
    )
    summed = digits.groupBy("user_id", "pan").agg(
        F.sum(
            F.when(
                F.col("i") % 2 == 0,
                F.when(2 * F.col("d") > 9, 2 * F.col("d") - 9).otherwise(
                    2 * F.col("d")
                ),
            ).otherwise(F.col("d"))
        )
        .cast("long")
        .alias("s")
    )
    return (
        summed.select(
            "user_id",
            "pan",
            F.col("s").alias("luhn_sum"),
            F.when(F.col("s") % 10 == 0, 1).otherwise(0).alias("luhn_valid"),
        )
        .orderBy("user_id")
        .limit(40)
    )
