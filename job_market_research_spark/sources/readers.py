"""Source / scan operators (SURVEY §2.1).

The reference ingests semi-structured JSON from staged object-store
buckets: schema'd multiLine reads (transform_job.py:95-112), client-side
file pruning by extension+size (transform_job.py:75-92), tolerant
readers for concatenated/NDJSON payloads (insert_to_postgres.py:137-142)
and whole-bucket union reads (database/__init__.py:124-171).

Spark-first mapping: `spark.read.schema(...).json(glob)` covers the
schema'd multi-file union natively; size-based pruning is a filesystem
listing (Spark has no built-in size filter); the "}{"-concatenated
repair is a wholetext read + native regexp + `from_json` + `explode` —
no driver-side file munging.

Registry queries write deterministic JSON into a scratch area first
(testdata is parquet; the reference's scan surface is JSON) and then
exercise the reader path; the oracle checks the round-trip against the
parquet source of truth.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def scratch_dir(name: str, fresh: bool = True) -> str:
    """Per-PROCESS scratch path: two concurrent sessions (e.g. the
    oracle verify and the pytest suite at different scale factors)
    must not read each other's sink/index/view materializations —
    without the pid namespace, whichever process writes second
    corrupts the first one's read-back. Stale dirs from dead pids are
    reaped lazily on the next call."""
    ns_root = os.path.join(SCRATCH, f"pid{os.getpid()}")
    if os.path.isdir(SCRATCH):
        for entry in os.listdir(SCRATCH):
            if entry.startswith("pid") and entry != f"pid{os.getpid()}":
                try:
                    if not os.path.exists(os.path.join("/proc", entry[3:])):
                        shutil.rmtree(os.path.join(SCRATCH, entry))
                except (OSError, ValueError):
                    pass
    path = os.path.join(ns_root, name)
    if fresh and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def read_json_with_schema(
    spark: SparkSession, paths: list[str] | str, schema: T.StructType, multiline: bool = False
) -> DataFrame:
    """Schema'd JSON read merging many files into one relation
    (reference: spark.read.schema(global_schema).option('multiLine',
    True).json(valid_files), transform_job.py:110). The explicit schema
    skips the inference pass — one scan, pruned to the declared columns."""
    return spark.read.schema(schema).option("multiLine", multiline).json(paths)


def prune_files(directory: str, suffix: str = ".json", min_bytes: int = 10) -> list[str]:
    """Pre-scan file filter: only `suffix` files larger than
    `min_bytes` (reference: transform_job.py:75-92; skillner/utils.py:
    94-111). A listing-level concern — on object stores this is the
    bucket listing; locally os.scandir. Spark never opens pruned files."""
    out = []
    for entry in sorted(os.scandir(directory), key=lambda e: e.name):
        if entry.is_file() and entry.name.endswith(suffix) and entry.stat().st_size > min_bytes:
            out.append(entry.path)
    return out


def read_concatenated_json(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Tolerant reader for a file of back-to-back pretty-printed JSON
    objects ("}\\n{" breakage; reference: insert_to_postgres.py:137-142
    repairs with string replace in the driver). Here the repair is a
    distributed plan: wholetext read → native regexp splice → from_json
    array → explode."""
    raw = spark.read.text(path, wholetext=True)
    arr_type = T.ArrayType(schema)
    repaired = F.concat(
        F.lit("["),
        F.regexp_replace(F.col("value"), r"\}\s*\{", "},{"),
        F.lit("]"),
    )
    return (
        raw.select(F.explode(F.from_json(repaired, arr_type)).alias("rec"))
        .select("rec.*")
    )


DOCS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _write_docs_json(spark: SparkSession, sf_dir: str, name: str, parts: int = 4) -> str:
    """Stage documents (sans text) as a multi-file JSON directory."""
    out = scratch_dir(name)
    (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .repartition(parts, "doc_id")
        .write.mode("overwrite")
        .json(out)
    )
    return out


@query(
    "scan_json_schema",
    oracle="SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id",
)
def q_scan_json_schema(spark, sf_dir: str) -> DataFrame:
    """Round-trip: stage as multi-file JSON, read back with an explicit
    schema (no inference), union-by-glob."""
    out = _write_docs_json(spark, sf_dir, "scan_json_schema")
    return read_json_with_schema(spark, out + "/*.json", DOCS_JSON_SCHEMA).orderBy(
        "doc_id"
    )


@query(
    "scan_file_pruning",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT source) AS n_sources
    FROM documents
    """,
)
def q_scan_file_pruning(spark, sf_dir: str) -> DataFrame:
    """Size/extension pruning: a <10-byte decoy json and a non-json
    file are planted next to the real staged files; only the pruned
    listing is handed to the reader, so the decoys never reach Spark."""
    out = _write_docs_json(spark, sf_dir, "scan_file_pruning")
    with open(os.path.join(out, "tiny.json"), "w") as f:
        f.write("{}")  # 2 bytes — pruned by size
    with open(os.path.join(out, "notes.txt"), "w") as f:
        f.write('{"doc_id": 999999999}')  # wrong extension — pruned
    good = prune_files(out)
    df = read_json_with_schema(spark, good, DOCS_JSON_SCHEMA)
    return df.agg(
        F.count("*").alias("n_rows"), F.countDistinct("source").alias("n_sources")
    )


@query(
    "scan_jsonl_repair",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def q_scan_jsonl_repair(spark, sf_dir: str) -> DataFrame:
    """Repair-and-parse files of concatenated pretty-printed JSON
    objects entirely inside the plan. The pathological fixture itself
    is staged DISTRIBUTED (format_string → write.text) — no
    driver-side collect, so staging scales with the corpus."""
    out = scratch_dir("scan_jsonl_repair")
    # Stage the pathological input shape the reference tolerates:
    # pretty-printed objects back to back with no array wrapper.
    pretty = F.format_string(
        '{\n  "doc_id": %d,\n  "lang": "%s",\n  "source": "%s",\n  "n_chars": %d\n}',
        F.col("doc_id"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars"),
    )
    (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(pretty.alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(out)
    )
    return read_concatenated_json(spark, out, DOCS_JSON_SCHEMA).orderBy("doc_id")


@query(
    "scan_bucket_union",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    WHERE o_orderkey % 2 = 1
    ORDER BY o_orderkey
    """,
)
def q_scan_bucket_union(spark, sf_dir: str) -> DataFrame:
    """Whole-stage-area union read (reference: database/__init__.py:
    124-171 accumulates every object in a bucket): two staged batches
    under one prefix, one glob read unions them."""
    root = scratch_dir("scan_bucket_union")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    for label, residue in (("batch_a", 0), ("batch_b", 1)):
        (
            orders.filter(F.col("o_orderkey") % 2 == residue)
            .write.mode("overwrite")
            .json(os.path.join(root, label))
        )
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
        ]
    )
    return read_json_with_schema(spark, root + "/*/*.json", schema).orderBy(
        "o_orderkey"
    )


@query(
    "sort_files",
    oracle="""
    SELECT CAST(doc_id % 4 AS VARCHAR) AS bucket, COUNT(*) AS n
    FROM documents GROUP BY 1 ORDER BY bucket
    """,
)
def q_sort_files(spark, sf_dir: str) -> DataFrame:
    """Deterministic file-order processing (reference: backup.py:45-47
    sorts the listing): stage partitioned by bucket, recover each row's
    source file via input_file_name(), aggregate per file bucket."""
    out = scratch_dir("sort_files")
    (
        load(spark, sf_dir, "documents")
        .withColumn("bucket", (F.col("doc_id") % 4).cast("string"))
        .select("doc_id", "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .json(out)
    )
    schema = T.StructType([T.StructField("doc_id", T.LongType())])
    df = spark.read.schema(schema).option("basePath", out).json(out + "/bucket=*/")
    return (
        df.withColumn(
            "bucket", F.regexp_extract(F.input_file_name(), r"bucket=(\d)", 1)
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


from job_market_research_spark.session import configure_s3a  # noqa: E402


@query(
    "source_s3a_config",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
)
def q_source_s3a_config(spark, sf_dir: str) -> DataFrame:
    """Object-store config path: apply the full s3a conf to the live
    session (endpoint/path-style/creds), then read through the Hadoop
    FS layer — the same reader code serves file:// here and s3a:// on
    a cluster; only the URI scheme changes."""
    configure_s3a(spark, endpoint="http://localhost:9000")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.path.style.access") == "true"
    return load(spark, sf_dir, "region").select("r_regionkey", "r_name").orderBy(
        "r_regionkey"
    )


@query(
    "scan_corrupt_records",
    oracle="""
    WITH parsed AS (
      SELECT doc_id % 3 = 2 AS corrupt FROM documents WHERE doc_id < 300
    )
    SELECT CASE WHEN corrupt THEN 'corrupt' ELSE 'valid' END AS record_class,
           COUNT(*) AS n
    FROM parsed GROUP BY 1 ORDER BY record_class
    """,
)
def q_scan_corrupt_records(spark, sf_dir: str) -> DataFrame:
    """Corrupt-record routing — the Spark-first replacement for the
    reference's per-record jsonschema gate (Websites/__init__.py:
    210-235): PERMISSIVE JSON parsing captures unparseable lines in
    `_corrupt_record` instead of failing the job, and the stream
    forks into a valid path and a quarantine path. Every 3rd staged
    line is deterministically mangled; the oracle recomputes the
    split arithmetically. Staging is a distributed to_json →
    write.text plan — no driver-side collect."""
    out = scratch_dir("scan_corrupt_records")
    line = F.to_json(F.struct("doc_id", "lang"))
    mangled = F.when(
        F.col("doc_id") % 3 == 2,
        # strip the closing brace, append garbage → unparseable
        F.concat(F.expr("substring(l, 1, length(l) - 1)"), F.lit(",,,")),
    ).otherwise(F.col("l"))
    (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", line.alias("l"))
        .select(mangled.alias("value"))
        .write.mode("overwrite")
        .text(out)
    )
    path = out

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # Spark disallows plans referencing ONLY the corrupt column over
        # a raw scan; materializing the parse first is the documented
        # pattern (and what a quarantine fork does anyway).
        .cache()
    )
    return (
        df.select(
            F.when(F.col("_corrupt_record").isNotNull(), "corrupt")
            .otherwise("valid")
            .alias("record_class")
        )
        .groupBy("record_class")
        .agg(F.count("*").alias("n"))
        .orderBy("record_class")
    )


@query(
    "scan_csv_schema",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id % 4 = 1 ORDER BY doc_id
    """,
)
def q_scan_csv_schema(spark, sf_dir: str) -> DataFrame:
    """Schema'd CSV round-trip (the reference's tabular artifact
    surface: data_extraction/scraping_output/processed_jobs.csv,
    backup.py Excel sheets): header write, explicit-schema header read
    — no inference pass, columns pruned at the scan like any other
    source."""
    out = scratch_dir("scan_csv_schema")
    (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 1)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite")
        .option("header", True)
        .csv(out)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", True)
        .csv(out + "/*.csv")
        .orderBy("doc_id")
    )


@query(
    "scan_csv_permissive",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE CAST(n_chars AS BIGINT) END AS n_chars,
           CASE WHEN doc_id % 13 = 0
                THEN CAST(doc_id AS VARCHAR) || ',' || lang || ',BROKEN'
                ELSE NULL END AS corrupt_raw
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def q_scan_csv_permissive(spark, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingestion with quarantine (the dirty-feed
    reality of any scrape pipeline): every 13th staged row carries an
    unparseable numeric field; the read keeps the parseable columns,
    nulls the broken one, and captures the raw line in the
    corrupt-record column so bad rows are quarantinable instead of
    failing the job. The oracle replays both the damage and the
    recovery. At scale this is the standard dead-letter pattern: one
    pass, no pre-validation scan."""
    out = scratch_dir("scan_csv_permissive")
    line = F.when(
        F.col("doc_id") % 13 == 0,
        F.format_string("%d,%s,BROKEN", F.col("doc_id"), F.col("lang")),
    ).otherwise(
        F.format_string(
            "%d,%s,%d", F.col("doc_id"), F.col("lang"), F.col("n_chars")
        )
    )
    (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(line.alias("value"))
        .write.mode("overwrite")
        .text(out)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("corrupt_raw", T.StringType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "corrupt_raw")
        .csv(out)
        .orderBy("doc_id")
    )


@query(
    "scan_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 3 = 0 AND o_totalprice > 150000
    ORDER BY o_orderkey
    """,
)
def q_scan_orc_roundtrip(spark, sf_dir: str) -> DataFrame:
    """ORC as a second columnar interchange format (Spark ships the
    reader/writer natively): stage a slice as zlib ORC, read it back
    with a pushed-down predicate. ORC carries per-stripe min/max like
    parquet row groups, so the `o_totalprice > 150000` filter prunes
    stripes at the scan — same pushdown story as the parquet path,
    proving the engine is not format-locked."""
    out = scratch_dir("scan_orc_roundtrip")
    (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite")
        .option("compression", "zlib")
        .orc(out)
    )
    return (
        spark.read.orc(out)
        .filter(F.col("o_totalprice") > 150000)
        .orderBy("o_orderkey")
    )


@query(
    "scan_schema_evolution",
    oracle="""
    WITH gen1 AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_channel
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    gen2 AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END
               AS o_channel
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    unioned AS (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2)
    SELECT COALESCE(o_channel, 'unknown') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total
    FROM unioned GROUP BY 1 ORDER BY channel
    """,
)
def q_scan_schema_evolution(spark, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet generations of the same
    table — the newer one adds an `o_channel` column — are read
    through ONE `mergeSchema` scan; old-generation rows surface the
    added column as NULL, normalized by a sentinel.

    This is the lakehouse append-evolution contract (new ingest code
    adds columns without rewriting history). The merge cost is
    footer-metadata only — schemas union at planning time, row data
    is never rewritten; at 100 TB enable
    `spark.sql.parquet.mergeSchema` per-read exactly like this rather
    than session-wide (it adds a footer pass per file). The aggregate
    proves values from BOTH generations flow through one plan."""
    base = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    gen1 = base.filter(F.col("o_orderkey") % 2 == 0)
    gen2 = base.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_channel",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("web")).otherwise(
            F.lit("store")
        ),
    )
    root = scratch_dir("schema_evolution")
    gen1.write.mode("overwrite").parquet(os.path.join(root, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(root, "gen=2"))
    evolved = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "gen=1"), os.path.join(root, "gen=2")
    )
    return (
        evolved.groupBy(
            F.coalesce(F.col("o_channel"), F.lit("unknown")).alias("channel")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("channel")
    )


@query(
    "scan_parquet_bloom",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total
    FROM orders
    WHERE o_custkey IN (7, 419, 1327)
    GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def q_scan_parquet_bloom(spark, sf_dir: str) -> DataFrame:
    """Parquet BLOOM-FILTER point-lookup path: stage orders sorted by
    customer with a bloom filter on `o_custkey` (a high-cardinality
    key where min/max row-group stats are useless once values
    interleave — exactly where blooms earn their keep), then probe
    with an IN filter. The sort gives each row group a narrow key
    range, and the bloom lets the reader skip row groups whose filter
    definitively excludes all three probe keys — at 100 TB this is
    the difference between touching every row group of a multi-TB
    fact table and touching the handful that can contain the keys.
    The predicate still shows as PushedFilters (In(o_custkey, ...)),
    so correctness never depends on the bloom — it only prunes IO.
    (The writer-options path in this Spark build forwards only the
    GLOBAL parquet.bloom.filter.* keys, not the #column-scoped
    variants — pinned by the staged-file-size test; scope filters
    per column via the Hadoop conf on a real deployment.)

    Determinism: the staged file holds exactly the source rows; the
    aggregate is the usual exact-DECIMAL sum."""
    out = scratch_dir("scan_parquet_bloom")
    (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .sort("o_custkey")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv", "200000")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("o_custkey").isin(7, 419, 1327))
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_custkey")
    )


@query(
    "scan_struct_pruning",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total
    FROM orders WHERE o_totalprice > 150000
    GROUP BY 1 ORDER BY priority
    """,
)
def q_scan_struct_pruning(spark, sf_dir: str) -> DataFrame:
    """Nested-schema pruning: stage orders with the payload folded
    into a STRUCT column (meta.priority / meta.status / meta.total —
    the shape event logs and API dumps actually arrive in), then
    aggregate over just two of the three nested fields. Spark's
    nested-schema pruning (`spark.sql.optimizer.nestedSchemaPruning`,
    on by default) rewrites the scan to read ONLY the referenced
    struct leaves — tests/test_pushdown.py pins that the plan's
    ReadSchema contains priority and total but NOT status. At 100 TB
    a wide metadata struct whose unused leaves still ship through the
    scan is a silent multi-x I/O tax; this query + its plan test are
    the guard.

    The filter on meta.total also reaches the scan as a pushed
    predicate on the nested leaf (parquet column indexes work on
    struct leaves too)."""
    out = scratch_dir("scan_struct_pruning")
    (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.struct(
                F.col("o_orderpriority").alias("priority"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("total"),
            ).alias("meta"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("meta.total") > 150000)
        .groupBy(F.col("meta.priority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("meta.total").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("priority")
    )
