"""SparkSession factory tuned for this engine.

The reference ran bitnami Spark 3.3.2 in single-container local mode
(reference: spark_pipeline/transform_job.py:41-50) with hand-rolled S3A
wiring. Here one factory owns all session config; the same settings
scale from local[N] testing to a multi-executor cluster because they
only concern the SQL layer (AQE, shuffle sizing, Arrow), not the
cluster manager.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _scratch_dir() -> str:
    """Gitignored `.scratch/` at the repo root — shared with
    sources.readers.SCRATCH — for engine byproducts (Derby, warehouse)."""
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")
    os.makedirs(d, exist_ok=True)
    return d


def get_spark(
    app_name: str = "job_market_research_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime shuffle-partition coalescing, skew-join splitting
      and dynamic broadcast decisions — the knobs that matter at 100 TB.
    - Arrow on: every pandas-UDF boundary is Arrow-batched.
    - UTC session timezone: parquet timestamps compare cleanly against
      the DuckDB oracle (naive-UTC semantics).
    - shuffle partitions default to the local core count; on a real
      cluster AQE re-coalesces upward from the initial value.
    """
    cpus = default_parallelism()
    derby_java_options = (
        f"-Dderby.system.home={_scratch_dir()} "
        f"-Dderby.stream.error.file={os.path.join(_scratch_dir(), 'derby.log')}"
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.ts has shipped as TIMESTAMP(NANOS) (vanilla
        # Spark refuses: read as long nanos, io.load divides exactly)
        # and as TIMESTAMP(MICROS, naive) (scan as NTZ, io.load casts
        # under the UTC session timezone). Setting both here means
        # sessions from this factory never rely on io.load's defensive
        # conf-set path.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # keep engine droppings out of the CWD: the Hive-less warehouse
        # dir and embedded Derby's log (JDBC sink tests) both default to
        # the process CWD, which litters the repo root across rounds.
        # NOTE: -D flags only take effect when THIS builder launches the
        # driver JVM; in a process whose SparkContext already exists
        # they no-op (getOrCreate returns the live session) and Derby
        # falls back to its CWD defaults — acceptable for the secondary
        # caller, harmless for the repo since every entry point here
        # builds its session through this factory first.
        .config("spark.sql.warehouse.dir", os.path.join(_scratch_dir(), "spark-warehouse"))
        .config("spark.driver.extraJavaOptions", derby_java_options)
    )
    for k, v in (extra_conf or {}).items():
        # merge, don't clobber: a caller-supplied extraJavaOptions
        # would otherwise silently drop the Derby flags above
        if k == "spark.driver.extraJavaOptions":
            v = f"{derby_java_options} {v}"
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_s3a(
    spark: SparkSession,
    endpoint: str,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = True,
) -> SparkSession:
    """S3-compatible object-store wiring (SURVEY §2.1 `source_s3a_config`;
    reference: spark_pipeline/transform_job.py:53-67).

    Identical `fs.s3a.*` settings work for MinIO, AWS S3 and any
    S3-compatible store; paths then read as ``s3a://bucket/key``.
    Credentials must come from the environment/secret store, never
    hardcoded (the reference's own test plan flags its hardcoded keys).
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    access_key = access_key or os.environ.get("AWS_ACCESS_KEY_ID")
    secret_key = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY")
    if access_key:
        hconf.set("fs.s3a.access.key", access_key)
    if secret_key:
        hconf.set("fs.s3a.secret.key", secret_key)
    hconf.set("fs.s3a.path.style.access", "true" if path_style else "false")
    hconf.set("fs.s3a.connection.ssl.enabled", "false" if endpoint.startswith("http:") else "true")
    hconf.set("fs.s3a.impl", "org.apache.hadoop.fs.s3a.S3AFileSystem")
    return spark
