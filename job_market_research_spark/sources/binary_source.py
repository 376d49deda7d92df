"""Raw-file ingestion via Spark's binaryFile source (beyond-reference).

The ingestion path multimodal corpora actually use: a directory of
raw files (images, audio, here .txt blobs) read by
`spark.read.format("binaryFile")` into (path, modificationTime,
length, content) rows — the step BEFORE multimodal/binary_ops.py's
typed binary columns exist. The staged files are written FROM the
documents table, so the DuckDB oracle needs no filesystem access at
all: it recomputes each file's length and md5 from the same text —
the strict-oracle trick for a side-effectful source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query
from job_market_research_spark.sources.readers import scratch_dir

#: How many documents become staged raw files.
BINFILE_N = 20

_STAGED: dict[str, str] = {}


def stage_raw_files(spark: SparkSession, sf_dir: str) -> str:
    """Write the first BINFILE_N documents as individual .txt files
    (ASCII corpus → byte length == char length, and file md5 == text
    md5). Memoized per sf_dir; staging is driver-side but bounded at
    BINFILE_N files — at scale the files already exist, this only
    simulates the landing directory."""
    key = os.path.abspath(sf_dir)
    if key in _STAGED:
        return _STAGED[key]
    out = scratch_dir("binaryfile_landing")
    rows = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < BINFILE_N)
        .select("doc_id", "text")
        .collect()
    )
    for r in rows:
        with open(os.path.join(out, f"doc_{r['doc_id']:05d}.txt"), "w") as f:
            f.write(r["text"])
    _STAGED[key] = out
    return out


@query(
    "scan_binaryfile_source",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < {BINFILE_N}
    ORDER BY doc_id
    """,
    tags=("source", "multimodal", "beyond"),
)
def q_scan_binaryfile_source(spark, sf_dir: str) -> DataFrame:
    """Read the staged landing directory with the binaryFile source
    and emit (doc_id from the filename, byte length, content md5).
    The oracle recomputes all three from the documents table the
    files were written from — a filesystem round-trip proven
    byte-exact without the oracle ever touching a file.

    Scale notes: binaryFile parallelizes by file and carries
    `length` from the file status (no read needed for size-only
    scans); content md5 forces the read here deliberately. Path
    filters (pathGlobFilter) and the source's partition pruning keep
    a 100 TB landing zone scan bounded to the requested prefix."""
    src = stage_raw_files(spark, sf_dir)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(src)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        .orderBy("doc_id")
    )
