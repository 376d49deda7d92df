"""Per-Spark-app staged intermediates shared across registry queries.

Several query families re-derive the same expensive frame per query —
the dedup family's augmented corpus / shingle / signature tables, the
IR family's whitespace token-count table. Staging materializes each
shared frame ONCE per (application, parameters) with
``persist(MEMORY_AND_DISK)`` and hands every family member the same
DataFrame, so a full-registry sweep pays each derivation once instead
of once per query (r11 verdict item 1).

This is the same staged-intermediate discipline a production pipeline
applies: at 100 TB the stage would be a written-out parquet/Delta
table (the classic inverted-index or signature-table materialization);
within one Spark app the block store is the idiomatic equivalent and
spills to disk when it outgrows memory. Keyed by applicationId exactly
like io._DF_CACHE so entries pinned to a stopped session are
unpersisted and dropped the first time a successor app stages
anything (one live app per process).

Correctness note: a staged frame is VALUES-identical to its inline
derivation — persist changes the physical access path, never the
result — so every DuckDB oracle twin is untouched by staging.

Lifecycle note: entries live until the app changes (dead-app eviction
below) — including query-LOCAL round frames (k-core alive_r, BFS
dist_r, HITS state) that no other query will read. That is deliberate:
the frames are |V|-bounded (never corpus-sized), persist() is lazy so
plan construction stays nearly execution-free (the plan census builds
all 465 plans without running them — an eager localCheckpoint would
break that; one exception: ml.graph.staged_und's BUILD runs a
docs.count() job the first time any iterative graph plan is
constructed, to size its round count), and under storage pressure
Spark's LRU evicts exactly these never-re-read blocks first, at
recompute-on-miss cost only. A sweep leaves ~a dozen small round
tables resident, not a leak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_STAGE_CACHE: dict[tuple, DataFrame] = {}


def staged_frame(
    spark, name: str, sf_dir: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """The common staged-leg shape: one frame per (app, name, dataset).
    Normalizes the dataset path once HERE (realpath, so a symlinked
    sf_dir cannot create a second cache entry for the same data) —
    callers with extra key parameters (shingle width, iteration round)
    use app_staged directly and should normalize the same way."""
    import os

    return app_staged(
        spark, (name, os.path.realpath(os.path.abspath(sf_dir))), build
    )


def app_staged(spark, key: tuple, build: Callable[[], DataFrame]) -> DataFrame:
    """Return the staged frame for `key`, building + persisting it on
    first use in this Spark application."""
    app = spark.sparkContext.applicationId
    full = (app, *key)
    hit = _STAGE_CACHE.get(full)
    if hit is not None:
        return hit
    for k in [k for k in _STAGE_CACHE if k[0] != app]:
        try:
            _STAGE_CACHE[k].unpersist()
        except Exception:
            pass  # stopped contexts can't (and needn't) unpersist
        del _STAGE_CACHE[k]
    from pyspark import StorageLevel

    df = build().persist(StorageLevel.MEMORY_AND_DISK)
    _STAGE_CACHE[full] = df
    return df
