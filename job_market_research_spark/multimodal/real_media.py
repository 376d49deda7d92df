"""Real-codec multimodal queries: actual bytes, actual format parsing.

Each query builds REAL media payloads executor-side from a
deterministic recipe (so the DuckDB oracle can replay every sample
arithmetically), round-trips them through the dependency-free codecs in
`multimodal.codecs` (binary PGM / WAV PCM16 — real headers, real byte
layouts), and emits integer-exact features. This is the production
decode contract running end-to-end, not a stub: swap the payload
generator for a parquet `binary` column and the stage is unchanged.

Scale notes: payloads never leave the executor (generated, decoded and
reduced inside one Arrow batch); only fixed-width features return to
the JVM. On a real corpus the binary column arrives via parquet and the
same mapInPandas bodies apply per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query
from job_market_research_spark.multimodal.codecs import (
    decode_media,
    decode_netpbm,
    decode_wav,
    encode_pgm,
    encode_wav_pcm16,
    resize_nearest,
)

#: Deterministic image recipe (oracle-replayable): per doc_id d,
#: a (h, w) grayscale image with pixel(y, x) = (x + 3y + 7d) mod 256.
_IMG_W = "doc_id % 48 + 8"
_IMG_H = "doc_id % 32 + 8"


def _make_image(d: int) -> np.ndarray:
    w = d % 48 + 8
    h = d % 32 + 8
    return (
        (np.add.outer(3 * np.arange(h), np.arange(w)) + 7 * d) % 256
    ).astype(np.uint8)


DECODE_REAL_SCHEMA = (
    "doc_id long, kind string, width long, height long, pixel_sum long"
)


def _decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = encode_pgm(_make_image(d))  # real P5 bytes
            meta = decode_media(payload)  # magic sniff + header parse
            img = decode_netpbm(payload)
            rows.append(
                (d, meta["kind"], meta["width"], meta["height"], int(img.sum(dtype=np.int64)))
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "kind", "width", "height", "pixel_sum"]
        )


@query(
    "multimodal_decode_real",
    oracle=f"""
    SELECT doc_id, 'pgm' AS kind,
           {_IMG_W} AS width, {_IMG_H} AS height,
           CAST(SUM((xx.x + 3 * yy.y + 7 * doc_id) % 256) AS BIGINT) AS pixel_sum
    FROM documents,
         unnest(range(0, {_IMG_W})) AS xx(x),
         unnest(range(0, {_IMG_H})) AS yy(y)
    WHERE doc_id < 200
    GROUP BY 1, 2, 3, 4 ORDER BY doc_id
    """,
)
def q_multimodal_decode_real(spark, sf_dir: str) -> DataFrame:
    """REAL image decode path: build binary PGM payloads (P5 header +
    raw samples), decode them with the dependency-free netpbm codec
    (magic sniff → header parse → numpy view), and reduce to
    integer-exact features the oracle replays pixel-by-pixel. The
    production stage is identical with parquet-sourced bytes."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    return docs.mapInPandas(_decode_real, schema=DECODE_REAL_SCHEMA)


RESIZE_REAL_SCHEMA = "doc_id long, out_h long, out_w long, resized_sum long"
_RESIZE_TO = 16


def _resize_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            img = decode_netpbm(encode_pgm(_make_image(d)))
            small = resize_nearest(img, _RESIZE_TO, _RESIZE_TO)
            rows.append((d, small.shape[0], small.shape[1], int(small.sum(dtype=np.int64))))
        yield pd.DataFrame(rows, columns=["doc_id", "out_h", "out_w", "resized_sum"])


@query(
    "multimodal_resize_real",
    oracle=f"""
    SELECT doc_id, {_RESIZE_TO} AS out_h, {_RESIZE_TO} AS out_w,
           CAST(SUM((
                (jj.j * ({_IMG_W})) // {_RESIZE_TO}
                + 3 * ((ii.i * ({_IMG_H})) // {_RESIZE_TO})
                + 7 * doc_id) % 256) AS BIGINT) AS resized_sum
    FROM documents,
         unnest(range(0, {_RESIZE_TO})) AS ii(i),
         unnest(range(0, {_RESIZE_TO})) AS jj(j)
    WHERE doc_id < 200
    GROUP BY 1, 2, 3 ORDER BY doc_id
    """,
)
def q_multimodal_resize_real(spark, sf_dir: str) -> DataFrame:
    """REAL pixel resample: decode PGM, nearest-neighbor resize with
    floor index mapping (src = dst*src_dim // dst_dim — integer-exact),
    checksum the resampled pixels. The oracle recomputes every output
    pixel through the same index arithmetic, so this checks actual
    resampled values, not just target dimensions."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    return docs.mapInPandas(_resize_real, schema=RESIZE_REAL_SCHEMA)


#: Deterministic audio recipe: n = d%1600+160 PCM16 mono samples at
#: rate 8000 + (d%3)*4000, sample_i = ((i * (d+3)) mod 65521) - 32760.
_AUD_N = "doc_id % 1600 + 160"
_AUD_RATE = "8000 + (doc_id % 3) * 4000"

AUDIO_REAL_SCHEMA = (
    "doc_id long, kind string, sample_rate long, n_samples long, sum_abs long"
)


def _audio_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            n = d % 1600 + 160
            rate = 8000 + (d % 3) * 4000
            samples = (((np.arange(n, dtype=np.int64) * (d + 3)) % 65521) - 32760).astype(
                np.int16
            )
            payload = encode_wav_pcm16(samples, rate)  # real RIFF/WAVE bytes
            meta = decode_media(payload)
            decoded, got_rate = decode_wav(payload)
            rows.append(
                (
                    d,
                    meta["kind"],
                    got_rate,
                    meta["n_samples"],
                    int(np.abs(decoded.astype(np.int64)).sum()),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "kind", "sample_rate", "n_samples", "sum_abs"]
        )


@query(
    "multimodal_audio_real",
    oracle=f"""
    SELECT doc_id, 'wav' AS kind,
           {_AUD_RATE} AS sample_rate,
           {_AUD_N} AS n_samples,
           CAST(SUM(ABS((ii.i * (doc_id + 3)) % 65521 - 32760)) AS BIGINT) AS sum_abs
    FROM documents,
         unnest(range(0, {_AUD_N})) AS ii(i)
    WHERE doc_id < 200
    GROUP BY 1, 2, 3, 4 ORDER BY doc_id
    """,
)
def q_multimodal_audio_real(spark, sf_dir: str) -> DataFrame:
    """REAL audio decode path: synthesize PCM16 samples, wrap them in
    an actual WAV container (stdlib wave), decode through the
    magic-sniffing dispatcher, and verify container metadata AND the
    sample values themselves via an absolute-sum the oracle replays."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    return docs.mapInPandas(_audio_real, schema=AUDIO_REAL_SCHEMA)
