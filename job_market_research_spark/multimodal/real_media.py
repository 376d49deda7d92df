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


# ---------------------------------------------------------------- phash

PHASH_SCHEMA = "doc_id long, b0 long, b1 long, b2 long, b3 long"


def _ahash_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real perceptual-hash pipeline per Arrow batch: encode the
    recipe image to actual PGM bytes, decode through the magic-sniff
    dispatcher, nearest-resize to 8x8, threshold against the mean
    (strict `pixel*64 > sum` in integers — no float mean), and pack
    the 64 bits into four 16-bit band ints (row-major y*8+x)."""
    from job_market_research_spark.multimodal.codecs import (
        decode_netpbm,
        encode_pgm,
        resize_nearest,
    )

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            img = decode_netpbm(encode_pgm(_make_image(d)))
            r = resize_nearest(img, 8, 8).astype(np.int64).flatten()
            s = int(r.sum())
            bits = (r * 64 > s).astype(int)
            bands = [
                int(sum(int(b) << i for i, b in enumerate(bits[j * 16 : (j + 1) * 16])))
                for j in range(4)
            ]
            rows.append((d, *bands))
        yield pd.DataFrame(rows, columns=["doc_id", "b0", "b1", "b2", "b3"])


#: SQL replay of one 16-bit aHash band: resized(Y,X) =
#: ((X*w)//8 + 3*((Y*h)//8) + 7d) mod 256, bit = px*64 > sum(all 64).
_PHASH_BAND = """
      CAST(SUM(CASE WHEN px * 64 > tot AND bitpos BETWEEN {lo} AND {hi}
               THEN CAST(1 AS BIGINT) << (bitpos - {lo}) ELSE 0 END)
           AS BIGINT)
"""


@query(
    "multimodal_phash_cluster",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, yy.y * 8 + xx.x AS bitpos,
             ((xx.x * ({_IMG_W})) // 8
              + 3 * ((yy.y * ({_IMG_H})) // 8)
              + 7 * doc_id) % 256 AS px
      FROM documents,
           unnest(range(0, 8)) AS xx(x),
           unnest(range(0, 8)) AS yy(y)
    ),
    tot AS (
      SELECT doc_id, bitpos, px,
             SUM(px) OVER (PARTITION BY doc_id) AS tot
      FROM px
    ),
    hashes AS (
      SELECT doc_id,
             {_PHASH_BAND.format(lo=0, hi=15)} AS b0,
             {_PHASH_BAND.format(lo=16, hi=31)} AS b1,
             {_PHASH_BAND.format(lo=32, hi=47)} AS b2,
             {_PHASH_BAND.format(lo=48, hi=63)} AS b3
      FROM tot GROUP BY doc_id
    )
    SELECT b0, b1, b2, b3,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
    FROM hashes GROUP BY b0, b1, b2, b3
    HAVING COUNT(*) >= 2
    ORDER BY cluster_size DESC, rep_doc_id LIMIT 50
    """,
)
def q_multimodal_phash_cluster(spark, sf_dir: str) -> DataFrame:
    """Perceptual-duplicate CLUSTERING over the real image decode
    path: PGM encode → magic-sniff decode → 8×8 nearest resize →
    integer aHash (four 16-bit bands), then a plain groupBy on the
    full 64-bit hash reports duplicate clusters.

    The deliberate scale choice: clustering by exact hash (one
    groupBy, map-side combinable, output ≤ |distinct hashes|) instead
    of banded pair enumeration — on low-entropy corpora (screenshots,
    logos, this synthetic gradient set) perceptual bands collapse and
    a pair join explodes quadratically (measured: 4.7M candidate
    pairs at sf0.01 from 5k images); the group-by shape is immune by
    construction. Hamming-tolerant matching belongs on the CLUSTER
    REPRESENTATIVES (≤ |clusters|² ≪ |corpus|²), the standard
    two-level phash dedup. Payload bytes never shuffle — only the
    4×16-bit hash leaves the Arrow batch."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    hashes = docs.mapInPandas(_ahash_bands, schema=PHASH_SCHEMA)
    return (
        hashes.groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.min("doc_id").cast("long").alias("rep_doc_id"),
        )
        .filter(F.col("cluster_size") >= 2)
        .orderBy(F.desc("cluster_size"), "rep_doc_id")
        .limit(50)
    )


# ------------------------------------------------------------ audio fp

#: Energy-profile fingerprint geometry: AUDIO_FP_FRAMES equal frames,
#: one sign bit per consecutive-frame energy delta.
AUDIO_FP_FRAMES = 8
AUDIO_FP_MAX_DOC = 400

AUDIO_FP_SCHEMA = "doc_id long, fp long, sample_rate long"


def _audio_fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Shazam-style energy-delta fingerprint through the REAL WAV
    path: synthesize PCM16, encode an actual RIFF/WAVE container,
    decode it back, split into AUDIO_FP_FRAMES frames (frame of
    sample i = (i*FRAMES)//n), and emit one bit per consecutive-frame
    energy comparison — all integer arithmetic."""
    from job_market_research_spark.multimodal.codecs import (
        decode_wav,
        encode_wav_pcm16,
    )

    frames = AUDIO_FP_FRAMES
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            n = d % 1600 + 160
            rate = 8000 + (d % 3) * 4000
            samples = (
                ((np.arange(n, dtype=np.int64) * (d + 3)) % 65521) - 32760
            ).astype(np.int16)
            decoded, got_rate = decode_wav(encode_wav_pcm16(samples, rate))
            s = np.abs(decoded.astype(np.int64))
            f = (np.arange(n) * frames) // n
            e = np.bincount(f, weights=s, minlength=frames).astype(np.int64)
            fp = int(
                sum((1 if e[j] > e[j + 1] else 0) << j for j in range(frames - 1))
            )
            rows.append((d, fp, got_rate))
        yield pd.DataFrame(rows, columns=["doc_id", "fp", "sample_rate"])


@query(
    "multimodal_audio_fingerprint",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, (ii.i * {AUDIO_FP_FRAMES}) // ({_AUD_N}) AS f,
             SUM(ABS((ii.i * (doc_id + 3)) % 65521 - 32760)) AS energy
      FROM documents, unnest(range(0, {_AUD_N})) AS ii(i)
      WHERE doc_id < {AUDIO_FP_MAX_DOC}
      GROUP BY 1, 2
    ),
    prof AS (
      SELECT doc_id, list(energy ORDER BY f) AS ee FROM e GROUP BY doc_id
    ),
    fps AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(1, {AUDIO_FP_FRAMES}),
                    j -> CASE WHEN ee[j] > ee[j + 1]
                         THEN CAST(1 AS BIGINT) << (j - 1) ELSE 0 END))
                  AS BIGINT) AS fp
      FROM prof
    )
    SELECT fp, CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
    FROM fps GROUP BY fp HAVING COUNT(*) >= 2
    ORDER BY cluster_size DESC, rep_doc_id LIMIT 50
    """,
)
def q_multimodal_audio_fingerprint(spark, sf_dir: str) -> DataFrame:
    """Audio near-duplicate clustering by energy-profile fingerprint —
    the audio sibling of `multimodal_phash_cluster`, through the real
    WAV encode→sniff→decode path.

    Same scale discipline: the waveform never leaves the Arrow batch
    (only a {AUDIO_FP_FRAMES}-bit int + rate return), clustering is a
    plain bounded-key groupBy (no pair join), and hamming-tolerant
    matching belongs on cluster representatives. The per-sample work
    is integer-exact, so DuckDB replays the fingerprints from the
    synthesis recipe end-to-end."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < AUDIO_FP_MAX_DOC)
        .select("doc_id")
    )
    fps = docs.mapInPandas(_audio_fingerprint, schema=AUDIO_FP_SCHEMA)
    return (
        fps.groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.min("doc_id").cast("long").alias("rep_doc_id"),
        )
        .filter(F.col("cluster_size") >= 2)
        .orderBy(F.desc("cluster_size"), "rep_doc_id")
        .limit(50)
    )


#: Scene-cut gate: mean-intensity jump (integer levels per pixel)
#: between consecutive frames that counts as a cut.
CUT_THRESHOLD = 8


def _make_frame(d: int, f: int) -> np.ndarray:
    """Frame f of clip d: the `_make_image` gradient advanced 11
    levels per frame — consecutive frames mostly shift a little, with
    occasional large wrap jumps, giving a realistic cut/no-cut mix."""
    w = d % 48 + 8
    h = d % 32 + 8
    return (
        (np.add.outer(3 * np.arange(h), np.arange(w)) + 7 * d + 11 * f) % 256
    ).astype(np.uint8)


SCENE_SCHEMA = "doc_id long, frame_idx long, pix_sum long, npix long"


def _frame_signatures(batches):
    """mapInPandas stage: REAL per-frame decode — each synthetic frame
    is encoded to P5 bytes, sniffed and decoded back (the same honest
    codec round-trip as `multimodal_decode_real`), and only the
    integer signature (pixel sum, pixel count) leaves the executor."""
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            n_frames = d % 10 + 1
            for f in range(n_frames):
                img = decode_netpbm(encode_pgm(_make_frame(d, f)))
                rows.append(
                    (d, f, int(img.sum(dtype=np.int64)), int(img.size))
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_idx", "pix_sum", "npix"]
        )


@query(
    "multimodal_scene_cut",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id, f,
             (doc_id % 48 + 8) * (doc_id % 32 + 8) AS npix
      FROM documents, unnest(range(0, doc_id % 10 + 1)) AS t(f)
    ),
    pix AS (
      SELECT fr.doc_id, fr.f, fr.npix,
             CAST(SUM((3 * i + j + 7 * fr.doc_id + 11 * fr.f) % 256)
                  AS BIGINT) AS pix_sum
      FROM frames fr,
           unnest(range(0, fr.doc_id % 32 + 8)) AS ti(i),
           unnest(range(0, fr.doc_id % 48 + 8)) AS tj(j)
      GROUP BY fr.doc_id, fr.f, fr.npix
    ),
    lagged AS (
      SELECT doc_id, f, npix, pix_sum,
             lag(pix_sum) OVER (PARTITION BY doc_id ORDER BY f) AS prev
      FROM pix
    )
    SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(abs(pix_sum - prev) AS BIGINT) AS delta_sum,
           CAST(npix AS BIGINT) AS npix
    FROM lagged
    WHERE prev IS NOT NULL
      AND abs(pix_sum - prev) >= {CUT_THRESHOLD} * npix
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "beyond"),
)
def q_multimodal_scene_cut(spark, sf_dir: str) -> DataFrame:
    """Scene-cut detection over video frames: decode every frame
    (REAL P5 encode→sniff→decode round-trip inside the Arrow batch,
    same honest path as `multimodal_decode_real`), keep only the
    integer signature per frame, and flag frames whose mean intensity
    jumps ≥ CUT_THRESHOLD levels vs the previous frame — the shot-
    boundary primitive video curation pipelines run before sampling
    training clips.

    The cut test is ALL-INTEGER: |pix_sum_f − pix_sum_{f−1}| ≥ T·npix
    (no float mean, no rounding boundary), so DuckDB's closed-form
    pixel-sum replay matches bit-for-bit and proves the real decode
    numerically, not just structurally. Scene detection itself is a
    NATIVE doc-keyed lag window — only the per-frame decode crosses
    the Python boundary, and each executor emits 2 longs per frame no
    matter the resolution. At 100 TB: frames arrive as real payload
    bytes co-partitioned by clip; the signature schema and window are
    unchanged."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select("doc_id")
    sig = docs.mapInPandas(_frame_signatures, schema=SCENE_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    lagged = sig.withColumn("prev", F.lag("pix_sum").over(w))
    return (
        lagged.filter(
            F.col("prev").isNotNull()
            & (
                F.abs(F.col("pix_sum") - F.col("prev"))
                >= CUT_THRESHOLD * F.col("npix")
            )
        )
        .select(
            "doc_id",
            "frame_idx",
            F.abs(F.col("pix_sum") - F.col("prev")).cast("long").alias(
                "delta_sum"
            ),
            "npix",
        )
        .orderBy("doc_id", "frame_idx")
    )


#: VAD geometry: equal frames per clip, activity = frame mean |sample|
#: above the threshold (integer cross-multiply, no division).
VAD_FRAMES = 16
VAD_THRESHOLD = 16380
VAD_MAX_DOC = 200

VAD_SCHEMA = (
    "doc_id long, n_active long, longest_run long, active_ratio_r6 double"
)


def _audio_vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame-energy VAD through the real WAV path: encode → sniff →
    decode, split into VAD_FRAMES frames, mark a frame voice-active
    when energy > threshold · n_frame_samples (integer compare), and
    report the active count, the longest active run and the ratio."""
    from job_market_research_spark.multimodal.codecs import (
        decode_wav,
        encode_wav_pcm16,
    )

    frames = VAD_FRAMES
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            n = d % 1600 + 160
            rate = 8000 + (d % 3) * 4000
            samples = (
                ((np.arange(n, dtype=np.int64) * (d + 3)) % 65521) - 32760
            ).astype(np.int16)
            decoded, _ = decode_wav(encode_wav_pcm16(samples, rate))
            s = np.abs(decoded.astype(np.int64))
            f = (np.arange(n) * frames) // n
            energy = np.bincount(f, weights=s, minlength=frames).astype(np.int64)
            cnt = np.bincount(f, minlength=frames).astype(np.int64)
            active = energy > VAD_THRESHOLD * cnt
            longest = run = 0
            for a in active:
                run = run + 1 if a else 0
                longest = max(longest, run)
            rows.append(
                (
                    d,
                    int(active.sum()),
                    longest,
                    round(float(active.sum()) / frames, 6),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_active", "longest_run", "active_ratio_r6"],
        )


@query(
    "multimodal_audio_vad",
    oracle=f"""
    WITH fr AS (
      SELECT doc_id, (ii.i * {VAD_FRAMES}) // ({_AUD_N}) AS f,
             SUM(ABS((ii.i * (doc_id + 3)) % 65521 - 32760)) AS energy,
             COUNT(*) AS cnt
      FROM documents, unnest(range(0, {_AUD_N})) AS ii(i)
      WHERE doc_id < {VAD_MAX_DOC}
      GROUP BY 1, 2
    ),
    act AS (
      SELECT doc_id, f FROM fr WHERE energy > {VAD_THRESHOLD} * cnt
    ),
    isl AS (
      SELECT doc_id,
             f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
      FROM act
    ),
    runs AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run
      FROM isl GROUP BY doc_id, grp
    ),
    per_doc AS (
      SELECT d.doc_id,
             CAST(COALESCE(a.n, 0) AS BIGINT) AS n_active,
             CAST(COALESCE(r.lr, 0) AS BIGINT) AS longest_run
      FROM (SELECT DISTINCT doc_id FROM fr) d
      LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM act GROUP BY doc_id) a
        USING (doc_id)
      LEFT JOIN (SELECT doc_id, MAX(run) AS lr FROM runs GROUP BY doc_id) r
        USING (doc_id)
    )
    SELECT doc_id, n_active, longest_run,
           round(CAST(n_active AS DOUBLE) / {VAD_FRAMES}, 6)
             AS active_ratio_r6
    FROM per_doc ORDER BY doc_id
    """,
)
def q_multimodal_audio_vad(spark, sf_dir: str) -> DataFrame:
    """Voice-activity detection over real-decoded WAV clips: the
    speech-data curation gate (drop silent clips, measure speech
    density, find the longest contiguous speech run for segmentation)
    expressed as frame-energy thresholding — the classic
    energy-based VAD, with the threshold compare as an integer
    cross-multiply so the DuckDB oracle replays every frame decision
    from the synthesis recipe (same discipline as the audio
    fingerprint; the gaps-and-islands longest-run is 16 frames/doc).

    Scale: the waveform never leaves the Arrow batch — only three
    integers + a ratio per clip return; no shuffle at all on the
    Spark side (per-clip reduction inside mapInPandas), ordered by
    the bounded probe set."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < VAD_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_audio_vad, schema=VAD_SCHEMA).orderBy("doc_id")


#: Deterministic JPEG recipe (oracle-replayable): per doc_id d, a
#: baseline-JPEG marker stream whose SOF0 carries w = d%200+16,
#: h = d%150+16, 1 or 3 components, preceded by a variable-length COM
#: segment (d%32 bytes) so the parser's segment-length walk — not a
#: fixed offset — locates the frame header.
_JPG_W = "doc_id % 200 + 16"
_JPG_H = "doc_id % 150 + 16"
_JPG_C = "1 + (doc_id % 2) * 2"
_JPG_COM = "doc_id % 32"
_JPG_MAX_DOC = 300
#: SOI(2) + APP0(18) + COM(4 + comment) puts DQT at 24+comment and the
#: SOF0 marker at 93+comment (DQT is 69 bytes: marker+len+65 table).
JPEG_META_SCHEMA = (
    "doc_id long, kind string, width long, height long,"
    " channels long, precision long, sof_offset long"
)


def _jpeg_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import encode_jpeg_headers

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = encode_jpeg_headers(
                width=d % 200 + 16,
                height=d % 150 + 16,
                components=1 + (d % 2) * 2,
                comment=b"x" * (d % 32),
            )
            meta = decode_media(payload)  # magic sniff -> header walk
            rows.append(
                (
                    d,
                    meta["kind"],
                    meta["width"],
                    meta["height"],
                    meta["channels"],
                    meta["precision"],
                    meta["sof_offset"],
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "kind",
                "width",
                "height",
                "channels",
                "precision",
                "sof_offset",
            ],
        )


@query(
    "multimodal_jpeg_meta",
    oracle=f"""
    SELECT doc_id, 'jpeg' AS kind,
           CAST({_JPG_W} AS BIGINT) AS width,
           CAST({_JPG_H} AS BIGINT) AS height,
           CAST({_JPG_C} AS BIGINT) AS channels,
           CAST(8 AS BIGINT) AS precision,
           CAST(93 + ({_JPG_COM}) AS BIGINT) AS sof_offset
    FROM documents
    WHERE doc_id < {_JPG_MAX_DOC}
    ORDER BY doc_id
    """,
)
def q_multimodal_jpeg_meta(spark, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG header metadata: assemble a genuine marker
    stream (SOI / APP0-JFIF / COM / DQT / SOF0 / EOI) per document,
    then magic-sniff and walk it by segment lengths to the SOF0 frame
    header — dimensions, component count, sample precision, and the
    SOF byte offset all come from parsing real bytes, not from the
    recipe. The variable-length COM segment shifts the frame header
    per row, so a parser that assumed fixed offsets (instead of
    honoring each segment's 2-byte length field) would fail the
    oracle. Pixel decode for JPEG stays behind NotImplementedError —
    this is the metadata pass a 100 TB image-curation pipeline runs
    first (dedup by dimensions, filter thumbnails, bucket by aspect
    ratio) without touching entropy-coded data.

    Scale: payloads are built and parsed inside one Arrow batch; only
    fixed-width header fields return to the JVM — identical plumbing
    to the parquet-sourced binary-column path."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _JPG_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_jpeg_meta, schema=JPEG_META_SCHEMA).orderBy("doc_id")


#: Deterministic PNG recipe: w = d%300+1, h = d%200+1, color type
#: cycling gray/RGB/RGBA (d%3 → 0/2/6), always 8-bit.
_PNG_W = "doc_id % 300 + 1"
_PNG_H = "doc_id % 200 + 1"
_PNG_CT = "CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 6 END"
_PNG_CH = "CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END"
_PNG_MAX_DOC = 300
PNG_META_SCHEMA = (
    "doc_id long, kind string, width long, height long, bit_depth long,"
    " color_type long, channels long, crc_ok boolean"
)


def _png_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import encode_png_headers

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = encode_png_headers(
                width=d % 300 + 1,
                height=d % 200 + 1,
                color_type=(0, 2, 6)[d % 3],
            )
            meta = decode_media(payload)  # magic sniff -> IHDR + CRC
            rows.append(
                (
                    d,
                    meta["kind"],
                    meta["width"],
                    meta["height"],
                    meta["bit_depth"],
                    meta["color_type"],
                    meta["channels"],
                    meta["crc_ok"],
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "kind",
                "width",
                "height",
                "bit_depth",
                "color_type",
                "channels",
                "crc_ok",
            ],
        )


@query(
    "multimodal_png_meta",
    oracle=f"""
    SELECT doc_id, 'png' AS kind,
           CAST({_PNG_W} AS BIGINT) AS width,
           CAST({_PNG_H} AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST({_PNG_CT} AS BIGINT) AS color_type,
           CAST({_PNG_CH} AS BIGINT) AS channels,
           TRUE AS crc_ok
    FROM documents
    WHERE doc_id < {_PNG_MAX_DOC}
    ORDER BY doc_id
    """,
)
def q_multimodal_png_meta(spark, sf_dir: str) -> DataFrame:
    """REAL PNG header metadata: assemble a genuine chunk stream
    (magic / IHDR with a correct CRC-32 / IEND) per document and parse
    it back — dimensions, bit depth, color type, and the derived
    channel count all come from the IHDR bytes, and `crc_ok` is a
    REAL zlib.crc32 re-computation over the chunk (a contract boolean
    in the sketch-oracle style: TRUE on any correct run, and a parser
    that skipped CRC verification or an encoder that mis-computed it
    fails the hash match). Pixel decode (IDAT inflate + per-scanline
    unfilter) stays behind NotImplementedError with JPEG's.

    Scale: identical Arrow-batch plumbing to multimodal_jpeg_meta —
    payloads never leave the executor, only fixed-width header fields
    return."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PNG_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_png_meta, schema=PNG_META_SCHEMA).orderBy("doc_id")


#: Deterministic EXIF recipe: orientation cycles 1..8, byte order
#: alternates little (II) / big (MM) per doc.
_EXIF_ORI = "doc_id % 8 + 1"
_EXIF_BO = "CASE WHEN doc_id % 2 = 1 THEN 'big' ELSE 'little' END"
_EXIF_MAX_DOC = 300
EXIF_META_SCHEMA = (
    "doc_id long, byte_order string, orientation long,"
    " width long, height long, needs_transpose boolean"
)


def _exif_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import (
        encode_exif_app1,
        encode_jpeg_headers,
        parse_jpeg_exif,
        parse_jpeg_header,
        splice_jpeg_app1,
    )

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = splice_jpeg_app1(
                encode_jpeg_headers(width=d % 200 + 16, height=d % 150 + 16, components=3),
                encode_exif_app1(orientation=d % 8 + 1, big_endian=bool(d % 2)),
            )
            exif = parse_jpeg_exif(payload)
            sof = parse_jpeg_header(payload)  # frame walk skips APP1
            rows.append(
                (
                    d,
                    exif["byte_order"],
                    exif["orientation"],
                    sof["width"],
                    sof["height"],
                    exif["orientation"] >= 5,  # 5-8 transpose axes
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "byte_order",
                "orientation",
                "width",
                "height",
                "needs_transpose",
            ],
        )


@query(
    "multimodal_exif_meta",
    oracle=f"""
    SELECT doc_id,
           {_EXIF_BO} AS byte_order,
           CAST({_EXIF_ORI} AS BIGINT) AS orientation,
           CAST(doc_id % 200 + 16 AS BIGINT) AS width,
           CAST(doc_id % 150 + 16 AS BIGINT) AS height,
           ({_EXIF_ORI}) >= 5 AS needs_transpose
    FROM documents
    WHERE doc_id < {_EXIF_MAX_DOC}
    ORDER BY doc_id
    """,
)
def q_multimodal_exif_meta(spark, sf_dir: str) -> DataFrame:
    """REAL EXIF orientation parse — the auto-rotate metadata every
    image-curation pipeline must honor before computing perceptual
    hashes or aspect-ratio buckets (orientations 5-8 transpose the
    axes, so stored width/height swap on display). Each document gets
    a genuine JPEG with an APP1/EXIF segment spliced after SOI: TIFF
    header with ALTERNATING byte order (II little / MM big endian),
    magic 42, IFD0 walk to the Orientation SHORT — an endian-blind
    parser reads orientation 256 for every MM row and fails the hash
    match, and the SOF0 dimensions prove the frame-header walk skips
    the APP1 segment by its length field.

    Scale: same Arrow-batch plumbing as the other header passes;
    fixed-width fields only cross to the JVM."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _EXIF_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_exif_meta, schema=EXIF_META_SCHEMA).orderBy("doc_id")


#: Deterministic GIF recipe: w = d%511+1 (exercises the little-endian
#: high byte), h = d%383+1, version alternates 87a/89a, GCT size field
#: cycles 0..7 (table size 2..256 colors).
_GIF_W = "doc_id % 511 + 1"
_GIF_H = "doc_id % 383 + 1"
_GIF_VER = "CASE WHEN doc_id % 2 = 0 THEN '87a' ELSE '89a' END"
_GIF_COLORS = "CAST(power(2, doc_id % 8 + 1) AS BIGINT)"
_GIF_MAX_DOC = 300
GIF_META_SCHEMA = (
    "doc_id long, kind string, version string, width long, height long,"
    " has_gct boolean, gct_colors long"
)


def _gif_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import encode_gif_headers

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = encode_gif_headers(
                width=d % 511 + 1,
                height=d % 383 + 1,
                gct_size_field=d % 8,
                version=b"87a" if d % 2 == 0 else b"89a",
            )
            meta = decode_media(payload)  # magic sniff -> screen descriptor
            rows.append(
                (
                    d,
                    meta["kind"],
                    meta["version"],
                    meta["width"],
                    meta["height"],
                    meta["has_gct"],
                    meta["gct_colors"],
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "kind",
                "version",
                "width",
                "height",
                "has_gct",
                "gct_colors",
            ],
        )


@query(
    "multimodal_gif_meta",
    oracle=f"""
    SELECT doc_id, 'gif' AS kind,
           {_GIF_VER} AS version,
           CAST({_GIF_W} AS BIGINT) AS width,
           CAST({_GIF_H} AS BIGINT) AS height,
           TRUE AS has_gct,
           {_GIF_COLORS} AS gct_colors
    FROM documents
    WHERE doc_id < {_GIF_MAX_DOC}
    ORDER BY doc_id
    """,
)
def q_multimodal_gif_meta(spark, sf_dir: str) -> DataFrame:
    """REAL GIF header metadata: assemble a genuine GIF87a/89a byte
    stream (signature, LITTLE-endian logical screen descriptor,
    packed GCT byte, global color table, trailer) per document and
    parse it back. Widths range to 511 so the u16 high byte is
    exercised — a big-endian parser (the natural bug after the
    JPEG/PNG parsers, which are big-endian) reads 256·(w%256) and
    fails the hash match; gct_colors proves the 2^(N+1) packed-field
    arithmetic. LZW frame decode stays behind NotImplementedError —
    this is the metadata pass (dimension/palette filters) a curation
    pipeline runs without touching compressed frames.

    Scale: payloads are built and parsed inside one Arrow batch; only
    fixed-width header fields return to the JVM — identical plumbing
    to multimodal_jpeg_meta / multimodal_png_meta."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _GIF_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_gif_meta, schema=GIF_META_SCHEMA).orderBy("doc_id")


#: Deterministic BMP recipe: w = d%601+1 (LE high byte exercised),
#: h = d%421+1, top-down rows for every third doc (SIGNED height),
#: bpp cycles the real palette/true-color ladder.
_BMP_MAX_DOC = 300
_BMP_BPPS = (1, 4, 8, 16, 24, 32)
BMP_META_SCHEMA = (
    "doc_id long, kind string, width long, height long,"
    " top_down boolean, bpp long, row_stride long, data_offset long"
)


def _bmp_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import encode_bmp_headers

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = encode_bmp_headers(
                width=d % 601 + 1,
                height=d % 421 + 1,
                bpp=_BMP_BPPS[d % len(_BMP_BPPS)],
                top_down=d % 3 == 0,
            )
            meta = decode_media(payload)  # magic sniff -> DIB header
            rows.append(
                (
                    d,
                    meta["kind"],
                    meta["width"],
                    meta["height"],
                    meta["top_down"],
                    meta["bpp"],
                    meta["row_stride"],
                    meta["data_offset"],
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "kind",
                "width",
                "height",
                "top_down",
                "bpp",
                "row_stride",
                "data_offset",
            ],
        )


@query(
    "multimodal_bmp_meta",
    oracle=f"""
    SELECT doc_id, 'bmp' AS kind,
           CAST(doc_id % 601 + 1 AS BIGINT) AS width,
           CAST(doc_id % 421 + 1 AS BIGINT) AS height,
           doc_id % 3 = 0 AS top_down,
           CAST(CASE doc_id % {len(_BMP_BPPS)}
                {" ".join(f"WHEN {i} THEN {b}" for i, b in enumerate(_BMP_BPPS))}
                END AS BIGINT) AS bpp,
           CAST(((CASE doc_id % {len(_BMP_BPPS)}
                  {" ".join(f"WHEN {i} THEN {b}" for i, b in enumerate(_BMP_BPPS))}
                  END) * (doc_id % 601 + 1) + 31) // 32 * 4 AS BIGINT)
             AS row_stride,
           CAST(54 AS BIGINT) AS data_offset
    FROM documents
    WHERE doc_id < {_BMP_MAX_DOC}
    ORDER BY doc_id
    """,
)
def q_multimodal_bmp_meta(spark, sf_dir: str) -> DataFrame:
    """REAL BMP header metadata: assemble a genuine BM file header +
    BITMAPINFOHEADER per document and parse it back. The fields that
    make this a real parser test: dimensions are SIGNED little-endian
    i32 (a negative height means top-down row order — every third doc
    here, so a parser that reads u32 emits 4-billion heights and
    fails the hash), and row_stride replays the 4-byte alignment
    arithmetic ((bpp·w+31)//32·4) across the 1/4/8/16/24/32-bpp
    ladder — the padding rule that breaks naive w·bpp/8 readers on
    five of the six bpp values.

    Scale: payloads built and parsed inside one Arrow batch; only
    fixed-width header fields cross to the JVM — identical plumbing
    to the JPEG/PNG/GIF header passes."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BMP_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_bmp_meta, schema=BMP_META_SCHEMA).orderBy("doc_id")


#: Deterministic WAV recipe for the RIFF walk: n samples varies so the
#: data-chunk size and the container size both move with doc_id.
_RIFF_MAX_DOC = 300
RIFF_SCHEMA = (
    "doc_id long, form string, riff_size long, chunk_id string,"
    " chunk_size long, chunk_offset long"
)


def _riff_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import (
        encode_wav_pcm16,
        walk_riff_chunks,
    )

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            n = d % 1000 + 1
            samples = (np.arange(n, dtype=np.int64) * (d + 7) % 20011).astype(
                "<i2"
            )
            payload = encode_wav_pcm16(samples, 8000 + (d % 3) * 4000)
            for c in walk_riff_chunks(payload):
                rows.append(
                    (d, c["form"], c["riff_size"], c["chunk_id"], c["size"],
                     c["offset"])
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "form",
                "riff_size",
                "chunk_id",
                "chunk_size",
                "chunk_offset",
            ],
        )


@query(
    "multimodal_riff_chunks",
    oracle=f"""
    SELECT doc_id, 'WAVE' AS form,
           CAST(4 + 8 + 16 + 8 + 2 * (doc_id % 1000 + 1) AS BIGINT)
             AS riff_size,
           c.chunk_id,
           CAST(CASE c.chunk_id WHEN 'fmt ' THEN 16
                ELSE 2 * (doc_id % 1000 + 1) END AS BIGINT) AS chunk_size,
           CAST(CASE c.chunk_id WHEN 'fmt ' THEN 12 ELSE 36 END AS BIGINT)
             AS chunk_offset
    FROM documents,
         (VALUES ('fmt '), ('data')) AS c(chunk_id)
    WHERE doc_id < {_RIFF_MAX_DOC}
    ORDER BY doc_id, chunk_offset
    """,
)
def q_multimodal_riff_chunks(spark, sf_dir: str) -> DataFrame:
    """REAL RIFF container walk: build a genuine PCM16 WAV per
    document (stdlib `wave` — real fmt/data chunks, little-endian u32
    sizes) and enumerate its top-level chunks by walking (id, size)
    headers with the word-alignment pad rule — the triage pass a
    media pipeline runs to route containers (WAVE/AVI/WebP are all
    RIFF) before any codec is chosen. The oracle derives every
    field — container size 4+8+16+8+2n, fmt at offset 12, data at 36,
    data size 2n — from the recipe arithmetic, so a walker that
    misreads the size field or forgets the 8-byte chunk header breaks
    the hash on the first variable-length document.

    Scale: payloads built and walked inside one Arrow batch; only the
    chunk inventory (fixed-width fields) crosses to the JVM."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _RIFF_MAX_DOC)
        .select("doc_id")
    )
    return (
        docs.mapInPandas(_riff_chunks, schema=RIFF_SCHEMA)
        .orderBy("doc_id", "chunk_offset")
    )


#: Deterministic ID3 recipe: sizes cross the 7-bit carry boundaries
#: (127→128, 16383→16384) where a non-syncsafe reader breaks.
_ID3_MAX_DOC = 300
ID3_META_SCHEMA = (
    "doc_id long, kind string, version long, unsync boolean,"
    " tag_size long"
)


def _id3_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import (
        encode_id3v2_header,
        parse_id3v2_header,
    )

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            size = (d * 131) % 20000  # crosses 127/128 and 16383/16384
            payload = encode_id3v2_header(
                size, version=3 + d % 2, unsync=d % 3 == 0
            )
            meta = parse_id3v2_header(payload)
            rows.append(
                (d, meta["kind"], meta["version"], meta["unsync"],
                 meta["tag_size"])
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "kind", "version", "unsync", "tag_size"]
        )


@query(
    "multimodal_id3_meta",
    oracle=f"""
    SELECT doc_id, 'id3' AS kind,
           CAST(3 + doc_id % 2 AS BIGINT) AS version,
           doc_id % 3 = 0 AS unsync,
           CAST((doc_id * 131) % 20000 AS BIGINT) AS tag_size
    FROM documents
    WHERE doc_id < {_ID3_MAX_DOC}
    ORDER BY doc_id
    """,
)
def q_multimodal_id3_meta(spark, sf_dir: str) -> DataFrame:
    """REAL ID3v2 (MP3 tag) header metadata: assemble a genuine 10-byte
    ID3 header + padding per document and parse it back. The field
    that makes this a real parser test is the SYNCSAFE tag size —
    7 bits per byte so no byte can alias an MPEG frame-sync pattern;
    the recipe's sizes sweep across the 127→128 and 16383→16384
    carry boundaries where a plain big-endian u32 reader inflates the
    size (128 reads as 256, 16384 as 65536) and the hash breaks.
    Audio-curation pipelines run exactly this pass to skip tag blocks
    before touching MPEG frames.

    Scale: payloads built and parsed inside one Arrow batch — same
    plumbing as the other header passes."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _ID3_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_id3_meta, schema=ID3_META_SCHEMA).orderBy(
        "doc_id"
    )


#: Deterministic FLAC recipe: rates cycle real studio/web values,
#: channel/bps ladders sweep the bit-packed fields off byte edges.
_FLAC_MAX_DOC = 300
_FLAC_RATES = (8000, 16000, 22050, 44100, 48000, 96000)
FLAC_META_SCHEMA = (
    "doc_id long, kind string, sample_rate long, channels long,"
    " bits_per_sample long, total_samples long"
)


def _flac_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import (
        encode_flac_streaminfo,
        parse_flac_streaminfo,
    )

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            payload = encode_flac_streaminfo(
                sample_rate=_FLAC_RATES[d % len(_FLAC_RATES)],
                channels=d % 8 + 1,
                bits_per_sample=4 + (d * 7) % 29,
                total_samples=(d * 1_000_003) % (1 << 36),
            )
            meta = parse_flac_streaminfo(payload)
            rows.append(
                (d, meta["kind"], meta["sample_rate"], meta["channels"],
                 meta["bits_per_sample"], meta["total_samples"])
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "kind", "sample_rate", "channels",
                "bits_per_sample", "total_samples",
            ],
        )


@query(
    "multimodal_flac_meta",
    oracle=f"""
    SELECT doc_id, 'flac' AS kind,
           CAST(CASE doc_id % {len(_FLAC_RATES)}
                {" ".join(f"WHEN {i} THEN {r}" for i, r in enumerate(_FLAC_RATES))}
                END AS BIGINT) AS sample_rate,
           CAST(doc_id % 8 + 1 AS BIGINT) AS channels,
           CAST(4 + (doc_id * 7) % 29 AS BIGINT) AS bits_per_sample,
           CAST((doc_id * 1000003) % {1 << 36} AS BIGINT) AS total_samples
    FROM documents
    WHERE doc_id < {_FLAC_MAX_DOC}
    ORDER BY doc_id
    """,
)
def q_multimodal_flac_meta(spark, sf_dir: str) -> DataFrame:
    """REAL FLAC STREAMINFO metadata: assemble a genuine fLaC header
    per document and parse it back. The parse class this adds over
    the other codecs is BIT-PACKED fields — sample rate (20 bits),
    channels−1 (3), bits-per-sample−1 (5), and a 36-bit total-sample
    count share one 64-bit big-endian span, so NONE of them sits on a
    byte boundary; the recipe sweeps channel and bps ladders so every
    shift/mask is load-bearing (a byte-aligned reader gets all four
    fields wrong on every row). Audio-curation pipelines read exactly
    this block to compute duration = total_samples / sample_rate
    without decoding frames.

    Scale: payloads built and parsed inside one Arrow batch — the
    standard header-pass plumbing."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _FLAC_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_flac_meta, schema=FLAC_META_SCHEMA).orderBy(
        "doc_id"
    )


# ------------------------------------------------------------ mp4/iso-bmff

#: Ladders sweep every parse path: both mvhd versions (32- vs 64-bit
#: durations — the v1 rows carry durations past 2^32 so the wide read
#: is load-bearing), all four brands, five timescales, 0-4 trak boxes,
#: and every third moov uses the 64-bit largesize header form.
_MP4_MAX_DOC = 300
_MP4_BRANDS = ("isom", "mp42", "avc1", "3gp4")
_MP4_TIMESCALES = (600, 1000, 90000, 44100, 48000)
MP4_META_SCHEMA = (
    "doc_id long, kind string, brand string, mvhd_version long,"
    " timescale long, duration_units long, duration_ms long,"
    " track_count long"
)


def _mp4_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import (
        encode_mp4_boxes,
        parse_mp4_meta,
    )

    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            version = d % 2
            duration = version * (1 << 32) + (d * 7919) % (1 << 32)
            payload = encode_mp4_boxes(
                brand=_MP4_BRANDS[d % len(_MP4_BRANDS)].encode(),
                timescale=_MP4_TIMESCALES[d % len(_MP4_TIMESCALES)],
                duration=duration,
                track_count=d % 5,
                mvhd_version=version,
                moov_largesize=(d % 3 == 0),
            )
            meta = parse_mp4_meta(payload)
            rows.append(
                (
                    d,
                    meta["kind"],
                    meta["brand"],
                    meta["mvhd_version"],
                    meta["timescale"],
                    meta["duration"],
                    int(meta["duration"] * 1000 // meta["timescale"]),
                    meta["track_count"],
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "kind", "brand", "mvhd_version", "timescale",
                "duration_units", "duration_ms", "track_count",
            ],
        )


@query(
    "multimodal_mp4_meta",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(doc_id % 2 AS BIGINT) AS mvhd_version,
             CAST(CASE doc_id % {len(_MP4_TIMESCALES)}
                  {" ".join(f"WHEN {i} THEN {t}" for i, t in enumerate(_MP4_TIMESCALES))}
                  END AS BIGINT) AS timescale,
             CAST(doc_id % 2 AS BIGINT) * 4294967296
               + (doc_id * 7919) % 4294967296 AS duration_units
      FROM documents WHERE doc_id < {_MP4_MAX_DOC}
    )
    SELECT doc_id, 'mp4' AS kind,
           CASE doc_id % {len(_MP4_BRANDS)}
             {" ".join(f"WHEN {i} THEN '{b}'" for i, b in enumerate(_MP4_BRANDS))}
           END AS brand,
           mvhd_version, timescale, duration_units,
           CAST(duration_units * 1000 // timescale AS BIGINT) AS duration_ms,
           CAST(doc_id % 5 AS BIGINT) AS track_count
    FROM m ORDER BY doc_id
    """,
)
def q_multimodal_mp4_meta(spark, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF (MP4) metadata: assemble a genuine ftyp+moov box
    stream per document and parse it back — brand, mvhd version,
    timescale, duration, track count. The parse classes this adds
    over the other codecs are NESTED CONTAINER boxes (moov's body is
    itself a box stream the walker must descend into), the size==1
    64-bit largesize header form (swept on every third doc), and
    VERSION-DEPENDENT field widths (mvhd v1 rows carry durations past
    2^32, so a 32-bit-only reader fails on half the corpus).
    duration_ms = duration*1000 // timescale is the integer-exact
    derived feature a video-curation pass filters on (both engines
    compute it from the same exact integers). Mirrors the reference's
    metadata-only media handling (/root/reference has no video path;
    this is the beyond-reference training-data-pipeline surface).

    Scale: payloads built and parsed inside one Arrow batch — the
    standard header-pass plumbing; only fixed-width features return
    to the JVM."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _MP4_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_mp4_meta, schema=MP4_META_SCHEMA).orderBy(
        "doc_id"
    )


#: Deterministic WebP recipe: variant rotates through the three spec
#: bitstream chunks; dims exercise both little-endian field widths
#: (u16-masked 14-bit for VP8/VP8L, 24-bit for VP8X).
_WEBP_MAX_DOC = 300
WEBP_META_SCHEMA = (
    "doc_id long, variant string, width long, height long,"
    " alpha boolean, riff_size long"
)


def _webp_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from job_market_research_spark.multimodal.codecs import (
        encode_webp_headers,
        parse_webp_header,
    )

    variants = ["VP8 ", "VP8L", "VP8X"]
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            d = int(d)
            variant = variants[d % 3]
            alpha = d % 2 == 0 and variant != "VP8 "
            payload = encode_webp_headers(
                variant,
                width=1 + (d * 37) % 14000,
                height=1 + (d * 53) % 9000,
                alpha=alpha,
            )
            meta = parse_webp_header(payload)  # magic sniff -> frame header
            riff_size = int.from_bytes(payload[4:8], "little")
            rows.append(
                (d, meta["variant"], meta["width"], meta["height"],
                 meta["alpha"], riff_size)
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "variant", "width", "height", "alpha", "riff_size",
            ],
        )


@query(
    "multimodal_webp_meta",
    oracle=f"""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'VP8 ' WHEN 1 THEN 'VP8L'
                ELSE 'VP8X' END AS variant,
           CAST(1 + (doc_id * 37) % 14000 AS BIGINT) AS width,
           CAST(1 + (doc_id * 53) % 9000 AS BIGINT) AS height,
           (doc_id % 2 = 0 AND doc_id % 3 <> 0) AS alpha,
           CAST(CASE doc_id % 3 WHEN 1 THEN 18 ELSE 22 END AS BIGINT)
             AS riff_size
    FROM documents WHERE doc_id < {_WEBP_MAX_DOC}
    ORDER BY doc_id
    """,
)
def q_multimodal_webp_meta(spark, sf_dir: str) -> DataFrame:
    """REAL WebP metadata: assemble a genuine RIFF/'WEBP' container per
    document around one of the three spec bitstream chunks and parse it
    back — variant, dimensions, alpha flag, container size. WebP is the
    dominant modern format of web-scraped image corpora, and its three
    header layouts differ in exactly the ways that break naive parsers:
    'VP8 ' hides a keyframe start code between the frame tag and the
    u16 dims whose top 2 bits are SCALE fields (mask or misread 4x-off
    sizes); 'VP8L' packs width-1/height-1/alpha into one little-endian
    32-bit bitstream (+1 bias and bit offsets must be exact); 'VP8X'
    uses 24-bit little-endian canvas fields. VP8L's 5-byte body also
    forces the RIFF odd-size pad rule (stored size excludes the pad),
    so the emitted riff_size catches a walker that counts it. The
    oracle replays every field from the recipe arithmetic. Extends the
    multimodal header-pass family (multimodal_riff_chunks walks the
    container generically; this decodes the format-specific frame
    headers). Beyond-reference training-data-pipeline surface
    (/root/reference has no media path).

    Scale: payloads built and parsed inside one Arrow batch; only
    fixed-width header fields cross to the JVM — the binary column
    never shuffles."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _WEBP_MAX_DOC)
        .select("doc_id")
    )
    return docs.mapInPandas(_webp_meta, schema=WEBP_META_SCHEMA).orderBy(
        "doc_id"
    )
