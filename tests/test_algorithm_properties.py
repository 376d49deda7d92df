"""Property-based tests (hypothesis, pure Python — no Spark job per
example) for the round-5 algorithmic kernels. Oracle parity already
pins Spark == DuckDB on the driver fixtures; these pin the ALGORITHMS
against their defining invariants on arbitrary inputs:

- water-filling: never over budget, saturation set exactly the prefix
  below the waterline, remainder bounded by |sources|
- content-defined chunking: chunks partition the text, and boundaries
  strictly after an edit's influence window are identical (the
  insertion-robustness CDC exists for)
- KMV sketches: min-k of unioned per-part min-ks equals the global
  min-k under ANY split (merge-invariance — what makes the streaming
  variant equal the batch sketch)
- exponential-race sampling: winners are stable under removal of any
  non-winner (consistency of without-replacement weighted draws)
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from job_market_research_spark.ml.neardup import (
    CDC_B,
    CDC_M,
    CDC_MASK,
    CDC_W,
)

FAST = settings(max_examples=200, deadline=None)


def waterfill(tokens: list[int], budget: int) -> list[tuple[int, int, bool]]:
    """Python replica of mixture_token_budget's closed form:
    [(tokens, allocated, saturated)] in input order."""
    order = sorted(range(len(tokens)), key=lambda i: (tokens[i], i))
    m = len(tokens)
    prefix, i_star, sat_sum = 0, 0, 0
    sat = set()
    for rank, idx in enumerate(order, start=1):
        t = tokens[idx]
        if t * (m - rank + 1) <= budget - prefix:
            sat.add(idx)
            i_star, sat_sum = rank, prefix + t
        prefix += t
    out = []
    for idx, t in enumerate(tokens):
        if idx in sat:
            out.append((t, t, True))
        else:
            theta = (budget - sat_sum) // (m - i_star) if m > i_star else 0
            out.append((t, min(t, theta), False))
    return out


@FAST
@given(
    tokens=st.lists(st.integers(1, 10**6), min_size=1, max_size=30),
    budget=st.integers(1, 3 * 10**6),
)
def test_waterfill_invariants(tokens, budget):
    alloc = waterfill(tokens, budget)
    total = sum(a for _, a, _ in alloc)
    corpus = sum(tokens)
    if corpus <= budget:
        assert all(sat for _, _, sat in alloc)
        assert total == corpus
    else:
        assert total <= budget
        assert budget - total < len(tokens) + max(tokens)
        # saturated sources are exactly those at-or-below every
        # unsaturated allocation (prefix property)
        unsat_allocs = [a for _, a, sat in alloc if not sat]
        if unsat_allocs:
            floor = min(unsat_allocs)
            for t, a, sat in alloc:
                if sat:
                    assert a == t <= floor + max(tokens)


def cdc_chunks(text: str) -> list[str]:
    bs = []
    for i in range(CDC_W, len(text) + 1):
        h = (
            sum(ord(text[i - 1 - k]) * (CDC_B**k) for k in range(CDC_W))
            % CDC_M
        )
        if h % CDC_MASK == 0:
            bs.append(i)
    bs = [0] + bs + [len(text)]
    return [text[a:b] for a, b in zip(bs, bs[1:]) if b > a]


@FAST
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=CDC_W,
        max_size=300,
    ),
    ins=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=30,
    ),
    pos_frac=st.floats(0.0, 1.0),
)
def test_cdc_partition_and_edit_locality(text, ins, pos_frac):
    chunks = cdc_chunks(text)
    assert "".join(chunks) == text
    pos = int(pos_frac * len(text))
    edited = text[:pos] + ins + text[pos:]
    echunks = cdc_chunks(edited)
    assert "".join(echunks) == edited
    # boundaries at-or-after pos are recomputed over content shifted by
    # len(ins); any original boundary b >= pos + W survives at
    # b + len(ins) because its hash window never overlaps the edit
    orig_bounds = {
        i
        for i in range(CDC_W, len(text) + 1)
        if sum(ord(text[i - 1 - k]) * (CDC_B**k) for k in range(CDC_W))
        % CDC_M
        % CDC_MASK
        == 0
    }
    edit_bounds = {
        i
        for i in range(CDC_W, len(edited) + 1)
        if sum(ord(edited[i - 1 - k]) * (CDC_B**k) for k in range(CDC_W))
        % CDC_M
        % CDC_MASK
        == 0
    }
    for b in orig_bounds:
        if b >= pos + CDC_W:
            assert b + len(ins) in edit_bounds


def kmv_k(hashes, k=8):
    return sorted(set(hashes))[:k]


@FAST
@given(
    items=st.lists(st.integers(0, 10**9), min_size=0, max_size=200),
    cut=st.integers(0, 200),
)
def test_kmv_merge_invariance(items, cut):
    cut = min(cut, len(items))
    part_a, part_b = items[:cut], items[cut:]
    merged = kmv_k(kmv_k(part_a) + kmv_k(part_b))
    assert merged == kmv_k(items)


@FAST
@given(
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=50, unique=True),
    k=st.integers(1, 10),
)
def test_race_winners_stable_under_nonwinner_removal(ids, k):
    def key(i):
        u = (
            int(hashlib.md5(f"gum-v1#{i}".encode()).hexdigest()[:8], 16) + 0.5
        ) / 2**32
        import math

        w = (i % 97) + 1.0
        return (-math.log(u) / w, i)

    ranked = sorted(ids, key=key)
    winners = ranked[: min(k, len(ids))]
    losers = [i for i in ids if i not in winners]
    if losers:
        reduced = [i for i in ids if i != losers[-1]]
        again = sorted(reduced, key=key)[: min(k, len(reduced))]
        assert again == winners


# ---------------------------------------------------------- media headers


from job_market_research_spark.multimodal import codecs as _codecs


@FAST
@given(
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    ncomp=st.integers(1, 4),
    comment=st.binary(max_size=64),
)
def test_jpeg_header_roundtrip_property(w, h, ncomp, comment):
    meta = _codecs.parse_jpeg_header(
        _codecs.encode_jpeg_headers(w, h, ncomp, comment=comment)
    )
    assert (meta["width"], meta["height"], meta["channels"]) == (w, h, ncomp)
    assert meta["precision"] == 8


@FAST
@given(
    w=st.integers(1, 2**31 - 1),
    h=st.integers(1, 2**31 - 1),
    ct=st.sampled_from([0, 2, 3, 4, 6]),
)
def test_png_header_roundtrip_property(w, h, ct):
    meta = _codecs.parse_png_header(_codecs.encode_png_headers(w, h, color_type=ct))
    assert (meta["width"], meta["height"], meta["color_type"]) == (w, h, ct)
    assert meta["crc_ok"] is True


@FAST
@given(w=st.integers(1, 1000), h=st.integers(1, 1000), flip=st.integers(16, 28))
def test_png_any_single_ihdr_corruption_is_detected(w, h, flip):
    """CRC-32 detects EVERY single-byte corruption of the 13-byte IHDR
    data (offsets 16..28 cover data; flipping any bit there must
    break the stored CRC)."""
    payload = bytearray(_codecs.encode_png_headers(w, h))
    payload[flip] ^= 0x01
    # skip flips that undo themselves (none here: xor 0x01 always flips)
    meta = _codecs.parse_png_header(bytes(payload))
    assert meta["crc_ok"] is False


@FAST
@given(orientation=st.integers(1, 8), big=st.booleans(), w=st.integers(16, 65535))
def test_exif_roundtrip_property(orientation, big, w):
    jpeg = _codecs.splice_jpeg_app1(
        _codecs.encode_jpeg_headers(w, 32, 3),
        _codecs.encode_exif_app1(orientation=orientation, big_endian=big),
    )
    exif = _codecs.parse_jpeg_exif(jpeg)
    assert exif["orientation"] == orientation
    assert exif["byte_order"] == ("big" if big else "little")
    # the frame walk must still find SOF0 past the spliced APP1
    assert _codecs.parse_jpeg_header(jpeg)["width"] == w


@FAST
@given(
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    gct=st.integers(0, 7),
    ver=st.sampled_from([b"87a", b"89a"]),
)
def test_gif_header_roundtrip_property(w, h, gct, ver):
    meta = _codecs.parse_gif_header(
        _codecs.encode_gif_headers(w, h, gct_size_field=gct, version=ver)
    )
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["version"] == ver.decode()
    assert meta["has_gct"] is True
    assert meta["gct_colors"] == 2 ** (gct + 1)


@FAST
@given(
    w=st.integers(1, 30_000),
    h=st.integers(1, 30_000),
    bpp=st.sampled_from([1, 4, 8, 16, 24, 32]),
    td=st.booleans(),
)
def test_bmp_header_roundtrip_property(w, h, bpp, td):
    meta = _codecs.parse_bmp_header(
        _codecs.encode_bmp_headers(w, h, bpp=bpp, top_down=td)
    )
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["top_down"] is td
    assert meta["bpp"] == bpp
    # 4-byte alignment: stride is the smallest multiple of 4 holding
    # bpp*w bits
    assert meta["row_stride"] % 4 == 0
    assert meta["row_stride"] * 8 >= bpp * w
    assert (meta["row_stride"] - 4) * 8 < bpp * w
    assert _codecs.sniff_kind(b"BM\x00") == "bmp"


@FAST
@given(n=st.integers(1, 4000), rate=st.sampled_from([8000, 16000, 44100]))
def test_riff_walk_property(n, rate):
    import numpy as np

    wav = _codecs.encode_wav_pcm16(np.zeros(n, dtype="<i2"), rate)
    chunks = _codecs.walk_riff_chunks(wav)
    ids = [c["chunk_id"] for c in chunks]
    assert ids == ["fmt ", "data"]
    assert chunks[0]["size"] == 16 and chunks[0]["offset"] == 12
    assert chunks[1]["size"] == 2 * n and chunks[1]["offset"] == 36
    # container size covers everything after the 8-byte RIFF header
    assert chunks[0]["riff_size"] == len(wav) - 8


@FAST
@given(size=st.integers(0, (1 << 28) - 1), ver=st.sampled_from([3, 4]),
       unsync=st.booleans())
def test_id3_syncsafe_roundtrip_property(size, ver, unsync):
    meta = _codecs.parse_id3v2_header(
        _codecs.encode_id3v2_header(size, version=ver, unsync=unsync)
    )
    assert meta["tag_size"] == size
    assert meta["version"] == ver and meta["unsync"] is unsync
    # syncsafe invariant: no stored size byte may have the high bit
    raw = _codecs.encode_id3v2_header(size)
    assert all(b < 0x80 for b in raw[6:10])


@FAST
@given(
    rate=st.integers(1, (1 << 20) - 1),
    ch=st.integers(1, 8),
    bps=st.integers(4, 32),
    total=st.integers(0, (1 << 36) - 1),
)
def test_flac_streaminfo_bitpack_roundtrip(rate, ch, bps, total):
    m = _codecs.parse_flac_streaminfo(
        _codecs.encode_flac_streaminfo(rate, ch, bps, total)
    )
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"],
            m["total_samples"]) == (rate, ch, bps, total)
    assert m["is_last_block"] and m["block_len"] == 34


@given(
    brand=st.sampled_from([b"isom", b"mp42", b"avc1", b"3gp4", b"qt  "]),
    timescale=st.integers(min_value=1, max_value=2**32 - 1),
    version=st.integers(min_value=0, max_value=1),
    duration_small=st.integers(min_value=0, max_value=2**32 - 1),
    duration_big=st.integers(min_value=2**32, max_value=2**40),
    tracks=st.integers(min_value=0, max_value=12),
    largesize=st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_mp4_roundtrip_property(
    brand, timescale, version, duration_small, duration_big, tracks, largesize
):
    """Any encodable (brand, timescale, duration, tracks, version,
    largesize) combination parses back exactly — including v1-only
    durations past 2^32 and the 64-bit box-header form."""
    duration = duration_big if version == 1 else duration_small
    payload = _codecs.encode_mp4_boxes(
        brand=brand,
        timescale=timescale,
        duration=duration,
        track_count=tracks,
        mvhd_version=version,
        moov_largesize=largesize,
    )
    meta = _codecs.parse_mp4_meta(payload)
    assert meta == {
        "kind": "mp4",
        "brand": brand.decode("latin-1"),
        "mvhd_version": version,
        "timescale": timescale,
        "duration": duration,
        "track_count": tracks,
    }
