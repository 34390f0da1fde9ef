"""PNG / WAV codec tests (functions/png.py, functions/wav.py).

The forward filters in ``_filtered_png`` are written here independently of
the decoder's inverse filters — a bug in either side breaks the roundtrip,
so the five PNG predictor paths are genuinely cross-checked, not mirrored.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from australis_indexer_spark.functions.png import (
    _paeth,
    decode_png,
    encode_png,
)
from australis_indexer_spark.functions.wav import decode_wav, encode_wav


@given(
    st.integers(1, 12),
    st.integers(1, 10),
    st.sampled_from([0, 2, 6]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, color_type, seed):
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    rows = [
        bytes((seed + y * 131 + x * 7) % 256 for x in range(w * ch))
        for y in range(h)
    ]
    got = decode_png(encode_png(w, h, rows, color_type))
    assert got == (w, h, ch, rows)


def _filtered_png(w, h, rows, ftype, ch=3):
    """Build a PNG whose every scanline uses filter `ftype`, with the
    FORWARD filter computed here (independent of the decoder)."""
    out = bytearray()
    prev = bytes(w * ch)
    for r in rows:
        line = bytearray(r)
        if ftype == 1:
            for x in range(len(r) - 1, ch - 1, -1):
                line[x] = (line[x] - r[x - ch]) & 0xFF
        elif ftype == 2:
            for x in range(len(r)):
                line[x] = (line[x] - prev[x]) & 0xFF
        elif ftype == 3:
            for x in range(len(r)):
                a = r[x - ch] if x >= ch else 0
                line[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:
            for x in range(len(r)):
                a = r[x - ch] if x >= ch else 0
                c = prev[x - ch] if x >= ch else 0
                line[x] = (line[x] - _paeth(a, prev[x], c)) & 0xFF
        out += bytes([ftype]) + bytes(line)
        prev = r
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types_decode(ftype):
    w, h = 7, 5
    rows = [
        bytes((y * 37 + x * 11 + ftype) % 256 for x in range(w * 3))
        for y in range(h)
    ]
    assert decode_png(_filtered_png(w, h, rows, ftype)) == (w, h, 3, rows)


def test_png_crc_enforced():
    blob = bytearray(encode_png(2, 2, [b"\x00" * 6, b"\xff" * 6]))
    blob[-6] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_png_split_idat_decodes():
    """IDAT may be split across chunks at any byte boundary."""
    w, h = 4, 3
    rows = [bytes(range(y * 12, y * 12 + 12)) for y in range(h)]
    whole = encode_png(w, h, rows)
    # re-split the single IDAT into two chunks
    sig, rest = whole[:8], whole[8:]
    (ln,) = struct.unpack_from(">I", rest, 0)
    ihdr = rest[: 12 + ln]
    rest = rest[12 + ln :]
    (ln,) = struct.unpack_from(">I", rest, 0)
    idat_body = rest[8 : 8 + ln]
    iend = rest[12 + ln :]
    mid = len(idat_body) // 2

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    split = sig + ihdr + chunk(b"IDAT", idat_body[:mid]) + chunk(
        b"IDAT", idat_body[mid:]
    ) + iend
    assert decode_png(split) == (w, h, 3, rows)


@given(
    st.integers(1, 2),
    st.sampled_from([8000, 16000, 44100]),
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n_channels, rate, samples):
    if len(samples) % n_channels:
        samples = samples[: len(samples) - len(samples) % n_channels]
    if not samples:
        samples = [0] * n_channels
    blob = encode_wav(rate, samples, n_channels)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert decode_wav(blob) == (rate, n_channels, samples)


def test_wav_tolerates_extra_chunks():
    """Real writers put LIST/INFO chunks before data — the parser walks
    chunks rather than assuming the canonical 44-byte layout."""
    blob = encode_wav(8000, [1, -2, 3])
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    assert decode_wav(spliced) == (8000, 1, [1, -2, 3])


def test_multimodal_decode_real_op(spark, ops):
    """The registered op end-to-end at smoke scale: PNG/WAV/JPEG rows
    carry geometry + value sums matching an independent pure-Python
    recompute of the closed-form generators; mp4 rows are the documented
    env stub."""
    from australis_indexer_spark.operators.multimodal import (
        _real_geom,
        _real_jblock,
        _real_pixel,
        _real_sample,
    )
    from tests.conftest import SF_SMOKE

    rows = ops["multimodal_decode_real"].fn(spark, SF_SMOKE).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add(r["decoder"])
        d = r["doc_id"]
        w, h, n = _real_geom(d)
        if r["decoder"] == "png":
            assert (r["width"], r["height"]) == (w, h)
            expect = sum(
                _real_pixel(d, x, y, c)
                for x in range(w)
                for y in range(h)
                for c in range(3)
            )
            assert (r["n_values"], r["value_sum"]) == (w * h * 3, expect)
        elif r["decoder"] == "wav":
            assert r["n_values"] == n
            assert r["value_sum"] == sum(_real_sample(d, k) for k in range(n))
        elif r["decoder"] == "jpeg":
            assert (r["width"], r["height"]) == (w, h)
            expect = sum(
                _real_jblock(d, x // 8, y // 8)
                for x in range(w)
                for y in range(h)
            )
            assert (r["n_values"], r["value_sum"]) == (w * h, expect)
        else:
            assert r["decoder"] == "env-stub-mp4"
            assert r["value_sum"] is None
    assert seen == {"png", "wav", "jpeg", "env-stub-mp4"}


def test_multimodal_resize_real_op(spark, ops):
    """Nearest-neighbor resample of decoded PNGs AND JPEGs matches an
    independent pure-Python recompute at the integer sampling positions."""
    from australis_indexer_spark.operators.multimodal import (
        _RESIZE_T,
        _real_geom,
        _real_jblock,
        _real_pixel,
    )
    from tests.conftest import SF_SMOKE

    rows = ops["multimodal_resize_real"].fn(spark, SF_SMOKE).collect()
    assert rows
    codecs = set()
    for r in rows:
        codecs.add(r["codec"])
        d = r["doc_id"]
        w, h, _ = _real_geom(d)
        assert (r["src_w"], r["src_h"]) == (w, h)
        if r["codec"] == "png":
            expect = sum(
                _real_pixel(d, tx * w // _RESIZE_T, ty * h // _RESIZE_T, c)
                for tx in range(_RESIZE_T)
                for ty in range(_RESIZE_T)
                for c in range(3)
            )
        else:
            expect = sum(
                _real_jblock(
                    d, (tx * w // _RESIZE_T) // 8, (ty * h // _RESIZE_T) // 8
                )
                for tx in range(_RESIZE_T)
                for ty in range(_RESIZE_T)
            )
        assert r["resized_sum"] == expect
    assert codecs == {"png", "jpeg"}


# --- baseline JPEG (functions/jpeg.py) ---------------------------------------


def _jpeg_mod():
    from australis_indexer_spark.functions import jpeg

    return jpeg


@given(st.integers(1, 4), st.integers(1, 3), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_jpeg_block_constant_exact(bw, bh, seed):
    """Images constant within each 8x8 block live in JPEG's
    exactly-representable subspace (DC-only DCT, integer coefficient under
    the all-ones quant table): the lossy codec round-trips them BIT-EXACTLY.
    This is the contract the multimodal_decode_real oracle relies on."""
    jpeg = _jpeg_mod()
    w, h = bw * 8 - seed % 5, bh * 8 - seed % 3  # include non-multiples
    rows = [
        bytes((seed + (x // 8) * 11 + (y // 8) * 23) % 256 for x in range(w))
        for y in range(h)
    ]
    got = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(w, h, rows))
    assert got == (w, h, rows)


@given(st.integers(1, 30), st.integers(1, 20), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_jpeg_arbitrary_roundtrip_tolerance(w, h, seed):
    """Arbitrary images are NOT exactly representable (forward-DCT rounding)
    but must round-trip within +/-2 per pixel at the all-ones quant table —
    the codec's honesty bound, pinned so a table/zigzag/extend bug (which
    produces garbage, not off-by-one) can never pass."""
    jpeg = _jpeg_mod()
    rows = [
        bytes((seed + y * 131 + x * 7) % 256 for x in range(w))
        for y in range(h)
    ]
    w2, h2, rows2 = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(w, h, rows))
    assert (w2, h2) == (w, h)
    for r1, r2 in zip(rows, rows2):
        assert all(abs(a - b) <= 2 for a, b in zip(r1, r2))


def test_jpeg_byte_stuffing_and_structure():
    """A stream whose entropy bytes contain 0xFF must carry the 0xFF00
    stuffing and still decode (seed 0 at 24x16 is pinned to produce one);
    container structure is real JFIF: SOI..EOI, DQT/SOF0/DHT/SOS markers."""
    import random

    jpeg = _jpeg_mod()
    rng = random.Random(0)
    w, h = 24, 16
    rows = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
    blob = jpeg.encode_jpeg_gray(w, h, rows)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in blob
    scan = blob[blob.find(b"\xff\xda") :]
    assert b"\xff\x00" in scan, "pinned fixture must exercise byte stuffing"
    w2, h2, rows2 = jpeg.decode_jpeg_gray(blob)
    assert (w2, h2) == (w, h)
    assert all(
        abs(a - b) <= 2 for r1, r2 in zip(rows, rows2) for a, b in zip(r1, r2)
    )


def test_jpeg_decoder_rejects_non_baseline():
    """Progressive (SOF2) and multi-component streams are out of scope and
    must fail loudly, not decode garbage."""
    jpeg = _jpeg_mod()
    blob = bytearray(jpeg.encode_jpeg_gray(8, 8, [bytes(8)] * 8))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError, match="baseline"):
        jpeg.decode_jpeg_gray(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg_gray(b"not a jpeg")
