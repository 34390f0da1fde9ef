"""Self-contained LZ4 Frame codec (wire parity without the `lz4` wheel).

The reference compresses payloads with LZ4F (`lzzzz` crate,
borealis-indexer/src/main.rs:369) and decompresses on the consumer
(borealis-consumer/src/main.rs:269-272). The `lz4` Python wheel is not in
this container, so — like the CBOR subset in codecs.py — the wire format is
implemented directly from the PUBLIC specs:

- frame format: https://github.com/lz4/lz4/blob/dev/doc/lz4_Frame_format.md
- block format: https://github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md
- xxHash32 (frame checksums): https://github.com/Cyan4973/xxHash (spec doc)

Decompression is COMPLETE: compressed blocks (token/literals/offset match
sequences, overlap copies), uncompressed blocks, linked or independent
blocks, header/block/content checksums — it reads frames produced by any
compliant encoder (including the reference's `lzzzz`). Compression emits
spec-valid frames using uncompressed blocks (bit-31 block-size flag), which
every compliant decoder accepts; ratio is delegated to parquet at rest, the
frame here is wire-format parity.
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_M32 = 0xFFFFFFFF
_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393
)

_BLOCK_MAX = 64 * 1024  # BD byte value 4 (64 KB)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 — the checksum LZ4F uses for header/block/content."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            w1, w2, w3, w4 = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl((v1 + w1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + w2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + w3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + w4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        (w,) = struct.unpack_from("<I", data, i)
        h = (_rotl((h + w * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def _block_decompress(src: bytes, dst: bytearray, limit: int) -> None:
    """LZ4 block: token → literals → (offset, matchlen) sequences, appended
    into ``dst`` (the whole running output is the match window, which makes
    linked-block frames decode for free).

    ``limit`` is the hard output bound for THIS block (window start + the
    frame's BD-declared max block size): match sequences amplify ~255x per
    extension byte, so without a per-sequence check a small malicious block
    materializes gigabytes byte-by-byte before any post-hoc size check runs
    — the same allocation-bomb class png.py bounds at the geometry-implied
    IDAT size."""
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if lit_len:
            if i + lit_len > n:
                # explicit: the slice would silently shorten the literals
                raise ValueError("lz4: truncated literal run")
            if len(dst) + lit_len > limit:
                raise ValueError("lz4: block output exceeds declared max block size")
            dst += src[i : i + lit_len]
            i += lit_len
        if i >= n:  # last sequence is literals-only
            break
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        if len(dst) + match_len > limit:
            raise ValueError("lz4: block output exceeds declared max block size")
        pos = len(dst) - offset
        if pos < 0:
            raise ValueError("lz4: match offset before window start")
        for _ in range(match_len):  # byte-wise: overlap copies are the point
            dst.append(dst[pos])
            pos += 1


def lz4f_decompress(data: bytes) -> bytes:
    """Parse an LZ4 frame (any compliant encoder's output) to its content.

    Malformed input ALWAYS raises ValueError (the mp4.py convention,
    ADVICE r5): a truncated frame or block body surfaces struct.error /
    IndexError from the offset reads, converted here so callers can rely
    on one exception type."""
    try:
        return _lz4f_decompress(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"lz4f: truncated frame ({e})") from e


def _lz4f_decompress(data: bytes) -> bytes:
    if len(data) < 7 or struct.unpack_from("<I", data, 0)[0] != _MAGIC:
        raise ValueError("lz4f: bad magic")
    i = 4
    flg, bd = data[i], data[i + 1]
    if (flg >> 6) != 0b01:
        raise ValueError("lz4f: unsupported version")
    bs_code = (bd >> 4) & 0x7
    if bs_code < 4:
        raise ValueError("lz4f: reserved block max size code")
    # spec table: 4→64KB, 5→256KB, 6→1MB, 7→4MB — a hard bound on each
    # block's UNCOMPRESSED size, enforced during decode (see
    # _block_decompress's limit) so a bomb block cannot outgrow it
    bs_max = 1 << (8 + 2 * bs_code)
    b_checksum = bool(flg & 0x10)
    has_size = bool(flg & 0x08)
    c_checksum = bool(flg & 0x04)
    has_dict = bool(flg & 0x01)
    desc_start = i
    i += 2
    content_size = None
    if has_size:
        (content_size,) = struct.unpack_from("<Q", data, i)
        i += 8
    if has_dict:
        i += 4
    hc = data[i]
    if ((xxh32(data[desc_start:i]) >> 8) & 0xFF) != hc:
        raise ValueError("lz4f: header checksum mismatch")
    i += 1

    out = bytearray()
    while True:
        (bsize,) = struct.unpack_from("<I", data, i)
        i += 4
        if bsize == 0:  # EndMark
            break
        uncompressed = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if i + bsize > len(data):
            # explicit: a silently-short slice would otherwise pass a frame
            # with no block/content checksum and return truncated content
            raise ValueError("lz4f: truncated block")
        block = data[i : i + bsize]
        i += bsize
        if b_checksum:
            (bsum,) = struct.unpack_from("<I", data, i)
            i += 4
            if xxh32(block) != bsum:
                raise ValueError("lz4f: block checksum mismatch")
        if uncompressed:
            if bsize > bs_max:
                raise ValueError("lz4f: block exceeds declared max block size")
            out += block
        else:
            _block_decompress(block, out, len(out) + bs_max)
        if content_size is not None and len(out) > content_size:
            # fail as soon as the pledge is exceeded — the final equality
            # check below would otherwise run only after every remaining
            # block has been materialized
            raise ValueError("lz4f: content size mismatch")
    if c_checksum:
        (csum,) = struct.unpack_from("<I", data, i)
        if xxh32(bytes(out)) != csum:
            raise ValueError("lz4f: content checksum mismatch")
    if content_size is not None and content_size != len(out):
        raise ValueError("lz4f: content size mismatch")
    return bytes(out)


def lz4f_compress(data: bytes) -> bytes:
    """Emit a spec-valid LZ4 frame: content size + content checksum set,
    64 KB independent blocks stored with the uncompressed flag (bit 31)."""
    flg = (0b01 << 6) | 0x20 | 0x08 | 0x04  # v01, B.Indep, C.Size, C.Checksum
    bd = 4 << 4  # 64 KB max block size
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    out = bytearray(struct.pack("<I", _MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for off in range(0, len(data), _BLOCK_MAX):
        chunk = data[off : off + _BLOCK_MAX]
        out += struct.pack("<I", len(chunk) | 0x80000000)
        out += chunk
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)
