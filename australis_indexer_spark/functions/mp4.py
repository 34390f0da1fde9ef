"""Self-contained ISO-BMFF (MP4) mux/demux — stdlib-only (struct).

Same rationale as functions/png.py / jpeg.py: the MP4 *container*
(ISO/IEC 14496-12 box tree — ftyp / moov / trak / mdia / stbl sample
tables) is plain structured binary, so the video branch of the multimodal
decode path can demultiplex REAL CONTAINER BYTES in every environment:
walk the box tree, read the sample tables (stts durations, stsz sizes,
stsc chunk runs, stco chunk offsets), and slice the actual frame payloads
back out of mdat. The video track carried here is UNCOMPRESSED 8-bit
grayscale (sample-entry fourcc ``raw ``), so frame decode is exact;
entropy-coded codecs (H.264/AAC inside the same container) remain the
documented env-bound seam — the demuxer REJECTS their sample entries
(`avc1`, `mp4a`, ...) with a clear error rather than pretending.
"""

from __future__ import annotations

import struct

_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, bytes([version]) + flags.to_bytes(3, "big") + payload)


def _chunk_plan(n_frames: int) -> list[int]:
    """Samples-per-chunk plan: pairs with a trailing singleton — two stsc
    runs whenever n_frames is odd, so the demuxer's run expansion is
    genuinely exercised, not a degenerate 1-entry walk."""
    return [2] * (n_frames // 2) + ([1] if n_frames % 2 else [])


def encode_mp4_rawvideo(
    width: int,
    height: int,
    frames: list[bytes],
    *,
    timescale: int = 1000,
    frame_delta: int = 100,
) -> bytes:
    """Mux raw 8-bit grayscale frames (each ``width*height`` bytes) into a
    canonical ftyp + mdat + moov file with per-sample stsz and a 2-up
    chunking (stsc/stco)."""
    if not frames:
        raise ValueError("mp4: at least one frame required")
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("mp4: frame size != width*height")
    nf = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2")
    mdat = _box(b"mdat", b"".join(frames))
    data0 = len(ftyp) + 8  # first sample byte (mdat body start)

    plan = _chunk_plan(nf)
    offsets: list[int] = []
    pos, si = data0, 0
    for n_in_chunk in plan:
        offsets.append(pos)
        for _ in range(n_in_chunk):
            pos += len(frames[si])
            si += 1

    duration = nf * frame_delta
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">ih", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + bytes(10) + _MATRIX + bytes(24) + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 3,  # enabled | in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + bytes(8) + struct.pack(">hhhh", 0, 0, 0, 0) + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),  # 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + bytes(12) + b"RawVideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
    )
    # VisualSampleEntry (86 bytes): the uncompressed-grayscale codec slot.
    compressor = bytes([3]) + b"raw" + bytes(28)
    entry = _box(
        b"raw ",
        bytes(6) + struct.pack(">H", 1)          # data_reference_index
        + bytes(16)                               # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + bytes(4) + struct.pack(">H", 1)         # frame_count per sample
        + compressor + struct.pack(">Hh", 8, -1),  # depth 8, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, nf, frame_delta))
    runs: list[tuple[int, int]] = []
    for ci, n_in_chunk in enumerate(plan, start=1):
        if not runs or runs[-1][1] != n_in_chunk:
            runs.append((ci, n_in_chunk))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, nf)
        + b"".join(struct.pack(">I", len(fr)) for fr in frames),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for each box in [start, end);
    handles 64-bit largesize (size==1) and to-end-of-file (size==0)."""
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError("mp4: truncated box header")
        (size,) = struct.unpack_from(">I", data, i)
        tag = data[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("mp4: truncated largesize header")
            (size,) = struct.unpack_from(">Q", data, i + 8)
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError("mp4: box size out of bounds")
        yield tag, i + hdr, i + size
        i += size


def _find(data: bytes, start: int, end: int, tag: bytes):
    for t, s, e in _walk(data, start, end):
        if t == tag:
            return s, e
    return None


def decode_mp4_rawvideo(
    data: bytes,
) -> tuple[int, int, int, int, list[bytes]]:
    """MP4 bytes → (width, height, timescale, duration, frames).

    Full demux: box-tree walk, video trak located via its hdlr, sample
    tables parsed (stts/stsz/stsc/stco), per-sample absolute offsets
    reconstructed from the chunk runs, frame bytes sliced out of mdat and
    validated against the sample-entry geometry. Only the ``raw ``
    (uncompressed grayscale) sample entry is decodable; compressed codecs
    raise with their fourcc named.

    Malformed input ALWAYS raises ValueError — the variable-length sample
    tables are explicitly bounds-checked against their box ends, and any
    fixed-header read landing inside a too-small box is converted from
    struct.error here so callers can rely on one exception type
    (ADVICE r5)."""
    try:
        return _decode_mp4_rawvideo(data)
    except struct.error as e:
        raise ValueError(f"mp4: truncated structure ({e})") from e


def _decode_mp4_rawvideo(
    data: bytes,
) -> tuple[int, int, int, int, list[bytes]]:
    top = list(_walk(data, 0, len(data)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("mp4: not an ISO-BMFF stream (no leading ftyp)")
    moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
    mdat = next(((s, e) for t, s, e in top if t == b"mdat"), None)
    if moov is None or mdat is None:
        raise ValueError("mp4: missing moov or mdat box")

    for t, s, e in _walk(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, s, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("mp4: video trak missing mdhd")
        ver = data[mdhd[0]]
        if ver == 0:
            timescale, duration = struct.unpack_from(">II", data, mdhd[0] + 12)
        else:  # version 1: 64-bit times
            (timescale,) = struct.unpack_from(">I", data, mdhd[0] + 20)
            (duration,) = struct.unpack_from(">Q", data, mdhd[0] + 24)
        minf = _find(data, *mdia, b"minf")
        stbl = minf and _find(data, *minf, b"stbl")
        if not stbl:
            raise ValueError("mp4: video trak missing stbl")
        boxes = {t: (bs, be) for t, bs, be in _walk(data, *stbl)}
        for need in (b"stsd", b"stts", b"stsz", b"stsc", b"stco"):
            if need not in boxes:
                raise ValueError(f"mp4: missing {need.decode()} sample table")

        sd = boxes[b"stsd"][0]
        (n_entries,) = struct.unpack_from(">I", data, sd + 4)
        if n_entries < 1:
            raise ValueError("mp4: empty stsd")
        fourcc = data[sd + 12 : sd + 16]
        if fourcc != b"raw ":
            raise ValueError(
                f"mp4: entropy-coded sample entry {fourcc!r} needs real "
                "codec libraries (env-bound); only 'raw ' grayscale decodes"
            )
        ent = sd + 16  # VisualSampleEntry body
        width, height = struct.unpack_from(">HH", data, ent + 24)
        if width == 0 or height == 0:
            # spec-invalid geometry would otherwise "decode": every
            # all-empty frame passes the size==width*height check at 0
            raise ValueError("mp4: zero sample-entry dimension")

        def _table(tag: bytes, header: int, entry: int, count: int) -> int:
            # Declared entry counts must fit inside the box — a truncated
            # table must fail the module's ValueError contract, not leak
            # struct.error from unpack_from (ADVICE r5).
            bs, be = boxes[tag]
            if bs + header + entry * count > be:
                raise ValueError(
                    f"mp4: truncated {tag.decode()} table "
                    f"({count} entries declared, box too small)"
                )
            return bs

        ts = boxes[b"stts"][0]
        (n_runs,) = struct.unpack_from(">I", data, ts + 4)
        _table(b"stts", 8, 8, n_runs)
        n_samples = sum(
            struct.unpack_from(">II", data, ts + 8 + 8 * k)[0]
            for k in range(n_runs)
        )

        if n_samples > mdat[1] - mdat[0]:
            # run COUNT VALUES are not bounded by the stts box size the way
            # entry counts are — without this, a few corrupt bytes could
            # declare billions of samples and force the [fixed]*cnt
            # allocation below before any per-sample validation runs
            raise ValueError("mp4: sample count implausible for mdat size")
        szs = boxes[b"stsz"][0]
        fixed, cnt = struct.unpack_from(">II", data, szs + 4)
        if cnt != n_samples:
            raise ValueError("mp4: stsz/stts sample count mismatch")
        if not fixed:
            _table(b"stsz", 12, 4, cnt)
        sizes = (
            [fixed] * cnt
            if fixed
            else list(struct.unpack_from(f">{cnt}I", data, szs + 12))
        )

        sc = boxes[b"stsc"][0]
        (n_sc,) = struct.unpack_from(">I", data, sc + 4)
        _table(b"stsc", 8, 12, n_sc)
        sc_runs = [
            struct.unpack_from(">III", data, sc + 8 + 12 * k)[:2]
            for k in range(n_sc)
        ]
        co = boxes[b"stco"][0]
        (n_chunks,) = struct.unpack_from(">I", data, co + 4)
        _table(b"stco", 8, 4, n_chunks)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}I", data, co + 8))

        # Expand stsc runs: samples-per-chunk for each chunk 1..n_chunks.
        per_chunk: list[int] = []
        for k, (first, spc) in enumerate(sc_runs):
            last = (
                sc_runs[k + 1][0] - 1 if k + 1 < len(sc_runs) else n_chunks
            )
            per_chunk.extend([spc] * (last - first + 1))
        if sum(per_chunk) != n_samples:
            raise ValueError("mp4: stsc/stco do not cover all samples")

        frames: list[bytes] = []
        si = 0
        for coff, spc in zip(chunk_offs, per_chunk):
            pos = coff
            for _ in range(spc):
                end_b = pos + sizes[si]
                if pos < mdat[0] or end_b > mdat[1]:
                    raise ValueError("mp4: sample offset outside mdat")
                frames.append(data[pos:end_b])
                pos = end_b
                si += 1
        for fr in frames:
            if len(fr) != width * height:
                raise ValueError("mp4: raw sample size != width*height")
        return width, height, timescale, duration, frames

    raise ValueError("mp4: no video trak found")
