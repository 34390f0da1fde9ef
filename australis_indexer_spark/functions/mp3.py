"""Self-contained MPEG-1 Layer III frame-header walker + generator —
stdlib-only (struct).

The MP3 *framing layer* (ISO/IEC 11172-3 §2.4) is plain bit-packed
32-bit headers whose bitrate/samplerate/padding fields fully determine
each frame's byte length (``144 * bitrate // samplerate + padding``) and
sample count (1152/frame for Layer III). Walking it is exactly what
metadata pipelines (ffprobe, mutagen) do to get duration / bitrate /
sample counts without decoding audio, and it is provable byte-blind:
the walker can only report the right frame lengths by parsing the real
header fields. The frame BODIES are Huffman-entropy-coded audio — that
sample-level decode remains the documented env-bound seam; the generator
fills bodies with deterministic non-sync filler (never 0xFF) so the
framing walk is exercised against genuine headers in every environment.
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III tables (ISO/IEC 11172-3): index 0 = "free", 15 = bad.
_BITRATE_KBPS = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_SAMPLE_RATE = [44100, 48000, 32000]
SAMPLES_PER_FRAME = 1152


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Layer III frame byte length per the spec's slot formula."""
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def encode_mp3(
    sample_rate: int,
    frames: list[tuple[int, int]],
    *,
    id3_payload: bytes | None = None,
) -> bytes:
    """Emit an MPEG-1 Layer III framing stream: one (bitrate_kbps, padding)
    spec per frame; optional leading ID3v2.3 tag (syncsafe size)."""
    out = bytearray()
    if id3_payload is not None:
        n = len(id3_payload)
        if n >= 1 << 28:
            raise ValueError("mp3: ID3v2 payload too large")
        out += b"ID3" + bytes([3, 0, 0]) + bytes(
            (n >> s) & 0x7F for s in (21, 14, 7, 0)
        ) + id3_payload
    sr_idx = _SAMPLE_RATE.index(sample_rate)
    for i, (br, pad) in enumerate(frames):
        br_idx = _BITRATE_KBPS.index(br)
        word = (
            (0x7FF << 21)      # sync
            | (0b11 << 19)     # MPEG-1
            | (0b01 << 17)     # Layer III
            | (1 << 16)        # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (pad << 9)
            | (0b11 << 6)      # mono
            | (1 << 2)         # original
        )
        body_len = frame_length(br, sample_rate, pad) - 4
        out += struct.pack(">I", word)
        out += bytes((i * 37 + j * 11) % 255 for j in range(body_len))
    return bytes(out)


def decode_mp3_frames(data: bytes) -> tuple[int, list[tuple[int, int, int]]]:
    """MP3 bytes → (sample_rate, [(bitrate_kbps, padding, frame_length)]).

    Skips a leading ID3v2 tag and a trailing 128-byte ID3v1 tag, then
    requires back-to-back valid MPEG-1 Layer III frames — a non-sync byte
    where a header should start is an error, not a resync (the strict
    contract a well-formed file satisfies). Sample count is
    ``SAMPLES_PER_FRAME * len(frames)``; duration follows from the
    sample rate — all derived purely from parsed headers."""
    i, end = 0, len(data)
    if data[:3] == b"ID3":
        if end < 10:
            raise ValueError("mp3: truncated ID3v2 header")
        size = 0
        for b in data[6:10]:
            if b & 0x80:
                raise ValueError("mp3: ID3v2 size byte not syncsafe")
            size = (size << 7) | b
        i = 10 + size
    if end - i >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128
    frames: list[tuple[int, int, int]] = []
    rate: int | None = None
    while i < end:
        if i + 4 > end:
            raise ValueError("mp3: truncated frame header")
        (word,) = struct.unpack_from(">I", data, i)
        if word >> 21 != 0x7FF:
            raise ValueError(f"mp3: lost sync at byte {i}")
        if (word >> 19) & 0b11 != 0b11 or (word >> 17) & 0b11 != 0b01:
            raise ValueError("mp3: only MPEG-1 Layer III framing supported")
        br_idx = (word >> 12) & 0xF
        sr_idx = (word >> 10) & 0b11
        pad = (word >> 9) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("mp3: free/invalid bitrate or samplerate index")
        br = _BITRATE_KBPS[br_idx]
        sr = _SAMPLE_RATE[sr_idx]
        if rate is None:
            rate = sr
        elif sr != rate:
            raise ValueError("mp3: sample rate changes mid-stream")
        flen = frame_length(br, sr, pad)
        if i + flen > end:
            raise ValueError("mp3: final frame truncated")
        frames.append((br, pad, flen))
        i += flen
    if rate is None:
        raise ValueError("mp3: no frames")
    return rate, frames
