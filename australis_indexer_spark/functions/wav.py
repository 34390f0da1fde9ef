"""Self-contained WAV/RIFF PCM codec — stdlib-only (struct).

Same rationale as functions/png.py: 16-bit PCM WAV is a plain RIFF
container, so the audio branch of the multimodal decode path can parse
REAL AUDIO BYTES without any wheel. Mono/stereo, 16-bit little-endian
samples; compressed codecs (mp3/aac) remain env-bound.
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    """Interleaved 16-bit PCM samples → canonical 44-byte-header WAV."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """WAV bytes → (sample_rate, n_channels, interleaved 16-bit samples).

    Walks RIFF sub-chunks (tolerates extra chunks like LIST before data),
    accepts only PCM format 1 at 16 bits. Malformed input ALWAYS raises
    ValueError (the mp4.py convention, ADVICE r5): a chunk's declared
    length is bounds-checked against the buffer end before its body is
    read, so a truncated file can neither leak struct.error nor silently
    drop samples."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE stream")
    i = 12
    rate = channels = None
    samples: list[int] | None = None
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        (ln,) = struct.unpack_from("<I", data, i + 4)
        if i + 8 + ln > len(data):
            raise ValueError("wav: truncated chunk")
        body = data[i + 8 : i + 8 + ln]
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("wav: truncated fmt chunk")
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"wav: unsupported format {audio_fmt}/{bits}-bit")
        elif tag == b"data":
            if len(body) % 2:
                raise ValueError("wav: odd data chunk length for 16-bit PCM")
            samples = list(struct.unpack(f"<{len(body) // 2}h", body))
    if rate is None or samples is None:
        raise ValueError("wav: missing fmt or data chunk")
    return rate, channels, samples
