"""Audio payload codecs — pure-numpy encode/decode for the `bytes` column.

The sandbox has no audio libraries (no soundfile/librosa/ffmpeg), so the
engine implements the three codecs of the clips spec itself from public
format specifications:

  * ``pcm_s16le`` — RIFF/WAVE container, format tag 1, 16-bit LE PCM
  * ``pcm_u8``    — RIFF/WAVE container, format tag 1, 8-bit unsigned PCM
  * ``ulaw``      — RIFF/WAVE container, format tag 7, G.711 mu-law

All kernels are vectorized numpy; decode returns float32 PCM in [-1, 1].
This is the decoding used both by the AudioDecodeValidator actor stage
and (via an independent scalar implementation in tests/) the per-row
parity oracle (decoded-PCM allclose, SNR >= 30 dB — BASELINE.json
input_hint).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_MULAW = 7

_MU = 255.0
_ULAW_BIAS = 0x84  # 132, standard G.711 bias
_ULAW_CLIP = 32635


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """G.711 mu-law companding: int16 PCM -> uint8 codewords (ITU-T G.711)."""
    x = pcm.astype(np.int32)
    sign = (x < 0).astype(np.uint8)
    mag = np.abs(x)
    mag = np.minimum(mag, _ULAW_CLIP) + _ULAW_BIAS
    # exponent = position of highest set bit above bit 7
    exp = (np.log2(mag).astype(np.int32) - 7).clip(0, 7)
    mantissa = (mag >> (exp + 3)) & 0x0F
    code = ~((sign << 7) | (exp.astype(np.uint8) << 4) | mantissa.astype(np.uint8))
    return code.astype(np.uint8)


def mulaw_decode(code: np.ndarray) -> np.ndarray:
    """uint8 mu-law codewords -> int16 PCM."""
    c = (~code.astype(np.uint8)).astype(np.int32)
    sign = (c >> 7) & 1
    exp = (c >> 4) & 0x07
    mantissa = c & 0x0F
    mag = (((mantissa << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    out = np.where(sign == 1, -mag, mag)
    return out.astype(np.int16)


def _wav_header(fmt: int, channels: int, sr: int, bits: int, data_len: int) -> bytes:
    byte_rate = sr * channels * bits // 8
    block_align = channels * bits // 8
    fmt_chunk = struct.pack("<HHIIHH", fmt, channels, sr, byte_rate, block_align, bits)
    riff_len = 4 + (8 + len(fmt_chunk)) + (8 + data_len)
    return (
        b"RIFF" + struct.pack("<I", riff_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", data_len)
    )


def encode(pcm_f32: np.ndarray, sr: int, codec: str) -> bytes:
    """float32 PCM in [-1,1] -> encoded WAV bytes for ``codec``."""
    clipped = np.clip(pcm_f32, -1.0, 1.0)
    if codec == "pcm_s16le":
        data = (clipped * 32767.0).astype("<i2").tobytes()
        return _wav_header(WAVE_FORMAT_PCM, 1, sr, 16, len(data)) + data
    if codec == "pcm_u8":
        data = ((clipped * 127.0) + 128.0).astype(np.uint8).tobytes()
        return _wav_header(WAVE_FORMAT_PCM, 1, sr, 8, len(data)) + data
    if codec == "ulaw":
        i16 = (clipped * 32767.0).astype(np.int16)
        data = mulaw_encode(i16).tobytes()
        return _wav_header(WAVE_FORMAT_MULAW, 1, sr, 8, len(data)) + data
    raise ValueError(f"unknown codec {codec!r}")


class DecodeError(ValueError):
    pass


def parse_header(buf: bytes) -> dict:
    """Parse a (single fmt+data chunk) RIFF/WAVE header; raises DecodeError."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise DecodeError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if clen < 16 or body + 16 > len(buf):
                raise DecodeError("truncated fmt chunk")
            tag, ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", buf, body)
            fmt = {"format_tag": tag, "channels": ch, "sr_hz": sr, "bits": bits}
        elif cid == b"data":
            if fmt is None:
                raise DecodeError("data chunk before fmt chunk")
            if body + clen > len(buf):
                raise DecodeError("truncated data chunk")
            fmt["data_offset"] = body
            fmt["data_len"] = clen
            return fmt
        pos = body + clen + (clen & 1)
    raise DecodeError("missing data chunk")


def sniff_codec(buf: bytes) -> Optional[str]:
    """Container sniffing: which codec does the payload's header declare?
    (the magic-byte facet of the `bytes` column; returns None when the
    payload is not parseable)."""
    try:
        h = parse_header(buf)
    except DecodeError:
        return None
    if h["format_tag"] == WAVE_FORMAT_MULAW and h["bits"] == 8:
        return "ulaw"
    if h["format_tag"] == WAVE_FORMAT_PCM and h["bits"] == 16:
        return "pcm_s16le"
    if h["format_tag"] == WAVE_FORMAT_PCM and h["bits"] == 8:
        return "pcm_u8"
    return None


def decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Encoded WAV bytes -> (float32 PCM in [-1,1], sr_hz)."""
    h = parse_header(buf)
    raw = buf[h["data_offset"]:h["data_offset"] + h["data_len"]]
    if h["format_tag"] == WAVE_FORMAT_PCM and h["bits"] == 16:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    elif h["format_tag"] == WAVE_FORMAT_PCM and h["bits"] == 8:
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 127.0
    elif h["format_tag"] == WAVE_FORMAT_MULAW and h["bits"] == 8:
        pcm = mulaw_decode(np.frombuffer(raw, dtype=np.uint8)).astype(np.float32) / 32767.0
    else:
        raise DecodeError(f"unsupported format tag={h['format_tag']} bits={h['bits']}")
    return pcm, h["sr_hz"]


def decode_ints(buf: bytes) -> tuple[np.ndarray, int, str]:
    """Encoded WAV bytes -> (integer-domain samples, sr_hz, codec).

    The integer samples (int16 for pcm_s16le/ulaw-decoded, uint8 raw for
    pcm_u8) are bit-exact regardless of float rounding, so their hash is
    the per-row parity token compared against the naive oracle decoder.
    """
    h = parse_header(buf)
    raw = buf[h["data_offset"]:h["data_offset"] + h["data_len"]]
    if h["format_tag"] == WAVE_FORMAT_PCM and h["bits"] == 16:
        return np.frombuffer(raw, dtype="<i2"), h["sr_hz"], "pcm_s16le"
    if h["format_tag"] == WAVE_FORMAT_PCM and h["bits"] == 8:
        return np.frombuffer(raw, dtype=np.uint8), h["sr_hz"], "pcm_u8"
    if h["format_tag"] == WAVE_FORMAT_MULAW and h["bits"] == 8:
        return mulaw_decode(np.frombuffer(raw, dtype=np.uint8)), h["sr_hz"], "ulaw"
    raise DecodeError(f"unsupported format tag={h['format_tag']} bits={h['bits']}")


def binary_views(arr) -> list:
    """Zero-copy per-row memoryviews over a pyarrow Binary(Chunked)Array's
    data buffer — avoids to_pylist()'s full copy of the payload column
    (the dominant cost at audio scale)."""
    import pyarrow as pa

    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    out = []
    for chunk in chunks:
        if len(chunk) == 0:
            continue
        validity, offsets_buf, data_buf = chunk.buffers()
        offsets = np.frombuffer(offsets_buf, dtype=np.int32)[
            chunk.offset: chunk.offset + len(chunk) + 1]
        mv = memoryview(data_buf)
        nulls = chunk.is_null().to_numpy(zero_copy_only=False)
        for i in range(len(chunk)):
            if nulls[i]:
                out.append(None)
            else:
                out.append(mv[offsets[i]:offsets[i + 1]])
    return out


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against `reference`, in dB."""
    n = min(len(reference), len(test))
    if n == 0:
        return float("-inf")
    ref = reference[:n].astype(np.float64)
    err = ref - test[:n].astype(np.float64)
    p_sig = float(np.sum(ref * ref))
    p_err = float(np.sum(err * err))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)
