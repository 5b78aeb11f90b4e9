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


_HANN_CACHE: dict = {}


def qa_features_full(f: np.ndarray, sr: int,
                     frame: int = 1024, hop: int = 64,
                     chunk_frames: int = 32) -> dict:
    """Thorough QA profile: dense spectrogram (hop 64) with per-frame
    centroid mean/std, 8-band energies, spectral entropy, rolloff,
    flatness, dominant frequency, plus an FFT-autocorrelation pitch
    estimate.

    ONE chunked STFT pass: frames are processed ``chunk_frames`` at a
    time so intermediates stay L2-resident (full-spectrogram
    materialization is DRAM-bandwidth-bound and stops scaling across
    cores on one node); all statistics accumulate as running sums.
    """
    out = {"rms": 0.0, "peak": 0.0, "clipping_ratio": 0.0, "silence_ratio": 1.0,
           "spectral_centroid": 0.0, "spectral_rolloff": 0.0,
           "spectral_flatness": 0.0, "dominant_freq": 0.0, "zcr": 0.0,
           "pitch_hz": 0.0, "pitch_strength": 0.0, "centroid_std": 0.0,
           "spectral_entropy": 0.0, **{f"band{i}_energy": 0.0 for i in range(8)}}
    n = len(f)
    if n == 0:
        return out
    out["rms"] = float(np.sqrt(np.mean(f * f)))
    out["peak"] = float(np.max(np.abs(f)))
    out["clipping_ratio"] = float(np.mean(np.abs(f) > 0.985))
    out["zcr"] = float(np.mean(np.signbit(f[1:]) != np.signbit(f[:-1])))
    sf_len = max(1, int(sr * 0.02))
    n_sil = n // sf_len
    if n_sil:
        fr = f[: n_sil * sf_len].reshape(n_sil, sf_len)
        out["silence_ratio"] = float(np.mean(np.sqrt(np.mean(fr * fr, axis=1)) < 0.01))

    if n >= frame:
        win = _HANN_CACHE.get(frame)
        if win is None:
            win = _HANN_CACHE[frame] = np.hanning(frame)
        freqs = np.fft.rfftfreq(frame, d=1.0 / sr)
        n_frames = 1 + (n - frame) // hop
        mag_sum = np.zeros(len(freqs))
        cent_sum = cent_sq_sum = 0.0
        ent_sum = 0.0
        for start in range(0, n_frames, chunk_frames):
            cnt = min(chunk_frames, n_frames - start)
            idx0 = start * hop
            view = np.lib.stride_tricks.sliding_window_view(
                f[idx0: idx0 + (cnt - 1) * hop + frame], frame)[::hop][:cnt]
            sp = np.abs(np.fft.rfft(view * win, axis=1))
            mag_sum += sp.sum(axis=0)
            tot = sp.sum(axis=1)
            tot[tot == 0] = 1.0
            cent = (sp * freqs).sum(axis=1) / tot
            cent_sum += cent.sum()
            cent_sq_sum += (cent * cent).sum()
            p = sp / tot[:, None]
            ent_sum += float(-(p * np.log(p + 1e-12)).sum())
        mag = mag_sum / n_frames
        total = mag.sum()
        if total > 0:
            out["spectral_centroid"] = float((freqs * mag).sum() / total)
            cum = np.cumsum(mag)
            out["spectral_rolloff"] = float(freqs[np.searchsorted(cum, 0.85 * total)])
            gm = np.exp(np.mean(np.log(mag + 1e-12)))
            out["spectral_flatness"] = float(gm / (mag.mean() + 1e-12))
            out["dominant_freq"] = float(freqs[int(np.argmax(mag))])
        mean_c = cent_sum / n_frames
        out["centroid_std"] = float(max(0.0, cent_sq_sum / n_frames - mean_c ** 2) ** 0.5)
        out["spectral_entropy"] = float(ent_sum / n_frames)
        for i, b in enumerate(np.array_split(mag, 8)):
            out[f"band{i}_energy"] = float(b.sum())

    if n >= 2048:
        # FFT autocorrelation pitch (Wiener-Khinchin)
        x = f - f.mean()
        spec = np.fft.rfft(x, n=2 * len(x))
        ac = np.fft.irfft(spec * np.conj(spec))[: len(x)]
        lo, hi = int(sr / 500), int(sr / 50)          # 50..500 Hz
        if hi > lo and hi < len(ac) and ac[0] > 0:
            lag = lo + int(np.argmax(ac[lo:hi]))
            out["pitch_hz"] = float(sr / lag)
            out["pitch_strength"] = float(ac[lag] / ac[0])
    return out


def qa_features(f: np.ndarray, sr: int,
                frame: int = 1024, hop: int = 256) -> dict:
    """Per-clip audio-QA features over float PCM in [-1, 1]:

      rms, peak, clipping_ratio, silence_ratio (20 ms frames),
      spectral centroid / rolloff(0.85) / flatness and dominant frequency
      from a |STFT| (frame/hop windows, Hann), zero-crossing rate.

    Vectorized per clip (one framed FFT batch); this is the compute body
    of the decode validation stage — at fleet scale these stats feed the
    drift profile and the per-clip quality facets.
    """
    n = len(f)
    out = {"rms": 0.0, "peak": 0.0, "clipping_ratio": 0.0, "silence_ratio": 1.0,
           "spectral_centroid": 0.0, "spectral_rolloff": 0.0,
           "spectral_flatness": 0.0, "dominant_freq": 0.0, "zcr": 0.0}
    if n == 0:
        return out
    out["rms"] = float(np.sqrt(np.mean(f * f)))
    out["peak"] = float(np.max(np.abs(f)))
    out["clipping_ratio"] = float(np.mean(np.abs(f) > 0.985))
    out["zcr"] = float(np.mean(np.signbit(f[1:]) != np.signbit(f[:-1])))

    sf_len = max(1, int(sr * 0.02))
    n_sil = n // sf_len
    if n_sil:
        frames = f[: n_sil * sf_len].reshape(n_sil, sf_len)
        out["silence_ratio"] = float(np.mean(np.sqrt(np.mean(frames * frames, axis=1)) < 0.01))

    if n >= frame:
        win = np.lib.stride_tricks.sliding_window_view(f, frame)[::hop]
        spec = np.abs(np.fft.rfft(win * np.hanning(frame), axis=1))
        mag = spec.mean(axis=0)
        freqs = np.fft.rfftfreq(frame, d=1.0 / sr)
        total = mag.sum()
        if total > 0:
            out["spectral_centroid"] = float((freqs * mag).sum() / total)
            cum = np.cumsum(mag)
            out["spectral_rolloff"] = float(freqs[np.searchsorted(cum, 0.85 * total)])
            gm = np.exp(np.mean(np.log(mag + 1e-12)))
            out["spectral_flatness"] = float(gm / (mag.mean() + 1e-12))
            out["dominant_freq"] = float(freqs[int(np.argmax(mag))])
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


def spectral_fingerprint(pcm: np.ndarray, n_frames: int = 32,
                         n_bands: int = 16) -> np.ndarray:
    """Compact acoustic fingerprint: ``n_frames`` codes, each the
    bit pattern of "band energy above the frame's mean band energy"
    over ``n_bands`` log-spaced spectral bands (the Chromaprint/Shazam
    family's energy-landmark idea, public literature; numpy rFFT only).

    Properties the dedup path relies on: amplitude scaling multiplies
    every band energy AND the mean equally, so the bits are invariant;
    lossy re-encodes (mu-law) and light noise flip only a few bits, so
    near-dups sit at small Hamming distance; different content lights
    up different bands (measured: same tone scaled/ulaw-recoded ->
    0 bits; different tone pair -> ~56 of 512 bits; tone vs noise ->
    ~200).  Returns (n_frames,) uint16 codes; too-short input returns
    zeros."""
    pcm = np.asarray(pcm, dtype=np.float32)
    if len(pcm) < n_frames * 2:
        return np.zeros(n_frames, dtype=np.uint16)
    usable = (len(pcm) // n_frames) * n_frames
    frames = pcm[:usable].reshape(n_frames, -1)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    k = spec.shape[1]
    edges = np.unique(np.geomspace(1, k - 1, n_bands + 1).astype(np.int64))
    if len(edges) < 3:
        return np.zeros(n_frames, dtype=np.uint16)
    energies = np.add.reduceat(spec, edges[:-1], axis=1)
    bits = energies > energies.mean(axis=1, keepdims=True)
    weights = (1 << np.arange(bits.shape[1], dtype=np.uint16)) \
        .astype(np.uint16)
    return (bits.astype(np.uint16) * weights).sum(axis=1).astype(np.uint16)


def fingerprint_hamming(a: np.ndarray, b: np.ndarray) -> int:
    """Total differing bits between two spectral fingerprints."""
    x = np.bitwise_xor(a.astype(np.uint16), b.astype(np.uint16))
    return int(np.unpackbits(x.view(np.uint8)).sum())
