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


def vad_segments(pcm: np.ndarray, sr: int, frame_ms: int = 20,
                 energy_thresh: float = 0.01, max_gap_ms: int = 60,
                 min_speech_ms: int = 60) -> np.ndarray:
    """Energy-based voice-activity segments: (n, 2) int64 array of
    [start_ms, end_ms) speech spans on the ``frame_ms`` grid.

    Classic energy VAD (frame RMS >= ``energy_thresh``), then two
    morphological passes: unvoiced gaps <= ``max_gap_ms`` strictly
    inside speech are closed, voiced runs < ``min_speech_ms`` dropped.
    Fully vectorized (run boundaries via diff-of-padded-mask; gap
    closing via a cumsum interval overlay) — no per-frame Python even
    on pathological alternating-frame audio."""
    f = np.asarray(pcm, dtype=np.float32)
    flen = max(1, int(sr * frame_ms / 1000))
    n_fr = len(f) // flen
    if n_fr == 0:
        return np.zeros((0, 2), dtype=np.int64)
    fr = f[: n_fr * flen].astype(np.float64).reshape(n_fr, flen)
    voiced = np.sqrt(np.mean(fr * fr, axis=1)) >= energy_thresh

    def runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        d = np.diff(np.concatenate(
            ([0], mask.astype(np.int8), [0])))
        return np.flatnonzero(d == 1), np.flatnonzero(d == -1)

    gap_fr = max_gap_ms // frame_ms
    if gap_fr > 0:
        s0, e0 = runs(~voiced)
        inner = (s0 > 0) & (e0 < n_fr) & ((e0 - s0) <= gap_fr)
        if inner.any():
            delta = np.zeros(n_fr + 1, dtype=np.int64)
            np.add.at(delta, s0[inner], 1)
            np.add.at(delta, e0[inner], -1)
            voiced |= np.cumsum(delta[:-1]) > 0
    s1, e1 = runs(voiced)
    keep = (e1 - s1) >= max(1, min_speech_ms // frame_ms)
    return (np.stack([s1[keep], e1[keep]], axis=1) * frame_ms) \
        .astype(np.int64)


def speech_stats(pcm: np.ndarray, sr: int, frame_ms: int = 20,
                 **vad_kwargs) -> dict:
    """Per-clip speech-activity profile derived from ``vad_segments``:
    segment count, speech/total ms, lead/trail silence and the longest
    silence (including the boundaries).  ``total_ms`` is quantized to
    the VAD frame grid so speech_ms <= total_ms always holds exactly."""
    segs = vad_segments(pcm, sr, frame_ms=frame_ms, **vad_kwargs)
    flen = max(1, int(sr * frame_ms / 1000))
    total_ms = (len(np.asarray(pcm)) // flen) * frame_ms
    if len(segs) == 0:
        return {"n_segments": 0, "speech_ms": 0, "total_ms": int(total_ms),
                "lead_silence_ms": int(total_ms),
                "trail_silence_ms": int(total_ms),
                "longest_silence_ms": int(total_ms)}
    speech = int((segs[:, 1] - segs[:, 0]).sum())
    lead = int(segs[0, 0])
    trail = int(total_ms - segs[-1, 1])
    sil = [lead, trail]
    if len(segs) > 1:
        sil.extend((segs[1:, 0] - segs[:-1, 1]).tolist())
    return {"n_segments": int(len(segs)), "speech_ms": speech,
            "total_ms": int(total_ms), "lead_silence_ms": lead,
            "trail_silence_ms": trail,
            "longest_silence_ms": int(max(sil))}


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


def spectral_fingerprint(pcm: np.ndarray, sr: int,
                         n_bands: int = 16, frame_len: int = 256,
                         canonical_sr: int = 8000,
                         max_frames: int = 1024,
                         f_lo: float = 50.0, f_hi: float = 1800.0,
                         diff_eps: float = 0.05,
                         signif_beta: float = 0.01) -> np.ndarray:
    """Compact acoustic fingerprint: one uint32 code per FIXED-length
    frame transition, two 16-bit planes over ``n_bands`` log-spaced
    spectral bands (the Chromaprint family's energy-landmark idea,
    public literature; numpy rFFT only):

    * low 16 bits — "band energy above the frame's mean band energy"
      (content plane: which bands are lit);
    * high 16 bits — "band energy rose by more than ``diff_eps``
      versus the previous frame, AND the band carries at least
      ``signif_beta`` of the frame's energy" (temporal plane: the
      envelope; the significance gate keeps near-empty bands' noise
      out, the deadband keeps stationary content stable under
      requantization).

    The frame grid is ABSOLUTE-TIME: the clip is first resampled to
    ``canonical_sr`` (linear interpolation; pass the clip's ``sr``),
    then cut into consecutive ``frame_len``-sample frames — so frame i
    covers the same wall-clock window in every clip regardless of its
    length or original rate.  Analysis is band-limited to
    [``f_lo``, ``f_hi``] Hz so rate conversions whose intermediate
    Nyquist sits above ``f_hi`` don't perturb the occupied bands.
    Invariances the dedup path relies on (measured on synthetic
    enveloped multi-tone clips): amplitude scaling 0 bits; mu-law
    re-encode <=4 bits; trailing trim -> exact PREFIX of the longer
    clip's codes; 8k->4k->8k linear resample <=45 of ~2000 bits;
    distinct clips >=58 bits at 1 s, >=130 at 2 s.  Leading trims
    shift the grid and are out of scope (no shift alignment).

    Returns a variable-length ``(n_frames-1,)`` uint32 array, capped
    at ``max_frames`` codes; clips shorter than two frames return an
    empty array."""
    pcm = np.asarray(pcm, dtype=np.float32)
    if sr is None:
        # sr is REQUIRED: skipping the canonical-rate resample would put
        # codes on a non-canonical frame grid and silently break the
        # absolute-time prefix semantics fingerprint_hamming relies on.
        raise ValueError("spectral_fingerprint requires the clip's sample "
                         "rate (sr) to place codes on the canonical "
                         f"{canonical_sr} Hz frame grid")
    if sr != canonical_sr and len(pcm):
        n_out = int(round(len(pcm) * canonical_sr / sr))
        if n_out == 0:
            return np.zeros(0, dtype=np.uint32)
        x_old = np.arange(len(pcm), dtype=np.float64) / sr
        x_new = np.arange(n_out, dtype=np.float64) / canonical_sr
        pcm = np.interp(x_new, x_old, pcm).astype(np.float32)
    n_frames = min(len(pcm) // frame_len, max_frames + 1)
    if n_frames < 2:
        return np.zeros(0, dtype=np.uint32)
    frames = pcm[:n_frames * frame_len].reshape(n_frames, frame_len)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    k = spec.shape[1]
    binw = canonical_sr / frame_len
    lo = max(1, int(round(f_lo / binw)))
    hi = min(k - 1, int(round(f_hi / binw)))
    edges = np.unique(np.geomspace(lo, hi, n_bands + 1).astype(np.int64))
    if len(edges) < 3:
        return np.zeros(0, dtype=np.uint32)
    e = np.add.reduceat(spec[:, :hi + 1], edges[:-1], axis=1)
    tot = e.sum(axis=1, keepdims=True) + 1e-30
    mean_bits = (e > e.mean(axis=1, keepdims=True))[1:]
    signif = np.maximum(e[1:], e[:-1]) > signif_beta * np.maximum(tot[1:],
                                                                 tot[:-1])
    diff_bits = (e[1:] > e[:-1] * (1.0 + diff_eps)) & signif
    w = 1 << np.arange(e.shape[1], dtype=np.uint32)
    return ((mean_bits.astype(np.uint32) * w).sum(axis=1)
            | ((diff_bits.astype(np.uint32) * w).sum(axis=1) << np.uint32(16))
            ).astype(np.uint32)


def fingerprint_hamming(a: np.ndarray, b: np.ndarray) -> int:
    """Differing bits over the COMMON PREFIX of two spectral
    fingerprints (frame grids are absolute-time, so code i of one clip
    is comparable to code i of another regardless of clip lengths)."""
    n = min(len(a), len(b))
    if n == 0:
        return 0
    x = np.bitwise_xor(a[:n].astype(np.uint32), b[:n].astype(np.uint32))
    return int(np.unpackbits(x.view(np.uint8)).sum())
