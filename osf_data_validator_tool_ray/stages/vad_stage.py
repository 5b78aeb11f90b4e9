"""Voice-activity (VAD) stage: speech-segment stats + silence checks
over an encoded-audio payload column.

The training-data-curation counterpart of the decode checks: a speech
corpus wants its clips MOSTLY SPEECH — a mostly-silent clip (dead air,
truncated recording) or a non-empty transcript over zero detected
speech is bad training data even when the payload decodes cleanly.
Check ids follow the suite's convention (CheckDatatypePropertiesDatatype
-> DATATYPE-FACET-10x analog; reference check classes at
/root/reference/StructuredDynamics/osf/validator/checks/):

  VAD-100  speech_ratio below ``min_speech_ratio`` (mostly-silent clip)
  VAD-101  non-empty transcript but ZERO detected speech segments
  VAD-102  speaking rate over SPEECH time (chars / speech-sec) outside
           [min_cps, max_cps] — the refinement of the duration-based
           ``speaking_rate_ok`` predicate: long silences no longer
           dilute the rate

Ray shape: one ``map_batches`` pass over (id, bytes[, transcript]) with
the same task/actor conventions as ``stages/decode_stage.py`` — decode
dispatch is per-task state, batches stay small because the payload
column is wide, and the stats table (one narrow row per clip) is what
flows on.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

from .. import audio
from ..checks.base import empty_violations, make_violations

STATS_COLS = ("n_segments", "speech_ms", "total_ms", "lead_silence_ms",
              "trail_silence_ms", "longest_silence_ms")


class VadStage:
    """Per-batch VAD profiler.  Setup (decoder dispatch, VAD params)
    happens once per task/actor in ``__init__``; ``__call__`` decodes
    each payload and emits one narrow stats row per clip.  Undecodable
    payloads get ``decoded_ok=False`` + the error string — decode
    failures are the DECODE checks' finding, so they are carried, not
    raised."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 frame_ms: int = 20, energy_thresh: float = 0.01,
                 max_gap_ms: int = 60, min_speech_ms: int = 60):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.kw = dict(frame_ms=frame_ms, energy_thresh=energy_thresh,
                       max_gap_ms=max_gap_ms, min_speech_ms=min_speech_ms)
        self._decode = audio.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = audio.binary_views(batch.column(self.bytes_col))
        n = len(payloads)
        ok = np.zeros(n, dtype=bool)
        stats = {c: np.zeros(n, dtype=np.int64) for c in STATS_COLS}
        errs: list = [None] * n
        for i, buf in enumerate(payloads):
            if buf is None:
                errs[i] = "null payload"
                continue
            try:
                pcm, sr = self._decode(buf)
            except audio.DecodeError as e:
                errs[i] = str(e)
                continue
            ok[i] = True
            s = audio.speech_stats(pcm, sr, **self.kw)
            for c in STATS_COLS:
                stats[c][i] = s[c]
        cols = {
            self.id_col: batch.column(self.id_col),
            "decoded_ok": pa.array(ok),
            **{c: pa.array(stats[c]) for c in STATS_COLS},
            "error": pa.array(errs, type=pa.string()),
        }
        if "transcript" in batch.column_names:
            cols["transcript"] = batch.column("transcript")
        return pa.table(cols)


def vad_stats(
    ds: "ray.data.Dataset",
    bytes_col: str = "bytes",
    id_col: str = "clip_id",
    batch_size: int = 256,
    concurrency=None,
    **vad_kwargs,
) -> "ray.data.Dataset":
    """One streamed pass: (id, bytes[, transcript]) -> per-clip speech
    stats.  Column-pruned at the read boundary by selecting only what
    the stage touches."""
    cols = [c for c in (id_col, bytes_col, "transcript")
            if c in ds.schema().names]
    kwargs: dict = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.select_columns(cols).map_batches(
        VadStage(bytes_col, id_col, **vad_kwargs), **kwargs)


class TrimSilenceStage:
    """Lead/trail-silence trimming transform — the curation twin of
    ``VadStage``: decode, find the speech extent (first VAD segment
    start .. last segment end, padded by ``keep_ms`` on both sides),
    slice the PCM on exact sample boundaries and re-encode with the
    clip's own codec.  Silent or undecodable clips pass through with
    ``trimmed=False`` (dropping them is the caller's policy, e.g. a
    VAD-100 quarantine), so the stage is lossless on everything it
    does not positively identify as trimmable."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "clip_id",
                 keep_ms: int = 0, frame_ms: int = 20,
                 energy_thresh: float = 0.01, max_gap_ms: int = 60,
                 min_speech_ms: int = 60):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.keep_ms = keep_ms
        self.frame_ms = frame_ms
        self.kw = dict(frame_ms=frame_ms, energy_thresh=energy_thresh,
                       max_gap_ms=max_gap_ms, min_speech_ms=min_speech_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = audio.binary_views(batch.column(self.bytes_col))
        n = len(payloads)
        out_bytes: list = [None] * n
        trimmed = np.zeros(n, dtype=bool)
        lead = np.zeros(n, dtype=np.int64)
        trail = np.zeros(n, dtype=np.int64)
        out_ms = np.zeros(n, dtype=np.int64)
        for i, buf in enumerate(payloads):
            out_bytes[i] = bytes(buf) if buf is not None else None
            if buf is None:
                continue
            try:
                pcm, sr = audio.decode(buf)
                codec = audio.sniff_codec(buf) or "pcm_s16le"
            except audio.DecodeError:
                continue
            segs = audio.vad_segments(pcm, sr, **self.kw)
            flen = max(1, int(sr * self.frame_ms / 1000))
            total_ms = (len(pcm) // flen) * self.frame_ms
            if len(segs) == 0:
                out_ms[i] = total_ms
                continue
            lo_ms = max(0, int(segs[0, 0]) - self.keep_ms)
            hi_ms = min(total_ms, int(segs[-1, 1]) + self.keep_ms)
            lo = int(lo_ms * sr / 1000)
            hi = int(hi_ms * sr / 1000)
            out_bytes[i] = audio.encode(pcm[lo:hi], sr, codec)
            trimmed[i] = True
            lead[i] = lo_ms
            trail[i] = total_ms - hi_ms
            out_ms[i] = hi_ms - lo_ms
        return pa.table({
            self.id_col: batch.column(self.id_col),
            self.bytes_col: pa.array(out_bytes, type=pa.binary()),
            "trimmed": pa.array(trimmed),
            "trimmed_lead_ms": pa.array(lead),
            "trimmed_trail_ms": pa.array(trail),
            "out_ms": pa.array(out_ms),
        })


def trim_silence(
    ds: "ray.data.Dataset",
    bytes_col: str = "bytes",
    id_col: str = "clip_id",
    batch_size: int = 256,
    concurrency=None,
    **kwargs,
) -> "ray.data.Dataset":
    """One streamed decode->trim->re-encode pass over the payload
    column (see TrimSilenceStage)."""
    cols = [c for c in (id_col, bytes_col) if c in ds.schema().names]
    mb: dict = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        mb["concurrency"] = concurrency
    return ds.select_columns(cols).map_batches(
        TrimSilenceStage(bytes_col, id_col, **kwargs), **mb)


def vad_violations(
    stats: "ray.data.Dataset",
    id_col: str = "clip_id",
    min_speech_ratio: float = 0.2,
    min_cps: float = 0.2,
    max_cps: float = 40.0,
) -> "ray.data.Dataset":
    """VAD-100/101/102 violation rows from a ``vad_stats`` table
    (vectorized per batch; decode failures are skipped — they belong to
    DECODE-100)."""

    def emit(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ok = pc.cast(t.column("decoded_ok"), pa.int8()) \
            .to_numpy(zero_copy_only=False).astype(bool)
        ids = np.asarray(t.column(id_col).to_pylist(), dtype=object)
        speech = t.column("speech_ms").to_numpy(zero_copy_only=False)
        total = t.column("total_ms").to_numpy(zero_copy_only=False)
        nseg = t.column("n_segments").to_numpy(zero_copy_only=False)
        out = []
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(total > 0, speech / np.maximum(total, 1), 0.0)
        m = ok & (total > 0) & (ratio < min_speech_ratio)
        if m.any():
            out.append(make_violations(
                "VAD-100", ids[m], "bytes",
                np.round(ratio[m], 4),
                expected=f"speech_ratio>={min_speech_ratio}"))
        if "transcript" in t.column_names:
            tr = t.column("transcript").to_pylist()
            has_tr = np.array([bool(x) and bool(str(x).strip())
                               for x in tr], dtype=bool)
            m = ok & has_tr & (nseg == 0)
            if m.any():
                out.append(make_violations(
                    "VAD-101", ids[m], "transcript", nseg[m],
                    expected="transcript implies >=1 speech segment"))
            tl = np.array([len(str(x)) if x is not None else 0
                           for x in tr], dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                cps = np.where(speech > 0, tl / (speech / 1000.0), np.nan)
            m = ok & has_tr & (speech > 0) \
                & ((cps < min_cps) | (cps > max_cps))
            if m.any():
                out.append(make_violations(
                    "VAD-102", ids[m], "transcript",
                    np.round(cps[m], 2),
                    expected=f"{min_cps}<=chars/speech_sec<={max_cps}"))
        return pa.concat_tables(out).combine_chunks() if out \
            else empty_violations()

    return stats.map_batches(emit, batch_format="pyarrow",
                             batch_size=None)
