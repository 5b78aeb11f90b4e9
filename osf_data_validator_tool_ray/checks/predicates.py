"""Named row-predicates used by qualified-cardinality, existential (SOME)
and universal (ONLY) checks.

Each predicate:  pa.Table batch -> np.ndarray[bool]  (True = satisfies).
Registered by id so constraint specs stay declarative/serializable —
the analog of the reference's owl:onDataRange / owl:someValuesFrom /
owl:allValuesFrom value-filters (e.g. CheckOwlRestrictionSome.php:149-163).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import audio


def nonempty_transcript(batch: pa.Table) -> np.ndarray:
    col = batch.column("transcript")
    ok = pc.and_(pc.is_valid(col), pc.not_equal(pc.coalesce(col, ""), ""))
    return ok.to_numpy(zero_copy_only=False)


def _payloads(batch: pa.Table) -> list:
    return audio.binary_views(batch.column("bytes"))  # zero-copy views


def decodable_bytes(batch: pa.Table) -> np.ndarray:
    """Payload header parses as a supported container (cheap sniff; the
    full PCM decode + SNR parity lives in the decode actor stage)."""
    out = np.zeros(batch.num_rows, dtype=bool)
    for i, buf in enumerate(_payloads(batch)):
        out[i] = buf is not None and audio.sniff_codec(buf) is not None
    return out


def bytes_matches_codec(batch: pa.Table) -> np.ndarray:
    """Universal: the container header's codec equals the declared codec
    column (magic-byte facet; ONLY-100 flagship)."""
    codecs = batch.column("codec").to_pylist()
    out = np.zeros(batch.num_rows, dtype=bool)
    for i, buf in enumerate(_payloads(batch)):
        out[i] = buf is not None and audio.sniff_codec(buf) == codecs[i]
    return out


def frames_match_dur(batch: pa.Table, tolerance: float = 0.02) -> np.ndarray:
    """Universal cross-column: encoded frame count from the container
    header must match dur_ms * sr_hz / 1000 within ``tolerance``.
    Undecodable payloads pass here (bytes_matches_codec owns those)."""
    srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
    durs = batch.column("dur_ms").to_numpy(zero_copy_only=False)
    out = np.ones(batch.num_rows, dtype=bool)
    for i, buf in enumerate(_payloads(batch)):
        if buf is None:
            continue
        try:
            h = audio.parse_header(buf)
        except audio.DecodeError:
            continue
        bps = 2 if (h["format_tag"] == audio.WAVE_FORMAT_PCM and h["bits"] == 16) else 1
        frames = h["data_len"] // bps
        expect = int(srs[i]) * int(durs[i]) / 1000.0
        if expect <= 0:
            out[i] = frames == 0
        else:
            out[i] = abs(frames - expect) <= max(1.0, tolerance * expect)
    return out


def lang_en(batch: pa.Table) -> np.ndarray:
    """Example qualifier over the documents table: row's lang == 'en'
    (the owl:onDataRange 'only count values of this type' analog)."""
    return pc.equal(pc.coalesce(batch.column("lang"), ""), "en") \
        .to_numpy(zero_copy_only=False)


def speaking_rate_ok(batch: pa.Table, min_cps: float = 0.2,
                     max_cps: float = 60.0) -> np.ndarray:
    """Universal cross-modal consistency: transcript characters per
    second of audio within plausible speech bounds — a transcript far
    too long or short for its clip duration signals a mispaired
    (audio, transcript) row.  Rows with an empty transcript or
    non-positive duration pass here (nonempty_transcript / the dur_ms
    facet own those findings)."""
    tr = pc.utf8_length(pc.coalesce(batch.column("transcript"), "")) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    dur_s = batch.column("dur_ms").to_numpy(zero_copy_only=False) \
        .astype(np.float64) / 1000.0
    evaluable = (tr > 0) & (dur_s > 0)
    cps = np.divide(tr, dur_s, out=np.zeros_like(tr), where=dur_s > 0)
    ok = (cps >= min_cps) & (cps <= max_cps)
    return np.where(evaluable, ok, True)


PREDICATES: dict[str, Callable[[pa.Table], np.ndarray]] = {
    "nonempty_transcript": nonempty_transcript,
    "decodable_bytes": decodable_bytes,
    "bytes_matches_codec": bytes_matches_codec,
    "frames_match_dur": frames_match_dur,
    "lang_en": lang_en,
    "speaking_rate_ok": speaking_rate_ok,
}

# columns each predicate reads — lets planners skip predicates whose
# columns are absent (the absence itself is SCHEMA-COLUMN-101's finding)
# and lets scans project only what is needed
PREDICATE_COLUMNS: dict[str, frozenset[str]] = {
    "nonempty_transcript": frozenset({"transcript"}),
    "decodable_bytes": frozenset({"bytes"}),
    "bytes_matches_codec": frozenset({"bytes", "codec"}),
    "frames_match_dur": frozenset({"bytes", "sr_hz", "dur_ms"}),
    "lang_en": frozenset({"lang"}),
    "speaking_rate_ok": frozenset({"transcript", "dur_ms"}),
}
