"""Deterministic synthesis of the clips table (input_hint shape) with a
seeded-defect ledger — the engine's golden-oracle fixture (FIXTURES.md F1/F2).

The generator is pure-numpy + the engine's own WAV codecs, seeded, so the
same (n_rows, seed) always produces byte-identical tables; the ledger
records exactly which clip_ids carry which planted defect, and tests
assert the validation suite reproduces it (pass/fail + violation rows).

No external data, no audio libraries: payloads are sine+noise mixtures
encoded with osf_data_validator_tool_ray.audio.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import audio
from .spec import clips_schema

_LEXICON = (
    "the a of to and in that it is was for on with as at by this have from "
    "or one had not but what all were when we there can an your which their "
    "said if do will each about how up out them then she many some so these "
    "would other into has more her two like him see time could no make than "
    "first been its who now people my made over did down only way find use"
).split()

_CODECS = ["pcm_s16le", "pcm_u8", "ulaw"]
_CODEC_SR_CHOICES = {
    "pcm_s16le": [8000, 16000, 22050, 44100, 48000],
    "pcm_u8": [8000, 16000, 22050],
    "ulaw": [8000, 16000],
}

DEFECT_KINDS = [
    "dup_clip_id",        # duplicate primary key (max-cardinality violation)
    "null_transcript",    # min-cardinality zero-edge
    "empty_transcript",   # not_empty facet
    "ws_transcript",      # normalizedString facet (\n in transcript)
    "unknown_codec",      # enum-domain violation
    "bad_sr_for_codec",   # cross-column domain violation
    "dur_out_of_bounds",  # numeric facet violation
    "bad_clip_id",        # pattern facet violation
    "truncated_bytes",    # undecodable payload (existential/universal)
    "wrong_container",    # bytes header contradicts declared codec (universal)
    "len_mismatch",       # decoded frames contradict dur_ms (cross-column)
]


def _transcript(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(_LEXICON), size=n_words)
    return " ".join(_LEXICON[i] for i in idx)


def synth_clips(
    n_rows: int,
    seed: int = 42,
    defect_rate: float = 0.01,
    max_dur_ms: int = 1500,
) -> tuple[pa.Table, dict[str, list[str]]]:
    """Generate a clips table + defect ledger.

    Returns (table, ledger) where ledger maps defect kind ->
    sorted list of affected clip_ids.  Rows are generated clean first,
    then ~defect_rate of them are mutated, one defect kind per row,
    round-robin over DEFECT_KINDS so every kind appears whenever
    n_defects >= len(DEFECT_KINDS).
    """
    rng = np.random.default_rng(seed)
    speakers = rng.integers(0, 1000, size=n_rows)
    clip_ids = [f"clip:{speakers[i]:04d}:{i:08d}" for i in range(n_rows)]
    codecs = [_CODECS[i] for i in rng.integers(0, len(_CODECS), size=n_rows)]
    srs = np.array(
        [_CODEC_SR_CHOICES[c][j % len(_CODEC_SR_CHOICES[c])]
         for c, j in zip(codecs, rng.integers(0, 16, size=n_rows))],
        dtype=np.int32,
    )
    durs = np.clip(
        (rng.lognormal(mean=6.2, sigma=0.5, size=n_rows)).astype(np.int32),
        200, max_dur_ms,
    ).astype(np.int32)
    n_words = rng.integers(3, 30, size=n_rows)
    transcripts: list = [_transcript(rng, int(w)) for w in n_words]

    freqs = rng.uniform(80.0, 1200.0, size=n_rows)
    noise_amp = rng.uniform(0.01, 0.1, size=n_rows)

    payloads: list = []
    for i in range(n_rows):
        n = int(srs[i]) * int(durs[i]) // 1000
        t = np.arange(n, dtype=np.float32) / float(srs[i])
        row_rng = np.random.default_rng(seed * 1_000_003 + i)
        pcm = 0.6 * np.sin(2 * np.pi * freqs[i] * t) + noise_amp[i] * row_rng.standard_normal(n).astype(np.float32)
        payloads.append(audio.encode(pcm.astype(np.float32), int(srs[i]), codecs[i]))

    # ---- plant defects -----------------------------------------------------
    if defect_rate <= 0:
        n_defects = 0
    elif n_rows >= len(DEFECT_KINDS):
        n_defects = max(len(DEFECT_KINDS), int(round(n_rows * defect_rate)))
    else:
        n_defects = int(n_rows * defect_rate)
    defect_rows = rng.choice(n_rows, size=min(n_defects, n_rows), replace=False)
    ledger: dict[str, list[str]] = defaultdict(list)

    for k, row in enumerate(defect_rows):
        row = int(row)
        kind = DEFECT_KINDS[k % len(DEFECT_KINDS)]
        cid = clip_ids[row]
        if kind == "dup_clip_id":
            if row == 0:
                kind = "null_transcript"
            else:
                clip_ids[row] = clip_ids[row - 1]
                ledger[kind].append(clip_ids[row])
                continue
        if kind == "null_transcript":
            transcripts[row] = None
        elif kind == "empty_transcript":
            transcripts[row] = ""
        elif kind == "ws_transcript":
            transcripts[row] = transcripts[row][:20] + "\n" + transcripts[row][20:40]
        elif kind == "unknown_codec":
            codecs[row] = "opus"
        elif kind == "bad_sr_for_codec":
            codecs[row] = "ulaw"
            srs[row] = 44100  # not in ulaw's allowed set (payload header still consistent)
            n = int(srs[row]) * int(durs[row]) // 1000
            t = np.arange(n, dtype=np.float32) / float(srs[row])
            pcm = 0.5 * np.sin(2 * np.pi * 220.0 * t)
            payloads[row] = audio.encode(pcm.astype(np.float32), int(srs[row]), "ulaw")
        elif kind == "dur_out_of_bounds":
            durs[row] = np.int32(50)  # < 200 ms facet floor; payload untouched
        elif kind == "bad_clip_id":
            clip_ids[row] = f"CLIP_{row}"
            ledger[kind].append(clip_ids[row])
            continue
        elif kind == "truncated_bytes":
            payloads[row] = payloads[row][: max(10, len(payloads[row]) // 3)]
        elif kind == "wrong_container":
            # declared pcm_s16le, payload actually ulaw
            codecs[row] = "pcm_s16le"
            n = 8000 * int(durs[row]) // 1000
            t = np.arange(n, dtype=np.float32) / 8000.0
            pcm = 0.5 * np.sin(2 * np.pi * 330.0 * t)
            payloads[row] = audio.encode(pcm.astype(np.float32), 8000, "ulaw")
            srs[row] = 8000
        elif kind == "len_mismatch":
            durs[row] = np.int32(min(max_dur_ms * 2, 30000))  # dur no longer matches frames
        ledger[kind].append(cid)

    for kind in ledger:
        ledger[kind] = sorted(ledger[kind])

    table = pa.table(
        {
            "clip_id": pa.array(clip_ids, type=pa.string()),
            "bytes": pa.array(payloads, type=pa.binary()),
            "sr_hz": pa.array(srs, type=pa.int32()),
            "dur_ms": pa.array(durs, type=pa.int32()),
            "codec": pa.array(codecs, type=pa.string()),
            "transcript": pa.array(transcripts, type=pa.string()),
        },
        schema=clips_schema(),
    )
    return table, dict(ledger)


def synth_refs(
    clips: pa.Table, seed: int = 42, n_refs: int | None = None, dangling_rate: float = 0.02
) -> tuple[pa.Table, list[str]]:
    """Referential side table (FIXTURES.md F2): {ref_id, clip_id} where a
    seeded fraction of clip_ids are dangling (not present in clips)."""
    rng = np.random.default_rng(seed + 7)
    keys = clips.column("clip_id").to_pylist()
    n_refs = n_refs or len(keys)
    picked = [keys[i] for i in rng.integers(0, len(keys), size=n_refs)]
    n_dangle = max(1, int(n_refs * dangling_rate))
    dangling = [f"clip:9999:9{i:07d}" for i in range(n_dangle)]
    rows = picked + dangling
    ref_ids = [f"ref:{i:08d}" for i in range(len(rows))]
    table = pa.table({"ref_id": pa.array(ref_ids), "clip_id": pa.array(rows)})
    return table, sorted(set(dangling))


def write_clips_dataset(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    defect_rate: float = 0.01,
    num_shards: int = 8,
    max_dur_ms: int = 1500,
) -> dict:
    """Write a sharded parquet clips dataset + refs + ledger to ``out_dir``.

    Sharded layout (one file per shard, shard = partition) is the
    resume/lineage unit.  Idempotent: keyed by a params fingerprint; if a
    complete dataset with the same fingerprint exists it is reused.
    Would be `lance.write_dataset` when pylance is available (the sandbox
    has none); fragments map 1:1 to these shards.
    """
    fp = hashlib.md5(
        json.dumps([n_rows, seed, defect_rate, num_shards, max_dur_ms]).encode()
    ).hexdigest()[:12]
    marker = os.path.join(out_dir, f"_COMPLETE_{fp}")
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(marker) and os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)

    os.makedirs(out_dir, exist_ok=True)
    table, ledger = synth_clips(n_rows, seed=seed, defect_rate=defect_rate, max_dur_ms=max_dur_ms)
    refs, dangling = synth_refs(table, seed=seed)
    clips_dir = os.path.join(out_dir, "clips")
    os.makedirs(clips_dir, exist_ok=True)
    shard = max(1, n_rows // num_shards + (n_rows % num_shards > 0))
    for s in range(num_shards):
        part = table.slice(s * shard, shard)
        if part.num_rows == 0:
            break
        pq.write_table(part, os.path.join(clips_dir, f"part-{s:05d}.parquet"))
    pq.write_table(refs, os.path.join(out_dir, "refs.parquet"))
    meta = {
        "clips_dir": clips_dir,
        "refs_path": os.path.join(out_dir, "refs.parquet"),
        "n_rows": n_rows,
        "seed": seed,
        "ledger": ledger,
        "dangling_refs": dangling,
        "fingerprint": fp,
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with open(marker, "w") as f:
        f.write(fp)
    return meta
