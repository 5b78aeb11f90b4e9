"""Fix path — the engine's analog of CheckURIExistence::fix().

The reference repairs data in place: for each dangling-URI error it
CRUD-reads the record, deletes the offending triple, CRUD-updates with a
new revision, and logs the deleted triples into the report
(checks/CheckURIExistence.php:392-480, 190-211).

An immutable-data engine quarantines instead of mutating: violating rows
are split out to a quarantine sink (the deletedNTriples log analog —
every removed row is preserved, auditable, re-ingestable after repair)
and the cleaned remainder is written as the fixed dataset.  Both writes
are partitioned parquet.

ONE streaming pass: each task splits its batch with a vectorized
``pc.is_in`` and writes both sides itself, so the table is scanned once
and counts come back as the pass's tiny output — no second scan, no
re-read of the sinks.

Retry safety: the split-write runs as a ``ray.data.Datasink`` so each
write task sees its stable ``TaskContext.task_idx``; part filenames are
``part-{task_idx}-{block_idx}.parquet`` — the same naming contract Ray's
own file datasinks use for idempotent retries.  A retried task
re-derives the SAME names and atomically ``os.replace``-publishes over
its own earlier parts, while two DIFFERENT tasks can never collide even
when their batch contents are byte-identical (duplicated input blocks
are exactly the dirty data this validator targets; a content-derived
name would silently drop one copy).  A killed mid-write task never
leaves a readable partial file.  Non-empty sink directories are refused
(``overwrite=True`` clears them) so reruns can't mix stale parts with
new ones.  After the write, the returned counts are cross-checked
against the parquet footers of both sinks and a mismatch raises.

Scale: the violating-key set is broadcast via ray.put (read once per
worker from the object store).  With ``bloom=True`` a Bloom filter of
the keys is broadcast alongside: bloom-negative rows are definitely
clean and skip the exact membership probe; only the ~fpp fraction of
bloom-positives consult the exact set (useful when the violation set is
huge and the exact probe dominates).
"""

from __future__ import annotations

import glob
import os
import contextlib
import uuid
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _prepare_sink_dir(path: str, overwrite: bool) -> None:
    os.makedirs(path, exist_ok=True)
    stale = glob.glob(os.path.join(path, "*.parquet"))
    if stale:
        if not overwrite:
            raise FileExistsError(
                f"quarantine sink {path!r} already holds {len(stale)} parquet "
                "part(s); pass overwrite=True to clear it, or point at an "
                "empty directory (mixing runs corrupts the sink counts)")
        for f in stale:
            os.remove(f)
    # orphaned dot-tmp files from a run killed mid-write are never valid
    # sink content — always sweep them
    for f in glob.glob(os.path.join(path, ".tmp-*")):
        os.remove(f)


class _QuarantineSink(ray.data.Datasink):
    """One-pass split-write datasink.

    Splitter state (exact key array + optional Bloom) is fetched from
    the object store once per write TASK, not per block.  Part names are
    ``part-{task_idx:06d}-{block_idx:04d}.parquet``: ``ctx.task_idx`` is
    stable across task retries (the contract Ray's own file datasinks
    rely on), so a replayed task overwrites its own parts and distinct
    tasks never collide — even on byte-identical batches.
    """

    def __init__(self, key_ref, bloom_ref, key_column: str,
                 clean_dir: str, quarantine_dir: str):
        self._key_ref = key_ref
        self._bloom_ref = bloom_ref
        self._key_column = key_column
        self._clean_dir = clean_dir
        self._quarantine_dir = quarantine_dir
        self.counts = None  # filled by on_write_complete (driver side)

    def _splitter_state(self):
        from ..functions.sketches import BloomFilter

        key_set = ray.get(self._key_ref)
        key_arr = pa.array(list(key_set)) if key_set else None
        bloom = (BloomFilter.from_bytes(ray.get(self._bloom_ref))
                 if self._bloom_ref is not None else None)
        return key_arr, bloom

    def _bad_mask(self, col: pa.ChunkedArray, key_arr, bloom) -> np.ndarray:
        if key_arr is None:
            return np.zeros(len(col), dtype=bool)
        if bloom is not None:
            # definite-miss rows skip the exact probe entirely
            vals = col.to_numpy(zero_copy_only=False)
            maybe = bloom.contains(vals)
            bad = np.zeros(len(col), dtype=bool)
            if maybe.any():
                sub = col.filter(pa.array(maybe))
                exact = pc.is_in(sub, value_set=key_arr) \
                    .to_numpy(zero_copy_only=False)
                bad[np.flatnonzero(maybe)] = exact
            return bad
        return pc.is_in(col, value_set=key_arr).to_numpy(zero_copy_only=False)

    @staticmethod
    def _publish(tbl: pa.Table, out_dir: str, part: str) -> None:
        import pyarrow.parquet as pq

        tmp = os.path.join(out_dir, f".tmp-{part}-{uuid.uuid4().hex[:6]}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(out_dir, f"part-{part}.parquet"))

    def write(self, blocks, ctx) -> dict:
        key_arr, bloom = self._splitter_state()
        n_clean = n_bad = 0
        published = {self._clean_dir: set(), self._quarantine_dir: set()}
        for block_idx, block in enumerate(blocks):
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block, preserve_index=False)
            mask = pa.array(self._bad_mask(
                block.column(self._key_column), key_arr, bloom))
            bad = block.filter(mask)
            clean = block.filter(pc.invert(mask))
            part = f"{ctx.task_idx:06d}-{block_idx:04d}"
            if clean.num_rows:
                self._publish(clean, self._clean_dir, part)
                published[self._clean_dir].add(part)
            if bad.num_rows:
                self._publish(bad, self._quarantine_dir, part)
                published[self._quarantine_dir].add(part)
            n_clean += clean.num_rows
            n_bad += bad.num_rows
        # a RETRIED task may replay with different block partitioning;
        # orphan part-{task}-{block} files from the first attempt would
        # survive and trip the footer cross-check downstream — remove any
        # part for this task_idx that this (final, authoritative) attempt
        # did not publish
        prefix = f"part-{ctx.task_idx:06d}-"
        for out_dir, keep in published.items():
            for f in glob.glob(os.path.join(out_dir, f"{prefix}*.parquet")):
                part = os.path.basename(f)[len("part-"):-len(".parquet")]
                if part not in keep:
                    with contextlib.suppress(FileNotFoundError):
                        os.remove(f)
        return {"n_clean": n_clean, "n_quarantined": n_bad}

    def on_write_complete(self, write_result) -> None:
        self.counts = {
            "n_clean": sum(r["n_clean"] for r in write_result.write_returns),
            "n_quarantined": sum(r["n_quarantined"]
                                 for r in write_result.write_returns),
        }


def quarantine(
    ds: "ray.data.Dataset",
    violating_keys: Iterable,
    key_column: str,
    clean_dir: str,
    quarantine_dir: str,
    bloom: bool = False,
    bloom_bits: int = 1 << 22,
    overwrite: bool = False,
) -> dict:
    """Split ``ds`` on membership of ``key_column`` in ``violating_keys``;
    write both sides in one pass; return counts (footer-verified)."""
    from ..functions.sketches import BloomFilter

    keys = list(violating_keys)
    key_ref = ray.put(frozenset(keys))
    bloom_ref = None
    if bloom and keys:
        bf = BloomFilter(n_bits=bloom_bits)
        bf.update(np.asarray(keys))
        bloom_ref = ray.put(bf.to_bytes())
    _prepare_sink_dir(clean_dir, overwrite)
    _prepare_sink_dir(quarantine_dir, overwrite)

    sink = _QuarantineSink(key_ref, bloom_ref, key_column,
                           clean_dir, quarantine_dir)
    ds.write_datasink(sink)
    counts = sink.counts or {"n_clean": 0, "n_quarantined": 0}
    # belt-and-braces: the sinks' parquet footers are the ground truth;
    # any naming collision or lost part surfaces here instead of silently
    # under-writing while the returned counts claim success
    footer_clean = quarantine_counts_from_footers(clean_dir)
    footer_bad = quarantine_counts_from_footers(quarantine_dir)
    if (footer_clean, footer_bad) != (counts["n_clean"],
                                      counts["n_quarantined"]):
        raise RuntimeError(
            f"quarantine sink verification failed: footers hold "
            f"({footer_clean} clean, {footer_bad} quarantined) rows but the "
            f"write pass reported ({counts['n_clean']}, "
            f"{counts['n_quarantined']}) — sink parts were lost or mixed")
    return {"n_clean": counts["n_clean"],
            "n_quarantined": counts["n_quarantined"],
            "clean_dir": clean_dir, "quarantine_dir": quarantine_dir}


def quarantine_counts_from_footers(out_dir: str) -> int:
    """Row count of a written sink from parquet footers only (no scan)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(os.path.join(out_dir, "*.parquet")))
