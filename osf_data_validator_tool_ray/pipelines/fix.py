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

Retry safety: part filenames derive deterministically from the BATCH
CONTENT (md5 of the key column's row hashes + row count), and each part
is written to a dot-tmp file then published with an atomic
``os.replace`` — a Ray task retry or lineage re-execution of the same
batch overwrites its own part instead of accumulating uuid-named
duplicates, and a killed mid-write task never leaves a readable partial
file.  Non-empty sink directories are refused (``overwrite=True``
clears them) so reruns can't mix stale parts with new ones.

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
    write both sides in one pass; return counts."""
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

    class SplitWriter:
        """Splitter state (exact key array + optional Bloom) is built
        once at construction; the serialized instance ships to workers
        once via the object store, never per batch."""

        def __init__(self):
            key_set = ray.get(key_ref)
            self.key_arr = pa.array(list(key_set)) if key_set else None
            self.bloom = (BloomFilter.from_bytes(ray.get(bloom_ref))
                          if bloom_ref is not None else None)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch.column(key_column)
            if self.key_arr is None:
                bad_mask = np.zeros(batch.num_rows, dtype=bool)
            elif self.bloom is not None:
                # definite-miss rows skip the exact probe entirely
                vals = col.to_numpy(zero_copy_only=False)
                maybe = self.bloom.contains(vals)
                bad_mask = np.zeros(batch.num_rows, dtype=bool)
                if maybe.any():
                    sub = col.filter(pa.array(maybe))
                    exact = pc.is_in(sub, value_set=self.key_arr) \
                        .to_numpy(zero_copy_only=False)
                    bad_mask[np.flatnonzero(maybe)] = exact
            else:
                bad_mask = pc.is_in(col, value_set=self.key_arr) \
                    .to_numpy(zero_copy_only=False)
            mask = pa.array(bad_mask)
            bad = batch.filter(mask)
            clean = batch.filter(pc.invert(mask))
            # part name = content hash of the WHOLE batch (every column's
            # deterministic row hashes, pandas SipHash — process-stable):
            # a retried task re-derives the SAME name and atomically
            # overwrites; two batches that differ in ANY cell (not just
            # the key column) derive different names, so distinct batches
            # never clobber each other even when their key contents match
            import hashlib

            import pandas as pd
            h = hashlib.md5(batch.num_rows.to_bytes(8, "little"))
            for name in batch.column_names:
                series = batch.column(name).to_pandas()
                h.update(pd.util.hash_pandas_object(
                    series, index=False,
                    hash_key="0123456789abcdef").to_numpy().tobytes())
            part = h.hexdigest()[:16]

            def publish(tbl: pa.Table, out_dir: str) -> None:
                import pyarrow.parquet as pq
                tmp = os.path.join(out_dir, f".tmp-{part}-{uuid.uuid4().hex[:6]}")
                pq.write_table(tbl, tmp)
                os.replace(tmp, os.path.join(out_dir, f"part-{part}.parquet"))

            if clean.num_rows:
                publish(clean, clean_dir)
            if bad.num_rows:
                publish(bad, quarantine_dir)
            return pa.table({"n_clean": pa.array([clean.num_rows], type=pa.int64()),
                             "n_quarantined": pa.array([bad.num_rows], type=pa.int64())})

    counts = ds.map_batches(SplitWriter(), batch_format="pyarrow").to_pandas()
    return {"n_clean": int(counts["n_clean"].sum()),
            "n_quarantined": int(counts["n_quarantined"].sum()),
            "clean_dir": clean_dir, "quarantine_dir": quarantine_dir}


def quarantine_counts_from_footers(out_dir: str) -> int:
    """Row count of a written sink from parquet footers only (no scan)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(os.path.join(out_dir, "*.parquet")))
