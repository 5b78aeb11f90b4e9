"""Batched model-inference stage — the actor-pool "model scoring"
pattern for training-data pipelines.

The Ray-side contract is exactly what a real encoder (sentence
transformer, audio embedder) uses at 100 TB:

  * the model loads ONCE per actor in ``__init__`` (here: a 16 MB
    hash-projection table standing in for weights — the sandbox has no
    torch; swap ``_embed_batch`` for a real ``model.encode`` and nothing
    else changes),
  * ``__call__`` embeds a whole batch vectorized,
  * output is a fixed-dim ``list<float32>`` column ready for the ANN /
    embedding-near-dup operators in checks/similarity.py.

Deterministic by construction (seeded projection, stable token hash), so
outputs are reproducible across runs, partitionings, and cluster sizes —
the property every oracle/check downstream relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_VOCAB_BITS = 16                      # 65,536-row projection table


class TextEmbedder:
    """map_batches(TextEmbedder, fn_constructor_args=(dim,), concurrency=N)
    — or pass an instance for task scheduling on warm workers."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 dim: int = 64, seed: int = 7):
        self.text_col, self.id_col, self.dim = text_col, id_col, dim
        # "model load": one-time per-actor setup
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal(
            (1 << _VOCAB_BITS, dim)).astype(np.float32)

    def _embed_batch(self, texts: "pd.Series") -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        mask = np.uint64((1 << _VOCAB_BITS) - 1)
        for i, t in enumerate(texts):
            if not isinstance(t, str) or not t:
                continue
            toks = t.lower().split()
            if not toks:
                continue
            ids = (pd.util.hash_array(np.asarray(toks, dtype=object),
                                      hash_key="0123456789abcdef")
                   .astype(np.uint64) & mask).astype(np.int64)
            v = self.proj[ids].mean(axis=0)
            n = np.linalg.norm(v)
            out[i] = v / n if n > 0 else v
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pandas()
        emb = self._embed_batch(texts)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), type=pa.float32()), self.dim),
        })


def embed_text(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    seed: int = 7,
    batch_size: int = 512,
    concurrency: "int | tuple[int, int] | None" = None,
) -> "ray.data.Dataset":
    """Embed a text column.  concurrency=None runs task-scheduled on warm
    workers (cheap stand-in model); pass (min, max) for an actor pool
    when the per-worker model load is genuinely heavy."""
    sub = ds.select_columns([id_col, text_col])
    if concurrency is None:
        return sub.map_batches(TextEmbedder(text_col, id_col, dim, seed),
                               batch_format="pyarrow", batch_size=batch_size)
    return sub.map_batches(
        TextEmbedder, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_args=(text_col, id_col, dim, seed),
        concurrency=concurrency, num_cpus=1)
