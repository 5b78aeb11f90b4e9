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
        """Mean of hashed-token projections per text, L2-normalized.
        Vectorized end to end: ONE tokenizing split for the whole batch,
        ONE hash of the flat token column, projection gather + per-row
        segment means — no per-row Python loop."""
        from ..functions.text import segment_sums, tokenize_flat

        n = len(texts)
        out = np.zeros((n, self.dim), dtype=np.float32)
        if n == 0:
            return out
        mask = np.uint64((1 << _VOCAB_BITS) - 1)
        flat, offsets, nonempty = tokenize_flat(texts, r"\s+")
        if len(flat) == 0:
            return out
        toks = flat.to_numpy(zero_copy_only=False)
        ids = (pd.util.hash_array(toks, hash_key="0123456789abcdef")
               .astype(np.uint64) & mask).astype(np.int64)
        vecs = self.proj[ids]                      # float32, like the
        vecs[~nonempty.astype(bool)] = 0.0        # old per-row mean path
        # offsets are strictly increasing (split yields >= 1 element per
        # row), so reduceat segments map 1:1 to rows — one pass, no
        # (tokens x dim) cumsum temporary
        sums = np.add.reduceat(vecs, offsets[:-1], axis=0)
        counts = segment_sums(nonempty, offsets)
        have = counts > 0
        means = sums[have] / counts[have, None]
        norms = np.linalg.norm(means, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        out[have] = (means / norms).astype(np.float32)
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
