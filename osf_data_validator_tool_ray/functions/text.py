"""Text-analysis kernels for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting,
shingling, MinHash, SimHash.  All operate batch-at-a-time (pandas Series
/ numpy in, numpy out) so they vectorize inside ``map_batches``.

Algorithms are the standard public ones: MinHash (Broder 1997),
LSH banding (Mining of Massive Datasets ch.3), SimHash (Charikar 2002),
winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
# A BPE-ish pre-tokenizer split (GPT-2-style contractions + word/number/
# punct runs).  Deliberately LOOKAHEAD-FREE so it is RE2-expressible and
# a DuckDB `regexp_extract_all` oracle can recount it: the GPT-2 pattern
# ends `\s+(?!\S)|\s+`, whose counting effect vs a plain trailing `\s+`
# is limited to whitespace runs of length >= 2 directly followed by
# (a) non-space whitespace kinds (tab/newline: 2 tokens there vs our 1)
# or (b) an apostrophe-contraction (GPT-2's residual space pairs with
# the apostrophe as punct, splitting the contraction: 3 vs our 2).
# Single spaces merge into the next token via the leading ` ?` either
# way, so counts agree on ordinarily single-space-separated text.  Both
# Python re and RE2 use leftmost-first alternation, so the Python and
# DuckDB counts of THIS pattern are always identical.
BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")
STOPWORDS = ("the", "and", "of", "a", "to")
STOP_RE = re.compile(r"\b(?:%s)\b" % "|".join(STOPWORDS))
PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

_MERSENNE = (1 << 61) - 1


def token_counts(texts: pd.Series) -> np.ndarray:
    """Number of [A-Za-z0-9]+ tokens per text (word-ish count)."""
    return texts.str.count(TOKEN_RE).fillna(0).to_numpy(dtype=np.int64)


def bpe_token_counts(texts: pd.Series) -> np.ndarray:
    """Number of BPE-ish pre-tokens per text (token-budget estimation)."""
    return texts.str.count(BPE_RE).fillna(0).to_numpy(dtype=np.int64)


def stopword_counts(texts: pd.Series) -> np.ndarray:
    return texts.str.lower().str.count(STOP_RE).fillna(0).to_numpy(dtype=np.int64)


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Heuristic document-quality features: length, word count, stopword
    ratio, punctuation ratio, mean word length."""
    n_chars = texts.str.len().fillna(0).to_numpy(dtype=np.int64)
    n_words = token_counts(texts)
    n_stop = stopword_counts(texts)
    n_punct = texts.str.count(PUNCT_RE).fillna(0).to_numpy(dtype=np.int64)
    denom_w = np.maximum(n_words, 1)
    denom_c = np.maximum(n_chars, 1)
    return pd.DataFrame({
        "n_chars": n_chars,
        "n_words": n_words,
        "n_stopwords": n_stop,
        "stop_ratio": n_stop / denom_w,
        "punct_ratio": n_punct / denom_c,
        "mean_word_len": n_chars / denom_w,
    })


# ---------------------------------------------------------------------------
# Language ID — common-word + script heuristic
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "was", "for"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "una", "es"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"},
}
_WORD_RE = re.compile(r"[a-zA-ZÀ-ɏ]+")
_CJK_RE = re.compile(r"[一-鿿]")

# precomputed marker lookup: token -> per-language membership bitmask
# (markers overlap across languages — 'la', 'que' — so a bitmask, not a
# single code; slot 0 of the LUT is "not a marker")
_LANGS = list(_LANG_MARKERS)
_ALL_MARKERS = sorted(set().union(*_LANG_MARKERS.values()))
_MARKER_LUT = np.zeros(len(_ALL_MARKERS) + 1, dtype=np.int64)
for _i, _w in enumerate(_ALL_MARKERS):
    for _j, _lg in enumerate(_LANGS):
        if _w in _LANG_MARKERS[_lg]:
            _MARKER_LUT[_i + 1] |= 1 << _j


def tokenize_flat(texts: "pd.Series | object", sep_pattern: str,
                  lower: bool = True):
    """Shared Arrow tokenization kernel: ONE RE2 split of every text
    into a flat token array with list offsets.  Returns
    ``(flat StringArray, offsets int64 ndarray, nonempty int64 ndarray)``
    — split keeps empty boundary tokens, so ``nonempty`` marks the real
    words.  Used by lang_id / repetition_scores / unigram_logprob_scores;
    the three MUST tokenize identically to match their SQL oracles."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.fill_null(pa.array(texts, from_pandas=True)
                       if not isinstance(texts, (pa.Array, pa.ChunkedArray))
                       else texts, "")
    if lower:
        arr = pc.utf8_lower(arr)
    toks = pc.split_pattern_regex(arr, sep_pattern)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy().astype(np.int64)
    flat = toks.values
    nonempty = (pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0) \
        .astype(np.int64)
    return flat, offsets, nonempty


def segment_sums(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-list sums of a flat value array via one cumsum over the list
    offsets.  Accumulate in the values' OWN dtype (int64/float64):
    numpy's int8->float64 cumsum takes a ~100x-slower buffered-cast
    path."""
    c = np.concatenate([np.zeros(1, dtype=values.dtype),
                        np.cumsum(values)])
    return c[offsets[1:]] - c[offsets[:-1]]


def lang_id(texts: pd.Series) -> np.ndarray:
    """Best-effort language guess per text from marker-word hit rates and
    CJK script detection; 'und' (undetermined) when nothing matches.

    Arrow-native and vectorized end to end (round-2 verdict item #5):
    ONE RE2 tokenizing split (``pc.split_pattern_regex``), ONE hash
    lookup of every token against the combined marker vocabulary
    (``pc.index_in`` -> bitmask LUT), then per-language segment sums via
    int64 cumsum over the list offsets — no per-row Python loop.  (An
    int8->float64 cumsum hits a pathological numpy buffered-cast path,
    ~100x slower than int64 — keep the accumulators int64.)  The DuckDB
    oracle in __ray_entry__ pins the scoring semantics; the argmax
    tie-break order matches its CASE order (en, es, de, fr)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    out = np.full(n, "und", dtype=object)
    if n == 0:
        return out
    flat, offsets, nonempty = tokenize_flat(texts, "[^a-zA-ZÀ-ɏ]+")
    codes = pc.fill_null(pc.index_in(flat, value_set=pa.array(_ALL_MARKERS)),
                         -1).to_numpy(zero_copy_only=False).astype(np.int64)
    masks = _MARKER_LUT[codes + 1]

    denom = np.maximum(segment_sums(nonempty, offsets), 1.0)
    scores = np.empty((n, len(_LANGS)), dtype=np.float64)
    for j in range(len(_LANGS)):
        scores[:, j] = segment_sums((masks >> j) & 1, offsets) / denom
    best = scores.argmax(axis=1)
    best_score = scores.max(axis=1)
    lang_arr = np.array(_LANGS, dtype=object)
    out = np.where(best_score > 0.02, lang_arr[best], out)
    cjk = pc.count_substring_regex(
        pc.fill_null(pa.array(texts, from_pandas=True), ""), "[一-鿿]") \
        .to_numpy(zero_copy_only=False)
    out[cjk > 0] = "zh"
    return out


# ---------------------------------------------------------------------------
# Hashing / shingles / MinHash / SimHash / winnowing
# ---------------------------------------------------------------------------

def hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string/any column
    (pandas' SipHash-based hash_array; stable across processes for a
    fixed hash_key)."""
    arr = values.to_numpy() if isinstance(values, pd.Series) else np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key="0123456789abcdef").astype(np.uint64)


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-character shingle hashes of one text (uint64)."""
    if not isinstance(text, str) or len(text) < k:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    mult = np.power(257, np.arange(k, dtype=np.uint64), dtype=np.uint64)  # wraps mod 2^64
    h = (win * mult).sum(axis=1)
    h ^= h >> 33
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> 33
    return np.unique(h)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a strong vectorized 64-bit mixer (wrapping
    uint64 arithmetic is intentional)."""
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Per-permutation 64-bit salts (returned twice for signature
    compatibility).  Each 'permutation' is x -> mix64(x ^ salt_i): an
    affine family never wraps for small operands (order-preserving =>
    every permutation picks the same min), so a full-width mixer is used
    instead."""
    rng = np.random.default_rng(seed)
    salts = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
    return salts, salts


def _minhash_from_salts(shingles: np.ndarray, salts: np.ndarray) -> np.ndarray:
    vals = _mix64(shingles[None, :] ^ salts[:, None])
    return vals.min(axis=1)


def minhash_signature(shingles: np.ndarray, num_perm: int = 64, seed: int = 1) -> np.ndarray:
    """MinHash signature of a shingle-hash set: min over mix64(x ^ salt)
    per permutation, fully vectorized (num_perm x n broadcast).
    Empty set -> all-max sentinel."""
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    salts, _ = _perm_params(num_perm, seed)
    return _minhash_from_salts(shingles.astype(np.uint64), salts)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split a signature into ``bands`` bands; hash each band to a bucket
    key.  Docs sharing any (band_id, key) are candidate near-dups."""
    rows = len(sig) // bands
    out = []
    for bidx in range(bands):
        band = sig[bidx * rows:(bidx + 1) * rows]
        h = np.uint64(1469598103934665603)
        for v in band:
            h = np.uint64((int(h) ^ int(v)) * 1099511628211 % (1 << 64))
        out.append(int(h))
    return out


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(sh_a: np.ndarray, sh_b: np.ndarray) -> float:
    if len(sh_a) == 0 and len(sh_b) == 0:
        return 1.0
    inter = len(np.intersect1d(sh_a, sh_b, assume_unique=True))
    union = len(sh_a) + len(sh_b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """Charikar SimHash over word tokens: sign-sum of per-token 64-bit
    hashes weighted by term frequency."""
    if not isinstance(text, str) or not text:
        return 0
    toks = TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hashes = hash64(uniq)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: "int | np.ndarray", b: "int | np.ndarray") -> np.ndarray:
    """Vectorized popcount of XOR (bit-level unpack; no Python loop,
    safe on empty arrays)."""
    x = np.atleast_1d(np.bitwise_xor(np.asarray(a, dtype=np.uint64),
                                     np.asarray(b, dtype=np.uint64)))
    if x.size == 0:
        return np.empty(0, dtype=np.int64)
    bytes_view = x.astype(">u8").view(np.uint8).reshape(-1, 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.int64)


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> np.ndarray:
    """Winnowing document fingerprints: minimum shingle hash per sliding
    window of ``window`` consecutive k-gram hashes (rightmost-min rule)."""
    if not isinstance(text, str) or len(text) < k:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    mult = np.power(257, np.arange(k, dtype=np.uint64), dtype=np.uint64)
    h = (win * mult).sum(axis=1)
    h ^= h >> 31
    if len(h) <= window:
        return np.unique([h.min()]).astype(np.uint64)
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1)).astype(np.uint64)


_WS_RE = re.compile(r"\s+")


def normalize_text(texts: pd.Series) -> pd.Series:
    """Canonical text cleanup for training corpora: lowercase, collapse
    all whitespace runs to single spaces, strip ends.  Vectorized pandas
    str kernels; ASCII-equivalent to SQL
    lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))."""
    return texts.str.replace(_WS_RE, " ", regex=True).str.strip().str.lower()


# RE2-compatible PII patterns (shared verbatim with the DuckDB oracle:
# no lookarounds, no backreferences)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def redact_pii(texts: pd.Series,
               patterns: "dict[str, str] | None" = None) -> pd.Series:
    """Replace every PII pattern match with ``[<KIND>]`` — the standard
    pre-training scrub.  Arrow RE2 replace per pattern (C++-vectorized,
    a few passes over the corpus); patterns are RE2-safe so the DuckDB
    regexp_replace(..., 'g') oracle reproduces the output exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.fill_null(pa.array(texts, from_pandas=True), "")
    for kind, pat in (patterns or PII_PATTERNS).items():
        arr = pc.replace_substring_regex(arr, pat, f"[{kind.upper()}]")
    return pd.Series(arr.to_pandas(), index=texts.index)


def repetition_scores(texts: pd.Series) -> pd.DataFrame:
    """Gopher-style repetition features per document: total word count,
    distinct word count, and repetition ratio (1 - distinct/total; 0
    for empty docs).  Words = lowercase [a-z0-9]+ runs.

    Vectorized end to end: ONE RE2 tokenizing split, ONE global
    factorize of the flat token column, per-row distinct counts via
    np.unique over (row, code) composite keys — no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    if n == 0:
        return pd.DataFrame({"n_words": pd.Series(dtype="int64"),
                             "n_distinct_words": pd.Series(dtype="int64"),
                             "repetition_ratio": pd.Series(dtype="float64")})
    flat, offsets, nonempty = tokenize_flat(texts, "[^a-z0-9]+")
    n_words = segment_sums(nonempty, offsets)
    # global token codes; empty boundary tokens get code of "" and are
    # excluded from the distinct count via the nonempty mask
    codes = pc.fill_null(
        pc.index_in(flat, value_set=pc.unique(flat)), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    keep = nonempty.astype(bool)
    combo = rows[keep] * (codes.max() + 1) + codes[keep]
    uniq_combo = np.unique(combo)
    n_distinct = np.bincount(uniq_combo // (codes.max() + 1),
                             minlength=n).astype(np.int64)
    ratio = np.where(n_words > 0, 1.0 - n_distinct / np.maximum(n_words, 1),
                     0.0)
    return pd.DataFrame({"n_words": n_words.astype(np.int64),
                         "n_distinct_words": n_distinct,
                         "repetition_ratio": ratio})


def pattern_counts(texts: pd.Series, pattern: str) -> np.ndarray:
    """Occurrences of a regex per text (PII scans, marker detection).
    Python re and DuckDB regexp_extract_all agree on the shared
    ASCII-regex subset used by the driver oracle."""
    return texts.str.count(pattern).fillna(0).to_numpy(dtype=np.int64)


def word_ngrams_flat(texts: "pd.Series", n: int):
    """Word ``n``-gram strings for a batch of texts, built VECTORIZED
    over one flat tokenization: tokens are the lowercased
    ``[a-z0-9]+`` runs (SQL parity: ``regexp_extract_all(lower(text),
    '[a-z0-9]+')``), grams are ``n`` consecutive tokens space-joined
    via n-1 shifted ``str.cat`` passes (C string kernels, no per-gram
    Python).  Returns ``(grams object-ndarray, doc_index int64-ndarray)``
    where ``doc_index`` maps each gram to its row in ``texts``; grams
    never cross document boundaries."""
    flat, offsets, nonempty = tokenize_flat(texts, r"[^A-Za-z0-9]+")
    keep = nonempty.astype(bool)
    toks = flat.to_numpy(zero_copy_only=False)[keep]
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64),
                       np.diff(offsets))[keep]
    if len(toks) < n:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
    s = pd.Series(toks, dtype="object")
    gram = s.copy()
    for k in range(1, n):
        gram = gram.str.cat(s.shift(-k), sep=" ")
    m = len(doc_of) - n + 1
    valid = doc_of[:m] == doc_of[n - 1:]
    return gram.to_numpy()[:m][valid], doc_of[:m][valid]
