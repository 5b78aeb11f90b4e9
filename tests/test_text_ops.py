import numpy as np
import pandas as pd

from osf_data_validator_tool_ray.functions import text as T


def test_token_and_stopword_counts():
    s = pd.Series(["the cat and the dog", "", None, "a b c99 d-e"])
    assert T.token_counts(s).tolist() == [5, 0, 0, 5]
    assert T.stopword_counts(s).tolist() == [3, 0, 0, 1]


def test_quality_features():
    q = T.quality_features(pd.Series(["Hello, world! The end."]))
    assert q["n_chars"][0] == 22
    assert q["n_words"][0] == 4
    assert q["n_stopwords"][0] == 1
    assert 0 < q["punct_ratio"][0] < 0.3


def test_lang_id_heuristic():
    s = pd.Series([
        "the quick brown fox is in the yard and it was fine",
        "el perro y la casa de que los gatos en un lugar",
        "der hund und die katze ist nicht ein problem mit den",
        "le chat et les chiens est une dans que pour paris",
        "这是一个中文句子",
        "zzz qqq xxx",
    ])
    assert T.lang_id(s).tolist() == ["en", "es", "de", "fr", "zh", "und"]


def test_shingles_and_jaccard():
    a = T.char_shingle_hashes("the quick brown fox jumps", k=5)
    b = T.char_shingle_hashes("the quick brown fox jumped", k=5)
    c = T.char_shingle_hashes("completely different text!", k=5)
    assert T.exact_jaccard(a, a) == 1.0
    assert T.exact_jaccard(a, b) > 0.6
    assert T.exact_jaccard(a, c) < 0.1
    assert len(T.char_shingle_hashes("abc", k=5)) == 0


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(3)
    base = " ".join(str(rng.integers(0, 100)) for _ in range(200))
    near = base[:-20] + " altered tail 123456"
    far = " ".join(str(rng.integers(1000, 2000)) for _ in range(200))
    sa = T.minhash_signature(T.char_shingle_hashes(base), 128)
    sb = T.minhash_signature(T.char_shingle_hashes(near), 128)
    sc = T.minhash_signature(T.char_shingle_hashes(far), 128)
    ja = T.exact_jaccard(T.char_shingle_hashes(base), T.char_shingle_hashes(near))
    est = T.minhash_jaccard(sa, sb)
    assert abs(est - ja) < 0.15
    assert T.minhash_jaccard(sa, sc) < 0.2


def test_minhash_deterministic():
    sh = T.char_shingle_hashes("determinism matters for resume", 5)
    s1 = T.minhash_signature(sh, 64, seed=1)
    s2 = T.minhash_signature(sh, 64, seed=1)
    assert (s1 == s2).all()
    assert T.lsh_band_keys(s1, 16) == T.lsh_band_keys(s2, 16)


def test_simhash_near_and_far():
    a = T.simhash64("the quick brown fox jumps over the lazy dog again and again")
    b = T.simhash64("the quick brown fox jumps over the lazy dog again and again!")
    c = T.simhash64("totally unrelated content about databases and query engines")
    assert int(T.hamming64(a, b)[0]) <= 8
    assert int(T.hamming64(a, c)[0]) > 12
    assert T.simhash64("") == 0


def test_hamming64_vectorized():
    assert T.hamming64(0, 0xFFFFFFFFFFFFFFFF)[0] == 64
    assert T.hamming64(np.array([], dtype=np.uint64), np.array([], dtype=np.uint64)).size == 0
    assert T.hamming64(0b1010, np.array([0b1000, 0b0010], dtype=np.uint64)).tolist() == [1, 1]


def test_winnow_fingerprints():
    t = "some reasonably long text for fingerprinting with winnowing windows"
    fp1 = T.winnow_fingerprints(t)
    fp2 = T.winnow_fingerprints(t)
    assert (fp1 == fp2).all() and len(fp1) > 0
    # containment: fingerprints of a substring mostly appear in the superstring
    sub = T.winnow_fingerprints(t[10:50])
    inter = np.intersect1d(fp1, sub)
    assert len(inter) >= len(sub) * 0.5


def test_hash64_stable():
    h1 = T.hash64(pd.Series(["a", "b"]))
    h2 = T.hash64(pd.Series(["a", "b"]))
    assert (h1 == h2).all()
    assert h1[0] != h1[1]


def test_redact_pii_and_repetition_scores():
    import duckdb
    import pandas as pd

    from osf_data_validator_tool_ray.functions.text import (
        redact_pii, repetition_scores)

    df = pd.DataFrame({"text": [
        "write bob.smith+x@foo-bar.co or call 555-123-4567 now",
        "ssn 123-45-6789 appears twice: 123-45-6789",
        None, "", "the the the cat",
    ]})
    red = list(redact_pii(df["text"]))
    assert red[0] == "write [EMAIL] or call [PHONE] now"
    assert red[1] == "ssn [SSN] appears twice: [SSN]"
    assert red[2] == "" and red[3] == ""

    # DuckDB parity (same RE2 patterns, same order)
    want = duckdb.sql(r"""
        SELECT regexp_replace(regexp_replace(regexp_replace(
            COALESCE(text, ''),
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '[PHONE]', 'g'),
            '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[SSN]', 'g') AS r
        FROM df
    """).df()["r"].tolist()
    assert red == want

    rep = repetition_scores(df["text"])
    assert rep["repetition_ratio"].iloc[4] == 0.5
    assert rep["n_words"].iloc[2] == 0
    wrep = duckdb.sql("""
        WITH w AS (SELECT regexp_extract_all(lower(COALESCE(text, '')),
                                             '[a-z0-9]+') AS ws FROM df)
        SELECT len(ws)::BIGINT AS n_words,
               len(list_distinct(ws))::BIGINT AS n_distinct FROM w
    """).df()
    assert rep["n_words"].tolist() == wrep["n_words"].tolist()
    assert rep["n_distinct_words"].tolist() == wrep["n_distinct"].tolist()
