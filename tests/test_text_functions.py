"""Unit tests for the text kernels (tokenize/quality, langid, MinHash,
SimHash, winnowing) — deterministic values and semantic properties."""

import numpy as np

from osmwaterwayextractor_ray.functions.text import (
    char_counts,
    hamming64,
    jaccard,
    langid,
    minhash_bands,
    minhash_signature,
    punct_counts,
    shingle_hashes,
    simhash64,
    token_counts,
    tokenize,
    winnow_fingerprints,
)


def test_tokenize_and_counts():
    assert tokenize("  a  b\tc\n") == ["a", "b", "c"]
    assert token_counts(["a b", "", "  ", "x"]).tolist() == [2, 0, 0, 1]
    assert char_counts(["abc", ""]).tolist() == [3, 0]
    assert punct_counts(["a.b,c!", "none"]).tolist() == [3, 0]


def test_langid():
    assert langid("the cat and the dog is in the house") == "en"
    assert langid("der hund und die katze ist nicht ein tier") == "de"
    assert langid("") == "und"
    assert langid("zzz qqq xxx") == "und"


def test_minhash_similarity_estimate():
    a = "the quick brown fox jumps over the lazy dog " * 20
    b = a[:-60]  # high-overlap near-duplicate
    c = "completely different content with other words entirely " * 20
    sa, sb, sc = (minhash_signature(t) for t in (a, b, c))
    est_ab = float(np.mean(sa == sb))
    est_ac = float(np.mean(sa == sc))
    true_ab = jaccard(a, b)
    assert est_ab > 0.6 and abs(est_ab - true_ab) < 0.3
    assert est_ac < 0.2
    # near-dups share at least one LSH band
    assert set(minhash_bands(sa)) & set(minhash_bands(sb))


def test_minhash_deterministic():
    s1 = minhash_signature("hello world text")
    s2 = minhash_signature("hello world text")
    np.testing.assert_array_equal(s1, s2)


def test_simhash_properties():
    a = simhash64("the quick brown fox jumps over the lazy dog " * 10)
    b = simhash64("the quick brown fox jumps over the lazy dogs " * 10)
    c = simhash64("entirely unrelated material about databases and queries " * 10)
    assert 0 <= a < 2**64
    assert hamming64(a, b) < hamming64(a, c)
    assert simhash64("") == 0


def test_winnowing():
    f1 = winnow_fingerprints("abcdefghijklmnopqrstuvwxyz" * 10)
    f2 = winnow_fingerprints("abcdefghijklmnopqrstuvwxyz" * 10)
    np.testing.assert_array_equal(f1, f2)
    assert len(f1) >= 1
    assert winnow_fingerprints("short").dtype == np.uint64


def test_shingles():
    sh = shingle_hashes("abcdef", 5)  # 'abcde', 'bcdef'
    assert len(sh) == 2
    assert len(shingle_hashes("ab", 5)) == 1  # short-text fallback


def test_bloom_filter():
    import numpy as np

    from osmwaterwayextractor_ray.functions.bloom import BloomFilter

    keys = np.arange(0, 10000, 2, dtype=np.int64)  # evens
    bf = BloomFilter(len(keys), fpr=0.01)
    bf.add(keys)
    assert bf.contains(keys).all()  # no false negatives, ever
    odds = np.arange(1, 10001, 2, dtype=np.int64)
    fpr = bf.contains(odds).mean()
    assert fpr < 0.05, fpr
    # mergeable
    bf2 = BloomFilter(len(keys), fpr=0.01)
    bf2.add(odds[:100])
    bf2.m == bf.m and bf.merge(bf2)
    assert bf.contains(odds[:100]).all()


def test_bucketed_pairs_matches_per_group(ray_session):
    """fastagg.bucketed_pairs must emit exactly the pairs the naive
    per-fine-group triu emission does (incl. the max_group stop-band)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import bucketed_pairs

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "band": rng.integers(0, 8, n),
            "key": rng.integers(0, 60, n),
            "doc_id": rng.integers(0, 900, n),
        }
    )
    for max_group in (None, 6):
        got = (
            bucketed_pairs(
                rd.from_pandas(df).repartition(7),
                ["band", "key"], "doc_id", "doc_a", "doc_b", max_group=max_group,
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
            .drop_duplicates()
        )
        want_rows = []
        for _, g in df.groupby(["band", "key"]):
            ids = np.sort(g["doc_id"].unique())
            if len(ids) < 2 or (max_group is not None and len(ids) > max_group):
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            want_rows.append(pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj]}))
        want = (
            pd.concat(want_rows, ignore_index=True)
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        # bucketed_pairs may emit a pair once per fine group it co-occurs in;
        # compare the distinct pair sets (the pipelines dedup downstream)
        got_set = set(map(tuple, got.to_numpy()))
        want_set = set(map(tuple, want.drop_duplicates().to_numpy()))
        assert got_set == want_set, max_group


def test_hash_join_skew_guard_output_invariant(ray_session):
    """A salted (skew-guarded) hash_join must return exactly the rows of
    the unsalted join, and the heavy-hitter pre-pass must find the hot key."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import detect_hot_keys, hash_join

    rng = np.random.default_rng(9)
    n = 20_000
    # one viral key (7) holds half the fact side
    k = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 500, n))
    fact = pd.DataFrame({"k": k, "v": np.arange(n)})
    dim = pd.DataFrame({"k": np.arange(500), "name": [f"d{i}" for i in range(500)]})

    hot = detect_hot_keys(rd.from_pandas(fact).repartition(8), ["k"], threshold=1000)
    assert (7,) in hot

    def run(**kw):
        return (
            hash_join(rd.from_pandas(fact).repartition(8), rd.from_pandas(dim), on=["k"], **kw)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[["k", "v", "name"]]
        )

    plain = run()
    salted = run(skew_threshold=1000, skew_factor=4)
    pd.testing.assert_frame_equal(plain, salted)

    # differing key names through the salted path
    dim2 = dim.rename(columns={"k": "dk"})
    salted2 = (
        hash_join(
            rd.from_pandas(fact).repartition(8), rd.from_pandas(dim2),
            left_on=["k"], right_on=["dk"], skew_threshold=1000, skew_factor=4,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)[["k", "v", "name"]]
    )
    pd.testing.assert_frame_equal(plain, salted2)


def test_bpe_pattern_matches_re2():
    """The BPE-ish pretokenizer must count identically under Python re
    and DuckDB's RE2 (the oracle engine) — the pattern is deliberately
    lookahead-free for this."""
    import duckdb

    from osmwaterwayextractor_ray.functions.text import BPE_PATTERN, bpe_token_counts

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    texts = [t or "" for _, t in rows]
    ours = bpe_token_counts(texts)
    pat = BPE_PATTERN.replace("'", "''")
    sql = con.execute(
        f"SELECT len(regexp_extract_all(text, '{pat}')) "
        "FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    rows_sorted = sorted(zip([d for d, _ in rows], ours.tolist()))
    assert [n for _, n in rows_sorted] == [r[0] for r in sql]


def test_bpe_token_edge_cases():
    from osmwaterwayextractor_ray.functions.text import bpe_token_counts

    # "it's 42!" -> [it, 's, " 42", !]; "  a" -> ["  ", a]
    counts = bpe_token_counts(["", "hello world", "it's 42!", "  a"])
    assert counts.tolist() == [0, 2, 4, 2]
