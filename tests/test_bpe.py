"""Distributed BPE training (pipelines/bpe.py) vs an independent
pure-python dict-loop reference (the classic Sennrich get_stats/merge
loop). No SQL oracle exists for this op — this suite IS the correctness
pin: adversarial fixture (overlapping self-pairs, count ties, EOW
merges, single-char words), the sf0.001 documents table, and
block-structure invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import bpe


def _brute_bpe(texts, n_merges=bpe.N_MERGES) -> pd.DataFrame:
    """Independent reference: Sennrich-style loops over dicts. Shares the
    engine's determinism CONTRACT (ids assigned sorted-alphabet-then-
    creation-order; tie-break count desc then (left_id, right_id) asc;
    leftmost-greedy single-pass merge) but none of its code paths."""
    from collections import Counter

    from osmwaterwayextractor_ray.functions.text import tokenize

    wf: Counter = Counter()
    for t in texts:
        wf.update(tokenize(t or ""))
    alphabet = sorted({ch for w in wf for ch in w})
    id2s = alphabet + [bpe._EOW]
    s2id = {s: i for i, s in enumerate(id2s)}
    eow = s2id[bpe._EOW]
    words = [([s2id[ch] for ch in w] + [eow], f) for w, f in wf.items()]
    merges = []
    for step in range(n_merges):
        cnt: Counter = Counter()
        for seq, f in words:
            for i in range(len(seq) - 1):
                cnt[(seq[i], seq[i + 1])] += f
        if not cnt:
            break
        best = min(cnt, key=lambda p: (-cnt[p], p))
        c = len(id2s)
        merges.append((step, id2s[best[0]], id2s[best[1]], cnt[best], id2s[best[0]] + id2s[best[1]]))
        id2s.append(id2s[best[0]] + id2s[best[1]])
        new_words = []
        for seq, f in words:
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(c)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_words.append((out, f))
        words = new_words
    return pd.DataFrame(
        merges, columns=["step", "left", "right", "pair_count", "new_token"]
    ).astype({"step": np.int64, "pair_count": np.int64})


# adversarial fixture: 'aaaa' stresses overlapping self-pair greedy
# counting (3 adjacent (a,a) positions, 2 non-overlapping merges);
# low/lower/lowest is Sennrich's shared-prefix example; 'zz zz' plants a
# count tie against 'aa' grams; single-char and repeated words hit EOW
# merges early
FIXTURE = [
    "low low low lower lower lowest",
    "aaaa aaaa aa",
    "zz zz zz zz",
    "b b b b b b",
    "newer wider new news",
    "",
    "low aaaa zz b",
]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_docs")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(FIXTURE), dtype=np.int64),
            "text": FIXTURE,
            "source": "s0",
            "lang": "en",
            "n_chars": np.array([len(t) for t in FIXTURE], dtype=np.int64),
        }
    )
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_bpe_train_fixture(ray_session, fixture_dir):
    got = bpe.bpe_train(fixture_dir)
    want = _brute_bpe(FIXTURE)
    pd.testing.assert_frame_equal(got, want)
    # overlapping self-pair count: step 0 must count 'aaaa' as 3 (a,a)
    # positions per occurrence (overlaps counted in get_stats)...
    assert len(got) == bpe.N_MERGES
    # ...and at least one merge must involve the EOW symbol
    assert any(bpe._EOW in t for t in got["new_token"])


def test_bpe_train_sf0001(ray_session):
    got = bpe.bpe_train("/root/testdata/sf0.001")
    texts = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"].tolist()
    want = _brute_bpe(texts)
    pd.testing.assert_frame_equal(got, want)


def test_bpe_block_invariance(ray_session, fixture_dir, monkeypatch):
    base = bpe.bpe_train(fixture_dir)
    real = bpe._read_documents

    def spread(sf_dir, columns):
        import pyarrow as pa

        ds = real(sf_dir, columns)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 5, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(bpe, "_read_documents", spread)
    alt = bpe.bpe_train(fixture_dir)
    pd.testing.assert_frame_equal(alt, base)


@pytest.mark.parametrize(
    "text", ["aaa", "aaaa", "aaaaa", "aa aa", "aba abab ababab"]
)
def test_bpe_greedy_overlap_unit(ray_session, tmp_path, text):
    """Engine vs reference on the nasty self-overlap corpora — the
    vectorized leftmost-greedy (run-position parity trick) must equal the
    classic single-pass scan exactly, merge after merge."""
    pd.DataFrame(
        {
            "doc_id": np.array([0], dtype=np.int64),
            "text": [text],
            "source": "s0",
            "lang": "en",
            "n_chars": np.array([len(text)], dtype=np.int64),
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = bpe.bpe_train(str(tmp_path), n_merges=4)
    want = _brute_bpe([text], n_merges=4)
    pd.testing.assert_frame_equal(got, want)


def _brute_encode(texts, n_merges=bpe.N_MERGES) -> pd.DataFrame:
    """Independent apply-side reference: re-derive merges via _brute_bpe's
    loop, then encode each doc word by word with the single-pass scan."""
    from collections import Counter

    from osmwaterwayextractor_ray.functions.text import tokenize

    wf: Counter = Counter()
    for t in texts:
        wf.update(tokenize(t or ""))
    alphabet = sorted({ch for w in wf for ch in w})
    id2s = alphabet + [bpe._EOW]
    s2id = {s: i for i, s in enumerate(id2s)}
    eow = s2id[bpe._EOW]
    words = {w: [s2id[ch] for ch in w] + [eow] for w in wf}
    for _ in range(n_merges):
        cnt: Counter = Counter()
        for w, seq in words.items():
            f = wf[w]
            for i in range(len(seq) - 1):
                cnt[(seq[i], seq[i + 1])] += f
        if not cnt:
            break
        best = min(cnt, key=lambda p: (-cnt[p], p))
        c = len(id2s)
        id2s.append(id2s[best[0]] + id2s[best[1]])
        for w, seq in words.items():
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(c)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            words[w] = out
    rows = []
    for did, t in enumerate(texts):
        tk = tokenize(t or "")
        rows.append((did, len(tk), sum(len(words[w]) for w in tk)))
    return pd.DataFrame(rows, columns=["doc_id", "n_words", "n_bpe_tokens"]).astype(
        {"doc_id": np.int64, "n_words": np.int64, "n_bpe_tokens": np.int64}
    )


def test_bpe_encode_fixture(ray_session, fixture_dir):
    got = (
        bpe.bpe_encode(fixture_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_encode(FIXTURE)
    pd.testing.assert_frame_equal(got, want)
    # the empty doc must land at (0 words, 0 tokens), and merges must
    # actually compress: some doc's n_bpe_tokens < chars + n_words
    empty = got[got["n_words"] == 0]
    assert (empty["n_bpe_tokens"] == 0).all() and len(empty) == 1
    base = [len(t.replace(" ", "")) + len(t.split()) for t in FIXTURE if t]
    assert got[got["n_words"] > 0]["n_bpe_tokens"].sum() < sum(base)


def test_bpe_encode_sf0001(ray_session):
    texts = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"].tolist()
    got = (
        bpe.bpe_encode("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_encode(texts)
    pd.testing.assert_frame_equal(got, want)


def test_bpe_encode_block_invariance_trailing_empty(
    ray_session, tmp_path_factory, monkeypatch
):
    """Regression pin for the reduceat-clamp bug: a zero-token doc at a
    BATCH END must not truncate the preceding doc's segment. The spread
    harness re-blocks the corpus so different docs land at block ends;
    the corpus also ends with empty docs outright."""
    texts = ["low lower lowest", "aaaa aa", "", "zz b zz", "", ""]
    d = tmp_path_factory.mktemp("bpe_empty_docs")
    pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "source": "s0",
            "lang": "en",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    ).to_parquet(d / "documents.parquet", index=False)

    base = (
        bpe.bpe_encode(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _brute_encode(texts)
    pd.testing.assert_frame_equal(base, want)

    real = bpe._read_documents

    def spread(sf_dir, columns):
        import pyarrow as pa

        ds = real(sf_dir, columns)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 3, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(bpe, "_read_documents", spread)
    alt = (
        bpe.bpe_encode(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(alt, base)
