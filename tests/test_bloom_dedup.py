"""Bloom filter (state/bloom.py) unit properties + incremental_dedup vs a
python reference on a corpus with PLANTED cross-slice duplicates (the
sf0.001/sf0.01 oracle rows cover the SQL anti-join; sf0.001 happens to
contain no cross-slice dups, so the drop path is pinned here)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import textops
from osmwaterwayextractor_ray.state import bloom


def test_bloom_no_false_negatives_and_merge_order():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**63, 5000).astype(np.uint64)
    chunks = np.array_split(keys, 7)
    parts = [bloom.bloom_partial(c) for c in chunks]
    bm = bloom.bloom_merge(parts)
    # merge is order-independent
    bm2 = bloom.bloom_merge(reversed(parts))
    assert np.array_equal(bm, bm2)
    # no false negatives
    assert bloom.bloom_contains(bm, keys).all()
    # FP rate at 5k keys / 2^20 bits is ~0: fresh keys almost never hit
    fresh = rng.integers(0, 2**63, 5000).astype(np.uint64)
    fresh = fresh[~np.isin(fresh, keys)]
    assert bloom.bloom_contains(bm, fresh).mean() < 0.01


def test_bloom_tiny_filter_saturates():
    """At m=64 bits and 100 keys the filter must answer maybe for
    (nearly) everything — the regime the FP-forcing dedup test uses."""
    keys = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
    bm = bloom.bloom_partial(keys, 64, 2)
    probe = (np.arange(500, dtype=np.uint64) + np.uint64(10_000)) * np.uint64(97)
    assert bloom.bloom_contains(bm, probe, 64, 2).mean() > 0.9


def _make_corpus():
    """40 docs; texts chosen so several NEW docs (id % 7 != 0) duplicate
    REFERENCE docs (id % 7 == 0) and several duplicate only each other."""
    texts = []
    for i in range(40):
        if i % 5 == 0:
            texts.append("shared banner text")  # spans both slices
        elif i % 5 == 1:
            texts.append(f"unique doc {i}")
        elif i % 5 == 2:
            texts.append("new-side repeated text")  # never in slice 0? (7,12,17..)
        elif i % 5 == 3:
            texts.append("ref only " + ("x" if i == 28 else f"u{i}"))
        else:
            texts.append("")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": texts,
            "source": "s0",
            "lang": "en",
        }
    )
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    return df


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    ref = set(df[df["doc_id"] % textops._INC_REF_MOD == 0]["text"])
    keep = df[(df["doc_id"] % textops._INC_REF_MOD != 0) & ~df["text"].isin(ref)]
    return keep[["doc_id", "text"]].sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("incdedup_docs")
    _make_corpus().to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("m_bits", [None, 64])
def test_incremental_dedup_planted(ray_session, corpus_dir, m_bits):
    """m_bits=None: production filter (candidates = true dups only);
    m_bits=64: saturated filter forces (nearly) every new doc through the
    verify co-group — the exact output must be IDENTICAL either way
    (false positives die in the verify, negatives were never dups)."""
    got = (
        textops.incremental_dedup(corpus_dir, m_bits=m_bits)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute(_make_corpus())
    pd.testing.assert_frame_equal(got, want)
    df = _make_corpus()
    # the plant worked: some new docs were dropped, some kept
    n_new = (df["doc_id"] % textops._INC_REF_MOD != 0).sum()
    assert 0 < len(want) < n_new
