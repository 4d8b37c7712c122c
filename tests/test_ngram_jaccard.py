"""Completeness + exactness of the prefix-filtered n-gram Jaccard join.

The oracle SQL (tests/test_oracle.py) already pins the driver surface; this
suite pins the part an oracle can't see — that prefix filtering under the
hash total order NEVER misses a qualifying pair — by comparing the full
pipeline against a brute-force all-pairs computation on a corpus built to
stress the filter (heavy shingle overlap, planted near-identical pairs,
docs below the shingle length, duplicate texts)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.functions.text import word_ngram_hashes

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _make_docs(n=120, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        L = int(rng.integers(0, 30))
        toks = [VOCAB[int(v)] for v in rng.integers(0, len(VOCAB), L)]
        rows.append((i, " ".join(toks)))
    # planted: near-identical pair, exact duplicate pair, short docs
    base = " ".join(VOCAB * 4)
    rows.append((n, base))
    rows.append((n + 1, base + " alpha"))
    rows.append((n + 2, base))
    rows.append((n + 3, "alpha beta"))  # < 3 tokens -> no shingles
    rows.append((n + 4, ""))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _brute_force(df: pd.DataFrame, tau: float) -> pd.DataFrame:
    sets = {
        r.doc_id: set(word_ngram_hashes(r.text).tolist()) for r in df.itertuples()
    }
    out = []
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            jac = inter / union
            if jac >= tau:
                out.append((a, b, inter, union, jac))
    return pd.DataFrame(
        out, columns=["id_a", "id_b", "n_inter", "n_union", "jaccard"]
    )


@pytest.mark.parametrize("tau", [0.3, 0.5, 0.8])
def test_matches_brute_force(ray_session, tmp_path, tau):
    import ray.data as rd

    from osmwaterwayextractor_ray.pipelines.textops import ngram_jaccard_neardup

    df = _make_docs()
    path = tmp_path / "docs"
    path.mkdir()
    df.to_parquet(path / "documents.parquet", index=False)

    got = (
        ngram_jaccard_neardup(str(path), threshold=tau)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = (
        _brute_force(df, tau).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_prefix_lemma_edge_cases():
    """The emitted prefix length is |d| - ceil(tau*|d|) + 1 and is always
    in [1, |d|] for tau in (0, 1]."""
    for n in range(1, 200):
        for tau in (0.1, 0.5, 0.9, 1.0):
            p = n - int(np.ceil(tau * n)) + 1
            assert 1 <= p <= n
