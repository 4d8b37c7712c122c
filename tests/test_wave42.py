"""Wave 42: vocab_coverage + prefix_index (webtext) — pure-Python
references with rank ties across byte-prefix buckets.
tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import webtext


def _make_docs():
    # ties at the same count with different first bytes (bucket
    # interleave), prefixes that nest (a / ab / abc), 1-char tokens
    words = (
        ["abc"] * 9 + ["abd"] * 9 + ["zed"] * 9      # three-way count tie
        + ["ab"] * 4 + ["a"] * 3 + ["b"] * 2 + ["longword"] * 5
    )
    texts = [" ".join(words[i::3]) for i in range(3)] + [""]
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


@pytest.fixture(scope="module")
def vc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vc_docs")
    _make_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _token_counts():
    c = Counter()
    for t in _make_docs()["text"]:
        c.update(t.split())
    return c


def test_vocab_coverage_bruteforce(ray_session, vc_dir):
    c = _token_counts()
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    got = webtext.vocab_coverage(vc_dir).to_pandas()
    got_d = {
        int(r["k"]): (int(r["covered"]), int(r["total"]))
        for _, r in got.iterrows()
    }
    for k in webtext._VC_KS:
        want_cov = sum(cnt for _, cnt in ranked[:k])
        assert got_d[k] == (want_cov, total), k
    # the curve is monotone and saturates at the full vocabulary
    covs = [got_d[k][0] for k in webtext._VC_KS]
    assert covs == sorted(covs)
    assert got_d[max(webtext._VC_KS)][0] == total


def test_prefix_index_bruteforce(ray_session, vc_dir):
    c = _token_counts()
    want: dict[str, list[int]] = {}
    for tok, cnt in c.items():
        for ln in range(1, min(len(tok), webtext._PI_MAXLEN) + 1):
            e = want.setdefault(tok[:ln], [0, 0])
            e[0] += 1
            e[1] += cnt
    got = webtext.prefix_index(vc_dir).to_pandas()
    got_d = {
        r["prefix"]: [int(r["n_tokens"]), int(r["n_occurrences"])]
        for _, r in got.iterrows()
    }
    assert got_d == want
    # the nesting really exercises shared prefixes
    assert got_d["a"][0] >= 4   # a, ab, abc, abd all contribute to 'a'
    assert got_d["ab"][0] >= 3
    assert "long" in got_d and "longw" not in got_d  # maxlen cut
