"""Wave 34: doc_entropy + bigram_lm_quality (webtext) — pure-Python
references + block invariance. tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import webtext

SC = 1_000_000


def _docs(texts):
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


# ---------------------------------------------------------------------------
# doc_entropy
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ent_dir(tmp_path_factory):
    texts = [
        "a a b",        # skewed
        "a b c d",      # uniform
        "a",            # single token -> 0
        "a a a a",      # constant -> 0
        "",             # empty -> dropped
        "x y x y x z",  # mixed
    ]
    d = tmp_path_factory.mktemp("ent_docs")
    _docs(texts).to_parquet(d / "documents.parquet", index=False)
    return str(d), texts


def _brute_entropy(texts):
    out = {}
    for did, t in enumerate(texts):
        toks = t.split()
        n = len(toks)
        if n == 0:
            continue
        c = Counter(toks)
        out[did] = (
            n,
            sum(ci * math.floor(math.log(n / ci) * SC) for ci in c.values()),
        )
    return out


def test_doc_entropy_bruteforce(ray_session, ent_dir):
    d, texts = ent_dir
    want = _brute_entropy(texts)
    got = webtext.doc_entropy(d).to_pandas()
    got_d = {
        int(r["doc_id"]): (int(r["n_tokens"]), int(r["ent_micro"]))
        for _, r in got.iterrows()
    }
    assert got_d == want
    assert got_d[2][1] == 0       # single token
    assert got_d[3][1] == 0       # constant doc
    assert 4 not in got_d          # empty doc dropped
    # uniform beats skewed at equal support
    assert got_d[1][1] / 4 > got_d[0][1] / 3


# ---------------------------------------------------------------------------
# bigram_lm_quality
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lm2_dir(tmp_path_factory):
    # doc 0 and 10 are the training slice; others score against it,
    # including unseen tokens (OOV path) and unseen contexts
    texts = [
        "the cat sat on the mat",          # slice (doc 0)
        "the cat sat",                      # seen bigrams
        "the dog sat",                      # 'dog' is OOV
        "mat the cat",                      # unseen context 'mat the'
        "zz yy",                            # all OOV
        "the",                              # single token: BOS bigram only
        "",                                 # empty: dropped
        "on on on",                         # seen tokens, unseen bigram
        "cat sat on the mat the cat",
        "sat sat",
        "on the mat sat the cat here",     # 'here' OOV
    ]
    d = tmp_path_factory.mktemp("lm2_docs")
    _docs(texts).to_parquet(d / "documents.parquet", index=False)
    return str(d), texts


def _brute_bigram_lm(texts):
    mod = webtext._LM2_SLICE_MOD
    slice_toks = []
    for did, t in enumerate(texts):
        if did % mod == 0:
            slice_toks.extend(t.split())
    uc = Counter(slice_toks)
    vocab = set(sorted(uc, key=lambda x: (-uc[x], x))[: webtext._LM2_V_CAP])
    V = len(vocab)
    BOS, OOV = "\x01", "\x02"

    def mapped(t):
        toks = [x if x in vocab else OOV for x in t.split()]
        return list(zip([BOS] + toks[:-1], toks)) if toks else []

    c12: Counter = Counter()
    for did, t in enumerate(texts):
        if did % mod == 0:
            c12.update(mapped(t))
    c1: Counter = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    out = {}
    for did, t in enumerate(texts):
        bgs = mapped(t)
        if not bgs:
            continue
        cost = sum(
            math.floor(
                -math.log((c12.get(bg, 0) + 1) / (c1.get(bg[0], 0) + V + 2)) * SC
            )
            for bg in bgs
        )
        out[did] = (len(bgs), cost)
    return out


def test_bigram_lm_bruteforce(ray_session, lm2_dir):
    d, texts = lm2_dir
    want = _brute_bigram_lm(texts)
    got = webtext.bigram_lm_quality(d).to_pandas()
    got_d = {
        int(r["doc_id"]): (int(r["n_bigrams"]), int(r["lm2_cost"]))
        for _, r in got.iterrows()
    }
    assert got_d == want
    assert 6 not in got_d            # empty doc dropped
    assert got_d[5][0] == 1          # single-token doc: the BOS bigram
    # the all-OOV doc really costs more per bigram than the seen one
    assert got_d[4][1] / got_d[4][0] > got_d[1][1] / got_d[1][0]


def test_bigram_lm_block_invariance(ray_session, lm2_dir, monkeypatch):
    import pyarrow as pa

    d, _ = lm2_dir
    base = webtext.bigram_lm_quality(d).to_pandas()
    real = webtext._read_documents

    def spread(sf_dir, columns):
        ds = real(sf_dir, columns)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 4, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(webtext, "_read_documents", spread)
    alt = webtext.bigram_lm_quality(d).to_pandas()
    pd.testing.assert_frame_equal(
        base.sort_values("doc_id").reset_index(drop=True),
        alt.sort_values("doc_id").reset_index(drop=True),
    )
