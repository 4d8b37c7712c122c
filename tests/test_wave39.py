"""Wave 39: vocab_drift (webtext) — pure-Python reference over a
planted-drift corpus + block invariance. tests/test_oracle.py pins the
SQL twin."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import webtext


def _make_docs():
    # even docs (slice A) overuse 'spamword'; 'stable' is balanced;
    # 'afresh'/'bfresh' exist in only one slice (extreme drift)
    texts = []
    for i in range(40):
        # both slices emit 7 tokens/doc so slice TOTALS are equal and the
        # balanced controls really are rate-balanced
        words = ["stable", "stable", "common"]
        if i % 2 == 0:
            words += ["spamword"] * 3 + ["afresh"]
        else:
            words += ["spamword", "pad"] if i % 4 == 1 else ["pad", "pad"]
            words += ["bfresh", "pad"]
        texts.append(" ".join(words))
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
def drift_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("drift_docs")
    _make_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _brute_drift(docs: pd.DataFrame):
    ca, cb = Counter(), Counter()
    for _, r in docs.iterrows():
        (ca if r["doc_id"] % 2 == 0 else cb).update(r["text"].split())
    n_a, n_b = sum(ca.values()), sum(cb.values())
    out = {}
    for tok in set(ca) | set(cb):
        oa, ob = ca.get(tok, 0), cb.get(tok, 0)
        fl = int(
            webtext._VD_DEN * abs(oa * n_b - ob * n_a)
            > webtext._VD_NUM * (oa * n_b + ob * n_a)
        )
        out[tok] = (oa, ob, fl)
    return out


def test_vocab_drift_bruteforce(ray_session, drift_dir):
    want = _brute_drift(_make_docs())
    got = webtext.vocab_drift(drift_dir).to_pandas()
    got_d = {
        r["tok"]: (int(r["o_a"]), int(r["o_b"]), int(r["drifted"]))
        for _, r in got.iterrows()
    }
    assert got_d == want
    # the planted pattern is detected
    assert got_d["spamword"][2] == 1
    assert got_d["afresh"][2] == 1      # slice-exclusive token
    assert got_d["bfresh"][2] == 1
    assert got_d["stable"][2] == 0      # balanced token stays clean
    assert got_d["common"][2] == 0


def test_vocab_drift_block_invariance(ray_session, drift_dir, monkeypatch):
    import pyarrow as pa

    base = webtext.vocab_drift(drift_dir).to_pandas()
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
    alt = webtext.vocab_drift(drift_dir).to_pandas()
    pd.testing.assert_frame_equal(
        base.sort_values("tok").reset_index(drop=True),
        alt.sort_values("tok").reset_index(drop=True),
    )
