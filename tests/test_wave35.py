"""Wave 35: zipf_fit (webtext) — pure-Python reference with rank-tie
coverage across coarse byte-prefix buckets + block invariance.
tests/test_oracle.py pins the SQL twin."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import relational3, webtext


def _make_docs():
    # equal-count ties spanning DIFFERENT first bytes exercise the
    # coarse-bucket offset interleaving: apple==banana at c=8,
    # aa==bb==zz at c=1
    words = (
        ["apple"] * 8 + ["banana"] * 8 + ["cherry"] * 4 + ["zeta"] * 2
        + ["aa", "bb", "zz"]
    )
    texts = [
        " ".join(words[:9]),
        " ".join(words[9:18]),
        " ".join(words[18:]),
        "",
    ]
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
def zipf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("zipf_docs")
    _make_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _brute_zipf(docs: pd.DataFrame):
    c = Counter()
    for t in docs["text"]:
        c.update(t.split())
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    S = webtext._ZF_SCALE
    xs = [math.floor(math.log(r + 1) * S) for r in range(len(ranked))]
    ys = [math.floor(math.log(cnt) * S) for _, cnt in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = n * sxx - sx * sx
    td = relational3._trunc_div
    return (
        n,
        td((n * sxy - sx * sy) * webtext._ZF_OUT, den),
        td((sxx * sy - sx * sxy) * webtext._ZF_OUT, den),
    )


def test_zipf_bruteforce(ray_session, zipf_dir):
    n, slope, intercept = _brute_zipf(_make_docs())
    got = webtext.zipf_fit(zipf_dir).to_pandas().iloc[0]
    assert int(got["n_tokens"]) == n == 7
    assert int(got["slope_micro"]) == slope
    assert int(got["intercept_micro"]) == intercept
    assert slope < 0  # a real frequency decay


def test_zipf_block_invariance(ray_session, zipf_dir, monkeypatch):
    import pyarrow as pa

    base = webtext.zipf_fit(zipf_dir).to_pandas()
    real = webtext._read_documents

    def spread(sf_dir, columns):
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

    monkeypatch.setattr(webtext, "_read_documents", spread)
    alt = webtext.zipf_fit(zipf_dir).to_pandas()
    pd.testing.assert_frame_equal(base, alt)
