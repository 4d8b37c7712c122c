"""Wave 44: degree_assortativity (webgraph) + source_lang_entropy
(webtext) — pure-Python references. tests/test_oracle.py pins the SQL
twins."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import relational3, webgraph, webtext


def _make_docs(n):
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["w w"] * n,
            "lang": "en",
            "source": "s0",
            "n_chars": np.int64(3),
        }
    )


# n=55/100 give VARYING out-degrees (rule self-link exclusions differ per
# node); n=60/77 are constant-out-degree -> the degenerate-design guard
@pytest.fixture(scope="module", params=[55, 100])
def graph_dir(tmp_path_factory, request):
    n = request.param
    d = tmp_path_factory.mktemp(f"da_docs_{n}")
    _make_docs(n).to_parquet(d / "documents.parquet", index=False)
    return n, str(d)


def _brute_assortativity(n):
    edges = set()
    for did in range(n):
        for m, a in webgraph._LINK_RULES:
            t = (did * m + a) % n
            if t != did:
                edges.add((did, t))
    od, idg = Counter(), Counter()
    for s, t in edges:
        od[s] += 1
        idg[t] += 1
    xs = [od[s] for s, t in edges]
    ys = [idg[t] for s, t in edges]
    ne = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = ne * sxx - sx * sx
    td = relational3._trunc_div
    return (
        ne,
        td((ne * sxy - sx * sy) * 1_000_000, den),
        td((sxx * sy - sx * sxy) * 1_000_000, den),
    )


def test_degree_assortativity_bruteforce(ray_session, graph_dir):
    n, d = graph_dir
    ne, slope, intercept = _brute_assortativity(n)
    got = webgraph.degree_assortativity(d).to_pandas().iloc[0]
    assert int(got["n_edges"]) == ne
    assert int(got["slope_micro"]) == slope
    assert int(got["intercept_micro"]) == intercept


def test_degree_assortativity_degenerate_nulls(ray_session, tmp_path_factory):
    # constant out-degree (n=60 rule graph): den == 0 -> the slope is
    # undefined; the op reports NULL coefficients instead of raising
    # (the sf0.1 synthesized graph IS constant-out-degree, so a raise
    # crashed the bench suite; the SQL twin's NULLIF produces the same
    # NULLs)
    d = tmp_path_factory.mktemp("da_docs_const")
    _make_docs(60).to_parquet(d / "documents.parquet", index=False)
    got = webgraph.degree_assortativity(str(d)).to_pandas().iloc[0]
    assert int(got["n_edges"]) > 0
    assert pd.isna(got["slope_micro"]) and pd.isna(got["intercept_micro"])


def test_source_lang_entropy_bruteforce(ray_session, tmp_path_factory):
    rows = (
        [("s_pure", "en")] * 10                       # one lang -> 0
        + [("s_mixed", "en")] * 5 + [("s_mixed", "fr")] * 5   # even mix
        + [("s_skew", "en")] * 9 + [("s_skew", "zh")] * 1     # skewed mix
    )
    df = pd.DataFrame(rows, columns=["source", "lang"])
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    df["text"] = "w"
    df["n_chars"] = np.int64(1)
    d = tmp_path_factory.mktemp("sle_docs")
    df.to_parquet(d / "documents.parquet", index=False)

    want = {}
    for src, g in df.groupby("source"):
        n = len(g)
        ent = sum(
            c * math.floor(math.log(n / c) * 1_000_000)
            for c in Counter(g["lang"]).values()
        )
        want[src] = (n, ent)
    got = webtext.source_lang_entropy(str(d)).to_pandas()
    got_d = {
        r["source"]: (int(r["n_docs"]), int(r["ent_micro"]))
        for _, r in got.iterrows()
    }
    assert got_d == want
    assert got_d["s_pure"][1] == 0
    assert got_d["s_mixed"][1] > got_d["s_skew"][1] > 0
