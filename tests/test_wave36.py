"""Wave 36/37: basket_pairs (relational3) + effective_diameter
(webgraph) — pure-Python references. BASKET_PAIRS_SQL is pinned by
tests/test_oracle.py; effective_diameter is sketch-defined (rows-only)
and pinned here against exact BFS."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import relational3, webgraph

N_ORDERS = 60
TYPES = ["brass", "copper", "nickel", "steel", "tin"]


def _make_tables():
    # deterministic baskets: order k holds types {k%5, (k+1)%5} and every
    # third order adds type (k+2)%5 — plenty of pairs above support 10,
    # some below (filter edge), plus duplicate lineitems per (order,type)
    # to exercise the DISTINCT collapse
    li_rows, part_rows = [], []
    for t_i, t in enumerate(TYPES):
        for copy in range(4):  # several parts share a type
            part_rows.append((t_i * 10 + copy, t))
    for k in range(N_ORDERS):
        tids = [k % 5, (k + 1) % 5]
        if k % 3 == 0:
            tids.append((k + 2) % 5)
        for t_i in tids:
            li_rows.append((k, t_i * 10 + k % 4))
            li_rows.append((k, t_i * 10 + (k + 1) % 4))  # dup type per order
    # anti-correlated block: copper-heavy and tin-heavy orders that almost
    # never co-occur -> (copper,tin) and (nickel,steel) get NEGATIVE lift
    # above the support floor (checked offline against the brute force)
    nid = 100
    blocks = [({"copper", "nickel"}, 30), ({"tin", "steel"}, 30),
              ({"copper", "tin"}, 10)]
    tid_of = {t: i for i, t in enumerate(TYPES)}
    for types_set, reps in blocks:
        for _ in range(reps):
            for t in types_set:
                li_rows.append((nid, tid_of[t] * 10))
            nid += 1
    li = pd.DataFrame(li_rows, columns=["l_orderkey", "l_partkey"])
    part = pd.DataFrame(part_rows, columns=["p_partkey", "p_type"])
    part["p_name"] = part["p_type"]
    part["p_brand"] = "b"
    part["p_size"] = np.int32(1)
    part["p_retailprice"] = 1.0
    return li, part


@pytest.fixture(scope="module")
def basket_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("basket_tables")
    li, part = _make_tables()
    li.to_parquet(d / "lineitem.parquet", index=False)
    part.to_parquet(d / "part.parquet", index=False)
    return str(d)


def _brute_baskets():
    li, part = _make_tables()
    tof = part.set_index("p_partkey")["p_type"].to_dict()
    baskets: dict[int, set] = {}
    for _, r in li.iterrows():
        baskets.setdefault(int(r["l_orderkey"]), set()).add(tof[int(r["l_partkey"])])
    n_orders = len(baskets)
    singles: Counter = Counter()
    pairs: Counter = Counter()
    for b in baskets.values():
        singles.update(b)
        pairs.update(combinations(sorted(b), 2))
    out = {}
    for (a, b), nb in pairs.items():
        if nb >= relational3._BK_MIN_SUP:
            out[(a, b)] = (
                nb,
                singles[a],
                singles[b],
                n_orders,
                int(nb * n_orders > singles[a] * singles[b]),
            )
    return out


def test_basket_pairs_bruteforce(ray_session, basket_dir):
    want = _brute_baskets()
    assert want  # the fixture clears the support floor
    got = relational3.basket_pairs(basket_dir).to_pandas()
    got_d = {
        (r["type_a"], r["type_b"]): (
            int(r["n_both"]), int(r["n_a"]), int(r["n_b"]),
            int(r["n_orders"]), int(r["lift_positive"]),
        )
        for _, r in got.iterrows()
    }
    assert got_d == want
    # both lift polarities appear (the flag is not vacuous)
    flags = {v[4] for v in got_d.values()}
    assert flags == {0, 1}


# ---------------------------------------------------------------------------
# effective_diameter vs exact BFS
# ---------------------------------------------------------------------------


def _make_docs(n):
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["w w w"] * n,
            "lang": "en",
            "source": "s0",
            "n_chars": np.int64(5),
        }
    )


@pytest.fixture(scope="module")
def graph_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("effdiam_docs")
    _make_docs(60).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _exact_eff_diameter(n=60):
    A = np.eye(n, dtype=bool)
    for did in range(n):
        for m, a in webgraph._LINK_RULES:
            t = (did * m + a) % n
            A[did, t] = True
    R = np.eye(n, dtype=bool)
    nf = [float(R.sum())]
    for _ in range(webgraph._HA_ITERS):
        R = R | (A @ R)
        nf.append(float(R.sum()))
    target = webgraph._ED_NUM / webgraph._ED_DEN * nf[-1]
    for h, cur in enumerate(nf):
        if cur >= target:
            if h == 0:
                return 0.0
            prev = nf[h - 1]
            return (h - 1) + (target - prev) / (cur - prev)
    return float(len(nf) - 1)


def test_effective_diameter_tracks_bfs(ray_session, graph_dir):
    got = webgraph.effective_diameter(graph_dir).to_pandas().iloc[0]
    d = int(got["eff_diameter_micro"]) / 1e6
    exact = _exact_eff_diameter()
    assert 0.0 <= d <= webgraph._HA_ITERS
    # 256-register HLL per node; the 60-node sum keeps most of the noise,
    # so allow a generous absolute band around the exact interpolation
    assert abs(d - exact) <= 0.5, (d, exact)
    assert int(got["n_nodes"]) == 60
    assert int(got["nf_final_micro"]) > 0


# ---------------------------------------------------------------------------
# media_dedup with planted duplicate payloads
# ---------------------------------------------------------------------------


def test_media_dedup_planted(ray_session, tmp_path_factory):
    from osmwaterwayextractor_ray.pipelines import multimodal

    texts = ["same blob", "same blob", "unique a", "same blob", "unique b", ""]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    d = tmp_path_factory.mktemp("media_dedup_docs")
    df.to_parquet(d / "documents.parquet", index=False)
    got = multimodal.media_dedup(str(d)).to_pandas()
    got_d = {
        int(r["doc_id"]): (int(r["n_copies"]), int(r["n_bytes"]))
        for _, r in got.iterrows()
    }
    assert got_d == {0: (3, 9), 2: (1, 8), 4: (1, 8), 5: (1, 0)}
