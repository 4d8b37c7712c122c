"""Wave 31: exact-integer linear regression (relational3.price_model)
and proximity search (webtext.proximity_search) — independent
pure-Python references. tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import relational3, webtext


# ---------------------------------------------------------------------------
# price_model
# ---------------------------------------------------------------------------


def _make_tables(slope=-3.5, n_orders=40):
    rng = np.random.RandomState(7)
    rows_li, rows_o = [], []
    for ok in range(n_orders):
        nli = 1 + ok % 4
        qty = [float(1 + (ok * 3 + j) % 9) for j in range(nli)]
        for j, q in enumerate(qty):
            rows_li.append((ok, q))
        x = sum(qty)
        # exact-cents totalprice with real negative correlation + noise
        y_cents = int(200000 + slope * 100 * x) + int(rng.randint(0, 997))
        rows_o.append((ok, y_cents / 100.0))
    li = pd.DataFrame(rows_li, columns=["l_orderkey", "l_quantity"])
    o = pd.DataFrame(rows_o, columns=["o_orderkey", "o_totalprice"])
    return li, o


@pytest.fixture(scope="module")
def lr_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lr_tables")
    li, o = _make_tables()
    li.to_parquet(d / "lineitem.parquet", index=False)
    o.to_parquet(d / "orders.parquet", index=False)
    return str(d)


def _brute_lr(li: pd.DataFrame, o: pd.DataFrame):
    x_per = li.groupby("l_orderkey")["l_quantity"].sum().astype(int)
    j = pd.DataFrame(
        {
            "x": x_per,
            "y": np.rint(o.set_index("o_orderkey")["o_totalprice"] * 100).astype(
                int
            ),
        }
    ).dropna()
    n = len(j)
    sx, sy = int(j.x.sum()), int(j.y.sum())
    sxx, sxy = int((j.x * j.x).sum()), int((j.x * j.y).sum())
    den = n * sxx - sx * sx
    td = relational3._trunc_div
    return (
        n,
        td((n * sxy - sx * sy) * relational3._LR_SCALE, den),
        td((sxx * sy - sx * sxy) * relational3._LR_SCALE, den),
    )


def test_price_model_bruteforce(ray_session, lr_dir):
    li, o = _make_tables()
    n, slope, intercept = _brute_lr(li, o)
    got = relational3.price_model(lr_dir).to_pandas().iloc[0]
    assert int(got["n_orders"]) == n
    assert int(got["slope_micro"]) == slope
    assert int(got["intercept_micro"]) == intercept
    # the fixture's slope really is negative (trunc-div sign branch hit)
    assert slope < 0


def test_trunc_div_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for a, b in [(-7, 2), (7, -2), (-7, -2), (7, 2), (0, 5), (-1, 3)]:
        want = con.execute(f"SELECT {a} // {b}").fetchone()[0]
        assert relational3._trunc_div(a, b) == want, (a, b)


def test_price_model_degenerate_raises(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("lr_degenerate")
    pd.DataFrame(
        {"l_orderkey": [0, 1, 2], "l_quantity": [5.0, 5.0, 5.0]}
    ).to_parquet(d / "lineitem.parquet", index=False)
    pd.DataFrame(
        {"o_orderkey": [0, 1, 2], "o_totalprice": [1.0, 2.0, 3.0]}
    ).to_parquet(d / "orders.parquet", index=False)
    with pytest.raises(ValueError, match="degenerate"):
        relational3.price_model(str(d))


# ---------------------------------------------------------------------------
# proximity_search
# ---------------------------------------------------------------------------


def _brute_prox(docs, terms, w):
    out = {}
    for did, text in docs:
        toks = text.split()
        L = len(toks)
        if L == 0:
            continue
        n = 0
        for i in range(max(L - w + 1, 1)):
            win = toks[i : min(i + w, L)]
            if all(t in win for t in terms):
                n += 1
        if n:
            out[did] = n
    return out


@pytest.fixture(scope="module")
def prox_dir(tmp_path_factory):
    texts = [
        "scan merge window x x x x x",          # one window, exact width
        "scan x x x x x x merge window",        # terms split across > w
        "scan merge window",                    # shorter than w: one window
        "x scan merge window x scan merge window x",  # multiple windows
        "scan merge x x x x x x window",        # 9 tokens, no window has all
        "scan scan merge merge window window",  # repeats
        "",                                     # empty
        "x x x x x x x x x x",                  # no terms
        "window merge scan",                    # order-free
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    d = tmp_path_factory.mktemp("prox_docs")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d), [(i, t) for i, t in enumerate(texts)]


def test_proximity_bruteforce(ray_session, prox_dir):
    d, docs = prox_dir
    want = _brute_prox(docs, webtext.PROX_TERMS, webtext.PROX_W)
    got = webtext.proximity_search(d).to_pandas()
    got_d = {int(r["doc_id"]): int(r["n_windows"]) for _, r in got.iterrows()}
    assert got_d == want
    # fixture exercises: exact-width hit, cross-window miss, short doc,
    # multi-window doc
    assert want.get(0) == 1
    assert 1 not in want
    assert want.get(2) == 1
    assert want.get(3, 0) >= 2
    assert 4 not in want


def test_proximity_sf0001_nonempty(ray_session):
    got = webtext.proximity_search("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 0
    assert (got["n_windows"] >= 1).all()
