"""Wave 43: event_transitions (relational3) + lang_source_pmi (webtext)
— pure-Python references. tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import relational3, webtext

US = 1_000_000
BASE = 1_700_000_000 * US


def test_event_transitions_bruteforce(ray_session, tmp_path_factory):
    rows = [
        # u1: view -> click -> purchase; same-ts tie broken by event_id
        (1, 0, BASE, "view"), (1, 1, BASE + 1, "click"),
        (1, 2, BASE + 2, "purchase"),
        # u2: two same-ts events — event_id orders them (error then view)
        (2, 3, BASE, "error"), (2, 4, BASE, "view"),
        # u3: single event -> no transition
        (3, 5, BASE, "click"),
        # u1 again later: purchase -> view
        (1, 6, BASE + 99, "view"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_us", "event_type"])
    ev = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype(np.int64),
            "ts": ev["ts_us"].astype("datetime64[us]"),
            "user_id": ev["user_id"].astype(np.int64),
            "event_type": ev["event_type"],
            "value": 1.0,
            "props": "",
        }
    )
    d = tmp_path_factory.mktemp("trans_events")
    ev.to_parquet(d / "events.parquet", index=False)
    got = relational3.event_transitions(str(d)).to_pandas()
    got_d = {
        (r["cur_type"], r["next_type"]): int(r["n_transitions"])
        for _, r in got.iterrows()
    }
    assert got_d == {
        ("view", "click"): 1,
        ("click", "purchase"): 1,
        ("purchase", "view"): 1,
        ("error", "view"): 1,
    }


def test_lang_source_pmi_bruteforce(ray_session, tmp_path_factory):
    # lang 'aa' correlates with source 's0'; 'bb' spreads evenly
    rows = []
    for i in range(60):
        if i % 3 == 0:
            rows.append(("aa", "s0"))
        elif i % 3 == 1:
            rows.append(("bb", f"s{i % 2}"))
        else:
            rows.append(("bb", "s1"))
    df = pd.DataFrame(rows, columns=["lang", "source"])
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    df["text"] = "w"
    df["n_chars"] = np.int64(1)
    d = tmp_path_factory.mktemp("lspmi_docs")
    df.to_parquet(d / "documents.parquet", index=False)

    cells = Counter(zip(df["lang"], df["source"]))
    ni = Counter(df["lang"])
    nj = Counter(df["source"])
    N = len(df)
    want = {
        (la, so): (
            c,
            math.floor(math.log((c * N) / (ni[la] * nj[so])) * 1_000_000),
        )
        for (la, so), c in cells.items()
    }
    got = webtext.lang_source_pmi(str(d)).to_pandas()
    got_d = {
        (r["lang"], r["source"]): (int(r["n_ij"]), int(r["pmi_micro"]))
        for _, r in got.iterrows()
    }
    assert got_d == want
    # the planted correlation is visible: aa-s0 strongly positive
    assert got_d[("aa", "s0")][1] > 500_000


# ---------------------------------------------------------------------------
# trade_flows (wave 45): exact-units property + cross/same-nation sanity
# ---------------------------------------------------------------------------


def test_trade_flows_exact_units(ray_session, tmp_path_factory):
    from osmwaterwayextractor_ray.pipelines import relational2

    # tiny star with hand-computable flows incl. a discount that makes
    # the 1e-4-unit exactness matter (19.99 * 0.97)
    d = tmp_path_factory.mktemp("tf_tables")
    pd.DataFrame(
        {"n_nationkey": np.array([0, 1], dtype=np.int32),
         "n_name": ["AAA", "BBB"],
         "n_regionkey": np.array([0, 0], dtype=np.int32)}
    ).to_parquet(d / "nation.parquet", index=False)
    pd.DataFrame(
        {"c_custkey": [10, 11], "c_nationkey": np.array([0, 1], dtype=np.int32)}
    ).to_parquet(d / "customer.parquet", index=False)
    pd.DataFrame(
        {"s_suppkey": [20, 21], "s_nationkey": np.array([0, 1], dtype=np.int32)}
    ).to_parquet(d / "supplier.parquet", index=False)
    pd.DataFrame(
        {"o_orderkey": [1, 2], "o_custkey": [10, 11]}
    ).to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2],
            "l_suppkey": [20, 21, 20],
            "l_extendedprice": [19.99, 100.00, 50.50],
            "l_discount": [0.03, 0.00, 0.10],
        }
    ).to_parquet(d / "lineitem.parquet", index=False)
    got = relational2.trade_flows(str(d)).to_pandas()
    got_d = {
        (r["supp_nation"], r["cust_nation"]): int(r["revenue_cents"])
        for _, r in got.iterrows()
    }
    # 19.99*0.97 = 19.3903 -> 193903 quarter-units -> 1939 cents (trunc)
    assert got_d == {
        ("AAA", "AAA"): (1999 * 97) // 100,
        ("BBB", "AAA"): 10000,
        ("AAA", "BBB"): (5050 * 90) // 100,
    }
