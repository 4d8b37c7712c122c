"""Wave 50: skyline_parts (Pareto frontier, relational3) and
pca_project (distributed PCA, embeddings) — independent references.
skyline's SQL twin is pinned by tests/test_oracle.py; pca has no SQL
twin (eigensolve) and is pinned here."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import embeddings, relational3

DIM = embeddings.DIM


def _parts(rows, d):
    df = pd.DataFrame(rows, columns=["p_partkey", "p_size", "p_retailprice"])
    df["p_partkey"] = df["p_partkey"].astype(np.int64)
    df["p_size"] = df["p_size"].astype(np.int32)
    df["p_name"] = "p"
    df["p_brand"] = "b"
    df["p_type"] = "t"
    df.to_parquet(d / "part.parquet", index=False)
    return str(d)


def _brute_skyline(rows):
    pts = [(k, s, round(p * 100)) for k, s, p in rows]
    out = []
    for k, s, c in pts:
        dominated = any(
            s2 >= s and c2 <= c and (s2 > s or c2 < c)
            for _, s2, c2 in pts
        )
        if not dominated:
            out.append((k, s, c))
    return sorted(out)


def test_skyline_bruteforce(ray_session, tmp_path_factory):
    rows = [
        (1, 10, 5.00),   # frontier
        (2, 10, 5.00),   # exact tie of 1 — both survive
        (3, 10, 6.00),   # dominated by 1 (same size, pricier)
        (4, 8, 4.00),    # frontier (smaller but cheaper)
        (5, 8, 4.50),    # dominated by 4
        (6, 12, 9.00),   # frontier (biggest)
        (7, 11, 9.00),   # dominated by 6 (same price, smaller)
        (8, 5, 4.00),    # dominated by 4 (same price, smaller)
        (9, 4, 3.00),    # frontier (cheapest)
    ]
    sf = _parts(rows, tmp_path_factory.mktemp("sky_parts"))
    got = relational3.skyline_parts(sf).to_pandas()
    got_t = sorted(
        (int(r["p_partkey"]), int(r["p_size"]), int(r["price_cents"]))
        for _, r in got.iterrows()
    )
    assert got_t == _brute_skyline(rows)


def test_skyline_random_vs_bruteforce(ray_session, tmp_path_factory):
    rng = np.random.RandomState(11)
    rows = [
        (i, int(rng.randint(1, 30)), float(rng.randint(100, 999)) / 10.0)
        for i in range(300)
    ]
    sf = _parts(rows, tmp_path_factory.mktemp("sky_rand"))
    got = relational3.skyline_parts(sf).to_pandas()
    got_t = sorted(
        (int(r["p_partkey"]), int(r["p_size"]), int(r["price_cents"]))
        for _, r in got.iterrows()
    )
    assert got_t == _brute_skyline(rows)


# ---------------------------------------------------------------------------
# pca_project
# ---------------------------------------------------------------------------


def _emb_table(mat, d):
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(mat), dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in mat],
            "label": np.zeros(len(mat), dtype=np.int32),
        }
    )
    df.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def _pca_reference(mat):
    """Single-process replica of the documented contract: exact integer
    moments on the 1e-6 grid, driver eigh, sign-fixed quantized
    eigenvectors, integer projection (n·q − S1)ᵀ wq. The parquet column
    is float32, so the reference must quantize the SAME float32-rounded
    values the engine reads."""
    mat = mat.astype(np.float32).astype(np.float64)
    q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    n = len(q)
    s1 = q.sum(axis=0)
    G = q.T @ q
    cov = (G.astype(np.float64) - np.outer(s1, s1).astype(np.float64) / n) / n
    evals, evecs = np.linalg.eigh(cov)
    W = evecs[:, ::-1][:, :2]
    for k in range(2):
        a = np.argmax(np.abs(W[:, k]))
        if W[a, k] < 0:
            W[:, k] = -W[:, k]
    wq = np.floor(W * 1e6 + 0.5).astype(np.int64)
    return (q * n - s1[None, :]) @ wq


def _planted_mat(n=257, seed=3):
    """Variance concentrated along two planted orthogonal directions."""
    rng = np.random.RandomState(seed)
    u = np.zeros(DIM); u[0], u[3] = 0.6, 0.8
    v = np.zeros(DIM); v[1], v[5] = 1.0, 0.0
    a = rng.standard_normal(n) * 0.3
    b = rng.standard_normal(n) * 0.1
    noise = rng.standard_normal((n, DIM)) * 0.005
    return np.clip(np.outer(a, u) + np.outer(b, v) + noise, -0.49, 0.49)


def test_pca_project_matches_reference(ray_session, tmp_path_factory):
    mat = _planted_mat()
    sf = _emb_table(mat, tmp_path_factory.mktemp("pca_emb"))
    got = (
        embeddings.pca_project(sf)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = _pca_reference(mat)
    assert np.array_equal(got["pc1"].to_numpy(), want[:, 0])
    assert np.array_equal(got["pc2"].to_numpy(), want[:, 1])
    # the planted dominant direction is recovered: pc1 correlates with a
    centered = got["pc1"].to_numpy().astype(np.float64)
    a_true = mat @ np.r_[0.6, 0.0, 0.0, 0.8, np.zeros(DIM - 4)]
    r = np.corrcoef(centered, a_true)[0, 1]
    assert abs(r) > 0.99
    # variance ordering: pc1 >= pc2
    assert got["pc1"].astype(np.float64).var() >= got["pc2"].astype(
        np.float64
    ).var()


def test_pca_project_block_invariance(ray_session, tmp_path_factory):
    """Bit-identical output regardless of parquet row-group layout."""
    mat = _planted_mat(n=101, seed=9)
    d1 = tmp_path_factory.mktemp("pca_a")
    d2 = tmp_path_factory.mktemp("pca_b")
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(mat), dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in mat],
            "label": np.zeros(len(mat), dtype=np.int32),
        }
    )
    df.to_parquet(d1 / "embeddings.parquet", index=False)
    df.to_parquet(d2 / "embeddings.parquet", index=False, row_group_size=7)
    a = (
        embeddings.pca_project(str(d1))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        embeddings.pca_project(str(d2))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
