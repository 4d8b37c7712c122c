"""Misra-Gries heavy hitters: guarantee and error-bound regimes."""

import numpy as np

from osmwaterwayextractor_ray.state.heavyhitters import (
    approx_top_k,
    mg_merge,
    mg_partial,
)


def _zipf_stream(n=200_000, n_keys=50_000, seed=3):
    rs = np.random.RandomState(seed)
    return rs.zipf(1.3, size=n).astype(np.int64) % n_keys


def test_exact_when_under_capacity():
    keys = np.arange(100, dtype=np.int64).repeat(7)
    pk, pc = mg_partial(keys, None, k=256)
    assert len(pk) == 100 and (pc == 7).all()


def test_guarantee_and_undercount_bound():
    """Every key with true count > n/k must survive, and residuals never
    exceed true counts (undercount-only)."""
    k = 64
    v = _zipf_stream()
    true = {}
    uk, uc = np.unique(v, return_counts=True)
    true = dict(zip(uk.tolist(), uc.tolist()))
    pk, pc = mg_partial(v, None, k=k)
    surv = dict(zip(pk.tolist(), pc.tolist()))
    thresh = len(v) / k
    for key, cnt in true.items():
        if cnt > thresh:
            assert key in surv, f"guaranteed heavy key {key} (count {cnt}) lost"
    for key, resid in surv.items():
        assert resid <= true[key]


def test_merge_preserves_guarantee():
    k = 64
    v = _zipf_stream()
    chunks = np.array_split(v, 9)
    parts = [mg_partial(c, None, k=k) for c in chunks]
    mk, mc = mg_merge([p[0] for p in parts], [p[1] for p in parts], k=k)
    surv = set(mk.tolist())
    uk, uc = np.unique(v, return_counts=True)
    for key, cnt in zip(uk.tolist(), uc.tolist()):
        if cnt > len(v) / k * 2:  # 2x slack: partial+merge stacks two trims
            assert key in surv


def test_trim_flag_regimes(ray_session):
    """return_trimmed certifies exactness: False when distinct <= k (and
    counts exact), True once any stage exceeds capacity."""
    import pyarrow as pa
    import ray.data as rd

    small = np.arange(100, dtype=np.int64).repeat(9)
    ds = rd.from_arrow(pa.table({"k": pa.array(small)})).repartition(5)
    keys, counts, trimmed = approx_top_k(ds, "k", k=256, top=5, return_trimmed=True)
    assert not trimmed
    assert (counts == 9).all()  # no-trim => exact

    wide = np.arange(5000, dtype=np.int64)  # 5000 distinct > k=256
    ds2 = rd.from_arrow(pa.table({"k": pa.array(wide)})).repartition(4)
    _, _, trimmed2 = approx_top_k(ds2, "k", k=256, top=5, return_trimmed=True)
    assert trimmed2


def test_approx_top_k_dataset(ray_session):
    import pyarrow as pa
    import ray.data as rd

    v = np.concatenate([np.full(5000, 7), np.full(3000, 11), _zipf_stream(20_000, 500)])
    ds = rd.from_arrow(pa.table({"k": pa.array(v.astype(np.int64))})).repartition(7)
    keys, counts = approx_top_k(ds, "k", k=128, top=5)
    assert keys[0] == 7  # the heaviest planted key leads
    assert 11 in keys.tolist()  # second planted heavy survives in top-5
    assert counts[0] <= 5000 + 20_000  # residuals bounded by totals
