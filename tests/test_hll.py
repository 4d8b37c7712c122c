"""HyperLogLog sketch (state/hll.py): error bounds, merge invariance,
duplicate insensitivity, and the Dataset-level approx_distinct path."""

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.state.hll import (
    DEFAULT_P,
    hll_estimate,
    hll_merge,
    hll_partial,
)


def test_error_bound_large():
    # p=14 -> ~0.81% standard error; 2.5% is a >3-sigma bound
    n = 200_000
    est = hll_estimate(hll_partial(np.arange(n, dtype=np.int64)))
    assert abs(est / n - 1.0) < 0.025


def test_small_regime_linear_counting():
    n = 150
    est = hll_estimate(hll_partial(np.arange(n, dtype=np.int64)))
    assert abs(est - n) <= 3


def test_duplicates_do_not_change_registers():
    v = np.arange(1000, dtype=np.int64)
    dup = np.concatenate([v, v, v[:100]])
    assert np.array_equal(hll_partial(v), hll_partial(dup))


def test_merge_equals_single_pass():
    v = np.arange(50_000, dtype=np.int64)
    whole = hll_partial(v)
    # any split: elementwise max of partials == one-pass registers
    parts = np.stack([hll_partial(c) for c in np.array_split(v, 7)])
    assert np.array_equal(hll_merge(parts), whole)


def test_approx_distinct_dataset_matches_direct(ray_session):
    import ray.data as rd

    from osmwaterwayextractor_ray.state.hll import approx_distinct

    v = (np.arange(30_000, dtype=np.int64) % 12_345) * 7919
    ds = rd.from_arrow(pa.table({"k": pa.array(v)})).repartition(13)
    got = approx_distinct(ds, "k")
    want = int(round(hll_estimate(hll_partial(v))))
    assert got == want  # merge associativity -> block-structure invariant
    assert abs(got / 12_345 - 1.0) < 0.025


def test_combine_honors_list_slice_offsets(ray_session):
    # A sliced list-array block (.values spans the WHOLE parent buffer)
    # must merge only its own window — regression for the offsets bug.
    import ray.data as rd

    from osmwaterwayextractor_ray.state.hll import approx_distinct

    v = np.arange(40_000, dtype=np.int64) * 2654435761
    # many partial rows so the combine stage sees multi-row list blocks
    ds = rd.from_arrow(pa.table({"k": pa.array(v)})).repartition(40)
    got = approx_distinct(ds, "k")
    want = int(round(hll_estimate(hll_partial(v))))
    assert got == want

    # direct unit check: combine over a SLICED list array
    regs = [hll_partial(c) for c in np.array_split(v, 6)]
    la = pa.array(regs, type=pa.list_(pa.uint8()))
    sliced = la.slice(2, 3)
    offs = sliced.offsets.to_numpy(zero_copy_only=False)
    flat = sliced.values.to_numpy(zero_copy_only=False)
    window = flat[offs[0] : offs[-1]].reshape(len(sliced), -1)
    assert np.array_equal(hll_merge(window), hll_merge(np.stack(regs[2:5])))


def test_estimate_monotone_regimes():
    # crossing the linear-counting switch must not produce absurd jumps
    prev = 0.0
    for n in [100, 1_000, 10_000, 60_000, 250_000]:
        est = hll_estimate(hll_partial(np.arange(n, dtype=np.int64), DEFAULT_P))
        assert est > prev
        assert abs(est / n - 1.0) < 0.03
        prev = est
