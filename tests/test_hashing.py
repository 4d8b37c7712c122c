"""xxh64 / base62 / id-generation parity tests.

Vectors for xxh64 come from the published xxHash test suite and the
python-xxhash README (these pin our pure-Python implementation to the real
algorithm, which the reference calls via the xxhash package, ref
osm_waterway_extractor.py:1096-1099)."""

import numpy as np

from osmwaterwayextractor_ray.functions.hashing import (
    edge_id,
    int_to_base62,
    node_id,
    node_ids_array,
    text_hash64,
    xxh64,
)


def test_xxh64_published_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", seed=1) == 0xD5AFBA1336A3BE4B
    # python-xxhash README example
    assert xxh64(b"Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1
    # >=32-byte path with seed
    assert xxh64(b"xxhash", seed=20141025) == 0xB559B98D844E0635


def test_xxh64_long_input():
    data = bytes(range(256)) * 10
    h1 = xxh64(data)
    assert h1 == xxh64(data)
    assert h1 != xxh64(data[:-1])
    assert 0 <= h1 < 2**64


def test_base62():
    assert int_to_base62(0) == "0"
    assert int_to_base62(61) == "z"
    assert int_to_base62(62) == "10"
    assert int_to_base62(62 * 62 + 1) == "101"


def test_node_id_shape_and_determinism():
    nid = node_id(52.51, 13.41)
    assert nid.startswith("n") and len(nid) <= 9
    assert nid == node_id(52.510000001, 13.409999999)  # rounds to same key
    assert nid != node_id(52.52, 13.41)
    # hashed string is the Python repr of the rounded floats: "52.51,13.41"
    expect = "n" + int_to_base62(xxh64(b"52.51,13.41"))[:8]
    assert nid == expect


def test_edge_id_determinism():
    a = edge_id("nAAAA", "nBBBB", 42, 0)
    assert a.startswith("e")
    assert a == edge_id("nAAAA", "nBBBB", 42, 0)
    assert a != edge_id("nBBBB", "nAAAA", 42, 0)
    assert a != edge_id("nAAAA", "nBBBB", 42, 1)


def test_node_ids_array_matches_scalar():
    lats = np.array([52.5, 52.51, 52.5])
    lons = np.array([13.4, 13.41, 13.4])
    ids = node_ids_array(lats, lons)
    assert list(ids) == [node_id(52.5, 13.4), node_id(52.51, 13.41), node_id(52.5, 13.4)]


def test_text_hash64():
    h = text_hash64(["abc", "abc", "abd"])
    assert h[0] == h[1] != h[2]
    assert h.dtype == np.uint64


def test_xxh64_windows_bit_identical():
    """The vectorized sliding-window XXH64 must match the scalar spec
    implementation for every window width it supports."""
    import numpy as np

    from osmwaterwayextractor_ray.functions.hashing import xxh64, xxh64_windows

    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 300, dtype=np.uint8))
    for k in (1, 4, 5, 7, 8, 9, 12, 16, 17, 24, 31):
        got = xxh64_windows(data, k)
        want = np.array(
            [xxh64(data[i : i + k]) for i in range(len(data) - k + 1)], dtype=np.uint64
        )
        assert np.array_equal(got, want), k
