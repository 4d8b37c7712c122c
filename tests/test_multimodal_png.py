"""Real-PNG multimodal paths (VERDICT r4 #6): the repo's stdlib codec
wired through the actor-pool decode/resize/phash stages. The exact SQL
oracles for media_png_features / media_png_resize run via
tests/test_oracle.py; here: determinism, an independent per-pixel
reference, the brute-force near-dup reference, and the dispatch contract
(stub only for the synthetic type, raise only for genuinely unknown)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from osmwaterwayextractor_ray.functions.png import decode_png, encode_png
from osmwaterwayextractor_ray.pipelines import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


def _expected_pixels(doc_id: int) -> np.ndarray:
    w, h, c = mm._png_dims(doc_id)
    g = np.arange(w * h * c, dtype=np.int64)
    return ((doc_id * 7 + g * 13) % 256).astype(np.uint8).reshape(h, w, c)


def test_png_features_match_per_pixel_reference(ray_session):
    """Distributed decode stats == a direct per-pixel numpy reference
    (independent of the SQL twin, which tests/test_oracle.py checks)."""
    df = mm.media_png_features(SF_DIR).to_pandas().set_index("doc_id").sort_index()
    assert len(df) == 500
    for did in range(0, 500, 37):
        px = _expected_pixels(did)
        row = df.loc[did]
        assert (row.height, row.width, row.channels) == px.shape
        assert row.px_sum == int(px.astype(np.int64).sum())


def test_png_resize_matches_numpy_reference(ray_session):
    """Thumbnail pixel sums == decode -> nearest-neighbor resample done
    directly in numpy (both codec directions exercised distributed)."""
    df = mm.media_png_resize(SF_DIR).to_pandas().set_index("doc_id").sort_index()
    assert len(df) == 500
    T = mm.PNG_THUMB
    for did in range(0, 500, 41):
        px = _expected_pixels(did)
        h, w = px.shape[:2]
        iy = (np.arange(T) * h) // T
        ix = (np.arange(T) * w) // T
        thumb = px[iy][:, ix]
        row = df.loc[did]
        assert (row.width, row.height) == (T, T)
        assert row.thumb_px_sum == int(thumb.astype(np.int64).sum())


def test_png_pipeline_deterministic(ray_session):
    a = mm.media_png_features(SF_DIR).to_pandas().sort_values("doc_id")
    b = mm.media_png_features(SF_DIR).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_png_phash_neardup_vs_bruteforce(ray_session):
    """Distributed hamming<=3 self-join == serial O(n²) popcount over
    independently recomputed per-payload hashes; planted exact copies all
    land at hamming 0."""
    got = mm.media_png_phash_neardup(SF_DIR).to_pandas()
    got_pairs = {
        (a, b): h for a, b, h in zip(got.doc_a, got.doc_b, got.hamming)
    }

    # independent serial corpus + hash recomputation (same formulas)
    prints = {}
    for did in range(500):
        payload = encode_png(_expected_pixels(did), filter_mode=did % 5)
        prints[did] = mm._phash_png(payload)
        if did % 10 == 0:
            prints[did + 1_000_000] = mm._phash_png(payload)
            px = decode_png(payload)
            px[0, 0, 0] ^= 0x01
            prints[did + 2_000_000] = mm._phash_png(
                encode_png(px, filter_mode=(did + 1) % 5)
            )

    ids = sorted(prints)
    want_pairs = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(prints[a] ^ prints[b]).count("1")
            if d <= 3:
                want_pairs[(a, b)] = d
    assert got_pairs == want_pairs
    for did in range(0, 500, 10):
        assert got_pairs[(did, did + 1_000_000)] == 0


def test_feature_extractor_dispatch_contract(ray_session):
    """'image/png' decodes REAL pixels (IHDR dims, not the stub's
    hash-derived fakes); unknown types raise NotImplementedError."""
    ext = mm.MediaFeatureExtractor()
    payload = encode_png(np.zeros((9, 11, 3), dtype=np.uint8))
    batch = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "media_type": pa.array(["image/png"]),
            "payload": pa.array([payload], type=pa.binary()),
        }
    )
    out = ext(batch)
    assert out["width"][0].as_py() == 11 and out["height"][0].as_py() == 9

    bad = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "media_type": pa.array(["audio/opus"]),
            "payload": pa.array([b"x"], type=pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        ext(bad)
    with pytest.raises(NotImplementedError):
        mm.MediaResizer()(bad)
    with pytest.raises(NotImplementedError):
        mm.MediaPHasher()(bad)
