"""Wave 58: media_phash_neardup (perceptual-hash near-dup over the
binary-payload modality) + the generic fastagg.hamming_selfjoin — pinned
by a brute-force O(n²) popcount reference (no SQL twin: the hash isn't
SQL-expressible)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import multimodal
from osmwaterwayextractor_ray.stages.fastagg import popcount64

SF = "/root/testdata/sf0.001"


def test_phash_stub_properties():
    p = b"The quick brown fox jumps over the lazy dog" * 12
    h = multimodal._phash_stub(p)
    assert 0 <= h < 1 << 64
    assert h == multimodal._phash_stub(p)  # deterministic
    # exact copy: hamming 0
    assert h == multimodal._phash_stub(bytes(p))
    # one flipped byte: small perceptual distance
    q = bytearray(p)
    q[0] ^= 0x01
    d = int(popcount64(np.array([h ^ multimodal._phash_stub(bytes(q))]))[0])
    assert d <= 2
    # empty payload works (padded)
    assert isinstance(multimodal._phash_stub(b""), int)


def _brute_pairs(prints: dict[int, int], max_h: int):
    ids = sorted(prints)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            d = int(
                popcount64(np.array([prints[a] ^ prints[b]], dtype=np.uint64))[
                    0
                ]
            )
            if d <= max_h:
                out.add((a, b, d))
    return out


def test_media_phash_neardup_vs_bruteforce(ray_session, tmp_path_factory):
    # small corpus so the O(n²) reference stays cheap
    rng = np.random.RandomState(17)
    texts = [
        "".join(chr(97 + rng.randint(0, 26)) for _ in range(300))
        for _ in range(40)
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": np.int64(300),
        }
    )
    d = tmp_path_factory.mktemp("phash_docs")
    df.to_parquet(d / "documents.parquet", index=False)

    got = multimodal.media_phash_neardup(str(d)).to_pandas()
    got_set = {
        (int(r["doc_a"]), int(r["doc_b"]), int(r["hamming"]))
        for _, r in got.iterrows()
    }

    # reference over the SAME planted corpus
    prints = {}
    for did, t in zip(df["doc_id"], df["text"]):
        p = t.encode("utf-8")
        prints[int(did)] = multimodal._phash_stub(p)
        if did % 10 == 0:
            prints[int(did) + 1_000_000] = multimodal._phash_stub(p)
            q = bytearray(p)
            q[0] ^= 0x01
            prints[int(did) + 2_000_000] = multimodal._phash_stub(bytes(q))
    want = _brute_pairs(prints, 3)
    assert got_set == want
    # the planted exact copies are guaranteed positives at hamming 0
    for did in range(0, 40, 10):
        assert (did, did + 1_000_000, 0) in got_set


def test_media_phash_neardup_sf0001(ray_session):
    """At sf0.001 the planted exact copies must all surface."""
    got = multimodal.media_phash_neardup(SF).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    planted = [i for i in ids if i % 10 == 0]
    assert planted
    for did in planted:
        assert (did, did + 1_000_000) in pairs
