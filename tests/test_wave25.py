"""Wave 25: asymmetric n-gram containment + blocked edit-distance dedup.

The full oracle-equality checks run via test_oracle.py (the new entries
are auto-parametrized); here we pin the kernel itself and the planted
semantics the oracles rely on."""

import random

import duckdb
import numpy as np
import pytest

from osmwaterwayextractor_ray.functions.text import banded_levenshtein

SF_DIR = "/root/testdata/sf0.001"


def _ref_lev(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    row = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, row[0] = row[0], i
        for j in range(1, lb + 1):
            cur = min(row[j] + 1, row[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, row[j] = row[j], cur
    return row[lb]


@pytest.mark.parametrize("d", [1, 2, 3])
def test_banded_levenshtein_vs_reference(d):
    rng = random.Random(1234 + d)
    As, Bs, want = [], [], []
    for _ in range(3000):
        a = bytes(rng.choice(b"abcx") for _ in range(rng.randint(0, 14)))
        if rng.random() < 0.5:  # half the cases: b = a with <= 3 edits
            b = bytearray(a)
            for _ in range(rng.randint(0, 3)):
                op = rng.random()
                if op < 0.34 and b:
                    b[rng.randrange(len(b))] = rng.choice(b"abcxyz")
                elif op < 0.67 and b:
                    del b[rng.randrange(len(b))]
                else:
                    b.insert(rng.randint(0, len(b)), rng.choice(b"abcxyz"))
            b = bytes(b)
        else:
            b = bytes(rng.choice(b"abcx") for _ in range(rng.randint(0, 14)))
        As.append(a)
        Bs.append(b)
        want.append(min(_ref_lev(a, b), d + 1))
    got = banded_levenshtein(As, Bs, d)
    assert got.tolist() == want


def test_banded_levenshtein_byte_semantics_match_duckdb():
    """DuckDB's levenshtein is BYTE-based (é vs e = 2); the engine kernel
    must agree on multi-byte input or the oracle would diverge on any
    non-ASCII corpus."""
    cases = [("é", "e"), ("日本", "日本x"), ("naïve", "naive"), ("", "ab"), ("abc", "abc")]
    con = duckdb.connect()
    want = [
        min(con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0], 4)
        for a, b in cases
    ]
    got = banded_levenshtein(
        [a.encode() for a, _ in cases], [b.encode() for _, b in cases], 3
    )
    assert got.tolist() == want


def test_containment_planted_excerpts(ray_session):
    """Every planted excerpt's trigram set is a subset of its base doc's,
    so the (base, base + _CT_OFF) pair must appear with containment 1.0."""
    import pyarrow.parquet as pq

    from osmwaterwayextractor_ray.pipelines.textops import (
        _CT_OFF,
        containment_neardup,
    )

    res = containment_neardup(SF_DIR).to_pandas()
    pairs = {(a, b): c for a, b, c in zip(res.id_a, res.id_b, res.containment)}
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    planted = 0
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        if did % 5 != 0:
            continue
        sp = (text or "").split(" ")
        if len(sp[: max(len(sp) // 2, 4)]) < 3:
            continue  # excerpt too short to shingle
        planted += 1
        assert pairs.get((did, did + _CT_OFF)) == 1.0, did
    assert planted > 0


def test_edit_dedup_planted_twins(ray_session):
    """Every planted twin differs from its base head by exactly one
    substituted byte, so (base, base + _ED_OFF) must appear with dist 1
    whenever the twin keeps its blocking key (first two words)."""
    import pyarrow.parquet as pq

    from osmwaterwayextractor_ray.pipelines.textops import (
        _ED_BLKW,
        _ED_HEAD,
        _ED_OFF,
        edit_dedup,
    )

    res = edit_dedup(SF_DIR).to_pandas()
    pairs = {(a, b): v for a, b, v in zip(res.id_a, res.id_b, res.dist)}
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    planted = 0
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        if did % 6 != 0:
            continue
        head = " ".join((text or "").split(" ")[:_ED_HEAD])
        if len(head) < 2:
            continue
        twin = head[:-1] + "#"
        blk = " ".join(head.split(" ")[:_ED_BLKW])
        if " ".join(twin.split(" ")[:_ED_BLKW]) != blk:
            continue  # edit fell inside the blocking key: legitimately unpaired
        planted += 1
        assert pairs.get((did, did + _ED_OFF)) == 1, did
    assert planted > 0


def test_edit_dedup_symmetric_distances(ray_session):
    """Reported distances are a symmetric metric slice: every pair's dist
    is within [0, _ED_D] and id_a < id_b exactly once per pair."""
    from osmwaterwayextractor_ray.pipelines.textops import _ED_D, edit_dedup

    res = edit_dedup(SF_DIR).to_pandas()
    assert (res.id_a < res.id_b).all()
    assert res.dist.between(0, _ED_D).all()
    assert not res.duplicated(["id_a", "id_b"]).any()
