"""Sequence-packing operators (pipelines/packing.py) — independent
pure-Python references + block invariance. tests/test_oracle.py pins the
SQL oracles; here the reference is a dict/list loop so the Ray pipeline
and the SQL can't share a bug."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import packing

N_DOCS = 70


def _make_docs(n=N_DOCS):
    # token counts spanning 0, <SEQ_LEN, ==SEQ_LEN, >SEQ_LEN and multiples
    counts = [0, 1, 127, 128, 129, 255, 256, 300][:]
    texts = [" ".join(["w"] * counts[i % len(counts)]) for i in range(n)]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": [f"s{i % 3}" for i in range(n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("packing_docs")
    _make_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _tok_counts(docs: pd.DataFrame) -> list[int]:
    return [len(t.split()) for t in docs["text"]]


def test_pack_sequences_bruteforce(ray_session, corpus_dir):
    docs = _make_docs()
    L = packing.SEQ_LEN
    want = []
    for did, nt in zip(docs["doc_id"], _tok_counts(docs)):
        rem = nt
        c = 0
        while rem > 0:
            want.append((did, c, min(rem, L)))
            rem -= L
            c += 1
    got = set(
        map(tuple, packing.pack_sequences(corpus_dir).to_pandas().to_numpy().tolist())
    )
    assert got == set(want)
    assert len(got) == len(want)  # no duplicate (doc, chunk) rows possible


def test_pack_chunks_bruteforce(ray_session, corpus_dir):
    docs = _make_docs()
    L = packing.SEQ_LEN
    start = 0
    want = {}
    for did, nt in zip(docs["doc_id"], _tok_counts(docs)):
        if nt == 0:
            want[did] = (nt, start, -1, -1)
        else:
            want[did] = (nt, start, start // L, (start + nt - 1) // L)
        start += nt
    got = packing.pack_chunks(corpus_dir).to_pandas()
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        nt, st, fc, lc = want[row["doc_id"]]
        assert row["n_tokens"] == nt
        assert row["start_tok"] == st
        assert row["first_chunk"] == fc
        assert row["last_chunk"] == lc


@pytest.mark.parametrize("op", ["pack_sequences", "pack_chunks"])
def test_block_invariance(ray_session, corpus_dir, monkeypatch, op):
    import pyarrow as pa

    fn = getattr(packing, op)
    base = fn(corpus_dir).to_pandas()

    real = packing._read_documents

    def spread(sf_dir, columns):
        ds = real(sf_dir, columns)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 5, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(packing, "_read_documents", spread)
    alt = fn(corpus_dir).to_pandas()
    cols = list(base.columns)
    assert list(alt.columns) == cols
    pd.testing.assert_frame_equal(
        alt.sort_values(cols).reset_index(drop=True),
        base.sort_values(cols).reset_index(drop=True),
    )
