"""Sequence-packing operators for LLM pretraining data prep (wave 7).

Both operators tokenize with the repo's whitespace tokenizer
(``functions/text.token_counts`` — the exact device behind
``token_totals`` and its oracle) and work in sequences of
``SEQ_LEN = 128`` tokens.

  * pack_sequences — per-document chunking: each doc's token stream is
    split into ceil(n_tokens / SEQ_LEN) chunks (final partial chunk
    kept), emitting one row per chunk. Stateless, shuffle-free: the
    flat-map shape every "split long docs for training" stage has.

  * pack_chunks — GLOBAL concat-order packing: documents are laid out
    end-to-end in doc_id order (the GPT-style "concatenate everything,
    then cut fixed windows" pretraining layout) and each doc reports its
    absolute token offset and the first/last training-chunk index it
    lands in. The global prefix sum is exact int64 and distributed:
    range-partition on doc_id, per-partition lexsort + cumsum, and only
    the P per-partition totals (O(P), not O(docs)) touch the driver to
    form the exclusive partition offsets. The tokenized projection is
    pinned via ``stages.pin`` so the totals pass and the offset pass
    share one tokenization (object store at bench scale, parquet spill
    at 100 TB via WWX_PIN_MODE).

Scale notes (100 TB bar): pack_sequences is embarrassingly parallel;
pack_chunks does ONE range shuffle over (doc_id, n_tokens) pairs — 16
bytes/doc, not the corpus — and the driver holds P integers. Results are
bit-identical under any block structure / num_cpus (integer sums under a
total doc_id order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.functions.text import token_counts
from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
from osmwaterwayextractor_ray.stages.pin import pin

SEQ_LEN = 128
_N_PARTS = 32

_TOKS_CTE = r"""
toks AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
"""


def pack_sequences(sf_dir: str):
    """Per-doc fixed-length chunking: (doc_id, chunk_idx, chunk_tokens)
    rows, SEQ_LEN tokens per chunk, final partial chunk kept; zero-token
    docs emit no chunks."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        nt = token_counts(texts).astype(np.int64)
        keep = nt > 0
        ids, nt = ids[keep], nt[keep]
        nch = (nt + SEQ_LEN - 1) // SEQ_LEN
        doc_rep = np.repeat(ids, nch)
        nch_rep = np.repeat(nch, nch)
        nt_rep = np.repeat(nt, nch)
        total = int(nch.sum())
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(nch) - nch, nch
        )
        chunk_tokens = np.where(
            chunk_idx < nch_rep - 1, SEQ_LEN, nt_rep - SEQ_LEN * (nch_rep - 1)
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, type=pa.int64()),
                "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
                "chunk_tokens": pa.array(chunk_tokens, type=pa.int64()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow", batch_size=8192)


PACK_SEQUENCES_SQL = f"""
WITH {_TOKS_CTE},
nz AS (
  SELECT doc_id, n_tokens, (n_tokens + {SEQ_LEN - 1}) // {SEQ_LEN} AS n_chunks
  FROM toks WHERE n_tokens > 0
)
SELECT doc_id, CAST(gs.c AS BIGINT) AS chunk_idx,
       CAST(CASE WHEN gs.c < n_chunks - 1 THEN {SEQ_LEN}
                 ELSE n_tokens - {SEQ_LEN} * (n_chunks - 1) END AS BIGINT)
         AS chunk_tokens
FROM nz, UNNEST(generate_series(0, n_chunks - 1)) AS gs(c)
"""


def pack_chunks(sf_dir: str):
    """Concat-order packing layout: (doc_id, n_tokens, start_tok,
    first_chunk, last_chunk) with start_tok the exact global token offset
    of the doc under doc_id order; zero-token docs get first/last = -1."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()  # O(1) scalar (parquet metadata count)

    def tokenize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        nt = token_counts(texts).astype(np.int64)
        part = np.minimum(ids * _N_PARTS // max(n_docs, 1), _N_PARTS - 1)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(nt, type=pa.int64()),
                "__rpart": pa.array(part, type=pa.int64()),
            }
        )

    toks = pin(
        ds.map_batches(tokenize, batch_format="pyarrow", batch_size=8192),
        "pack_chunks_toks",
    )

    # O(P) partition totals -> exclusive prefix offsets on the driver
    totals = grouped_agg(
        toks, ["__rpart"], {"tot": ("n_tokens", "sum")}, num_parts=4
    ).to_pandas()
    totals = totals.sort_values("__rpart")
    offsets = np.zeros(_N_PARTS, dtype=np.int64)
    np.add.at(offsets, totals["__rpart"].to_numpy(), totals["tot"].to_numpy())
    offsets = np.cumsum(offsets) - offsets  # exclusive prefix per part

    def layout(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        part = int(g.column("__rpart")[0].as_py())
        order = np.argsort(ids)
        ids, nt = ids[order], nt[order]
        cs = np.cumsum(nt)
        start = offsets[part] + cs - nt
        end = start + nt
        first = np.where(nt == 0, -1, start // SEQ_LEN)
        last = np.where(nt == 0, -1, (end - 1) // SEQ_LEN)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(nt, type=pa.int64()),
                "start_tok": pa.array(start, type=pa.int64()),
                "first_chunk": pa.array(first, type=pa.int64()),
                "last_chunk": pa.array(last, type=pa.int64()),
            }
        )

    return toks.groupby("__rpart").map_groups(layout, batch_format="pyarrow")


PACK_CHUNKS_SQL = f"""
WITH {_TOKS_CTE},
pre AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(SUM(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_tok
  FROM toks
)
SELECT doc_id, n_tokens, start_tok,
       CAST(CASE WHEN n_tokens = 0 THEN -1
                 ELSE start_tok // {SEQ_LEN} END AS BIGINT) AS first_chunk,
       CAST(CASE WHEN n_tokens = 0 THEN -1
                 ELSE (start_tok + n_tokens - 1) // {SEQ_LEN} END AS BIGINT)
         AS last_chunk
FROM pre
"""


# ---- deterministic epoch shuffle + shard layout (wave 10) ----

_TS_SHARDS = 16          # training shards (files/workers per epoch)
_TS_PARTS = 8            # hash-range parts per shard (rank parallelism)
_TS_M1 = 2654435761      # Knuth multiplicative (the weighted_sample family)
_TS_M2 = 2246822519      # xxhash PRIME32_2 — mixes chunk_idx independently


def train_shards(sf_dir: str):
    """Deterministic epoch shuffle: every training chunk from
    pack_sequences is assigned a shard and a position within that shard
    under a hash order — the \"global shuffle + shard\" layout step every
    pretraining data pipeline ends with. No RNG state: the permutation is
    h = (doc_id·M1 + chunk_idx·M2) mod 2^32, shard = h mod S, position =
    rank of (h, doc_id, chunk_idx) within the shard (total tie-break, so
    the layout is bit-reproducible and block-structure invariant).

    The within-shard rank is fully distributed (the pack_chunks device):
    chunks are bucketed by (shard, hash-range part); per-bucket counts —
    O(S·P) integers, not O(chunks) — reach the driver to form exclusive
    offsets; each bucket then sorts locally and adds its offset. One
    shuffle of (ids + hash) rows; the text never moves."""
    chunks = pack_sequences(sf_dir)

    def hashed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cidx = batch.column("chunk_idx").to_numpy(zero_copy_only=False)
        h = (ids * _TS_M1 + cidx * _TS_M2) % 4294967296
        shard = h % _TS_SHARDS
        rpart = h * _TS_PARTS // 4294967296
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "chunk_idx": batch["chunk_idx"],
                "chunk_tokens": batch["chunk_tokens"],
                "hv": pa.array(h, type=pa.int64()),
                "__g": pa.array(shard * _TS_PARTS + rpart, type=pa.int64()),
            }
        )

    hashed_ds = pin(
        chunks.map_batches(hashed, batch_format="pyarrow", batch_size=8192),
        "train_shards_hashed",
    )

    counts = grouped_agg(
        hashed_ds.map_batches(
            lambda b: pa.table(
                {
                    "__g": b["__g"],
                    "one": pa.array(np.ones(len(b), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=65536,
        ),
        ["__g"],
        {"n": ("one", "sum")},
        num_parts=4,
    ).to_pandas()
    n_g = np.zeros(_TS_SHARDS * _TS_PARTS, dtype=np.int64)
    n_g[counts["__g"].to_numpy()] = counts["n"].to_numpy()
    # exclusive prefix within each shard over its rpart blocks
    per_shard = n_g.reshape(_TS_SHARDS, _TS_PARTS)
    offs = (np.cumsum(per_shard, axis=1) - per_shard).ravel()

    def rank(g: pa.Table) -> pa.Table:
        gk = int(g.column("__g")[0].as_py())
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        cidx = g.column("chunk_idx").to_numpy(zero_copy_only=False)
        h = g.column("hv").to_numpy(zero_copy_only=False)
        order = np.lexsort((cidx, ids, h))
        pos = offs[gk] + np.arange(len(ids), dtype=np.int64)
        return pa.table(
            {
                "shard": pa.array(
                    np.full(len(ids), gk // _TS_PARTS, dtype=np.int64)
                ),
                "pos": pa.array(pos, type=pa.int64()),
                "doc_id": pa.array(ids[order], type=pa.int64()),
                "chunk_idx": pa.array(cidx[order], type=pa.int64()),
                "chunk_tokens": pa.array(
                    g.column("chunk_tokens").to_numpy(zero_copy_only=False)[order],
                    type=pa.int64(),
                ),
            }
        )

    return hashed_ds.groupby("__g").map_groups(rank, batch_format="pyarrow")


TRAIN_SHARDS_SQL = f"""
WITH chunks AS ({PACK_SEQUENCES_SQL}),
h AS (
  SELECT doc_id, chunk_idx, chunk_tokens,
         (doc_id * {_TS_M1} + chunk_idx * {_TS_M2}) % 4294967296 AS hv
  FROM chunks
)
SELECT CAST(hv % {_TS_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
            PARTITION BY hv % {_TS_SHARDS}
            ORDER BY hv, doc_id, chunk_idx) - 1 AS BIGINT) AS pos,
       doc_id, chunk_idx, chunk_tokens
FROM h
"""


# ---- token-balanced shard layout (wave 13) ----

_TB_SHARDS = 8
_TB_BUCKET_SHIFT = 4  # coarse rank bucket = n_tokens >> 4 (rank device)


def token_balanced_shards(sf_dir: str):
    """Static load balancing for heterogeneous document lengths: assign
    docs to {_TB_SHARDS} shards so per-shard token totals stay balanced —
    the layout step before batched inference / packing when doc sizes are
    skewed. Deterministic snake (boustrophedon) assignment over the docs
    sorted by (n_tokens DESC, doc_id): rank r goes to shard r%W on even
    rounds and W-1-(r%W) on odd rounds, which bounds the shard-total
    spread by one max-doc regardless of the length distribution.

    The global rank is distributed (the train_shards device) with the
    coarse bucket n_tokens >> {_TB_BUCKET_SHIFT}: bucket boundaries
    respect the sort order (the shift is monotone), per-bucket counts —
    O(occupied buckets) integers — form driver offsets, and each bucket
    sorts locally. Only skinny (doc_id, n_tokens) rows move."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        nt = token_counts(texts).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(nt, type=pa.int64()),
                "__b": pa.array(nt >> _TB_BUCKET_SHIFT, type=pa.int64()),
            }
        )

    rows = pin(
        ds.map_batches(toks, batch_format="pyarrow", batch_size=8192),
        "token_balanced_rows",
    )

    counts = grouped_agg(
        rows.map_batches(
            lambda b: pa.table(
                {"__b": b["__b"], "one": pa.array(np.ones(len(b), dtype=np.int64))}
            ),
            batch_format="pyarrow",
            batch_size=65536,
        ),
        ["__b"],
        {"n": ("one", "sum")},
        num_parts=4,
    ).to_pandas()
    # rank order is n_tokens DESC -> buckets consumed in DESC order
    counts = counts.sort_values("__b", ascending=False)
    c = counts["n"].to_numpy()
    ex = np.cumsum(c) - c
    offs = {int(b): int(o) for b, o in zip(counts["__b"].to_numpy(), ex)}

    def assign(g: pa.Table) -> pa.Table:
        b = int(g.column("__b")[0].as_py())
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nt))
        r = offs[b] + np.arange(len(ids), dtype=np.int64)
        w = _TB_SHARDS
        pos = r % w
        shard = np.where((r // w) % 2 == 0, pos, w - 1 - pos)
        return pa.table(
            {
                "doc_id": pa.array(ids[order], type=pa.int64()),
                "n_tokens": pa.array(nt[order], type=pa.int64()),
                "shard": pa.array(shard, type=pa.int64()),
            }
        )

    return rows.groupby("__b").map_groups(assign, batch_format="pyarrow")


TOKEN_BALANCED_SHARDS_SQL = f"""
WITH {_TOKS_CTE},
r AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS r
  FROM toks
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN (r // {_TB_SHARDS}) % 2 = 0 THEN r % {_TB_SHARDS}
                 ELSE {_TB_SHARDS - 1} - (r % {_TB_SHARDS}) END AS BIGINT) AS shard
FROM r
"""


def _read_documents(sf_dir: str, columns):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(f"{sf_dir}/documents.parquet", columns=columns)
