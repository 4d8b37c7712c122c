"""Training-data text pipelines over the `documents` table.

Oracle-checked (DuckDB SQL in __ray_entry__):
  * dedup_exact      — exact dedup: content-hash partial + groupby, keep
                       min doc_id per distinct text (hash-partition +
                       per-group first, the north-rule dedup primitive)
  * doc_quality      — per-doc char/token/punct metrics (integer outputs)
  * lang_doc_stats   — grouped aggregates over the provided lang column
  * token_totals     — tokenize + groupby(source) integer sums

Rows-only (not expressible in SQL; pinned by pytest instead):
  * minhash_neardup  — shingle→MinHash→LSH-band groupby→candidate pairs→
                       exact-Jaccard verify (planted near-dups must be found)
  * simhash_fingerprints, langid_pred, winnow_fingerprint_counts
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osmwaterwayextractor_ray.stages.pin import pin
from osmwaterwayextractor_ray.functions.hashing import text_hash64
from osmwaterwayextractor_ray.stages._pool import pool_max
from osmwaterwayextractor_ray.functions.text import (
    char_counts,
    langid,
    minhash_bands,
    minhash_signature,
    punct_counts,
    simhash64,
    token_counts,
    winnow_fingerprints,
)


def _read_documents(sf_dir: str, columns):
    import ray.data as rd

    return _read_pq(f"{sf_dir}/documents.parquet", columns=columns)


def dedup_exact(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        h = text_hash64(["" if t is None else t for t in texts])
        return batch.append_column("h", pa.array(h.view(np.int64), type=pa.int64()))

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
    # min doc_id per content hash; Min(text) is THE text (all texts in a
    # hash group are identical, collisions aside)
    return grouped_agg(
        hashed, ["h"], {"doc_id": ("doc_id", "min"), "text": ("text", "min")}
    ).select_columns(["doc_id", "text"])


DEDUP_EXACT_SQL = "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"


_INC_REF_MOD = 7  # reference ("already ingested") corpus = doc_id % 7 == 0


def incremental_dedup(sf_dir: str, m_bits: int | None = None):
    """Cross-run incremental dedup — the every-crawl ingest step: drop
    each NEW document whose text already exists in the REFERENCE corpus
    (here the doc_id % _INC_REF_MOD == 0 slice plays the prior ingest).
    Returns the kept new docs (doc_id, text).

    Scale shape (the classic Bloom-prefilter + exact-verify composition,
    `state/bloom.py`): the reference side folds its xxh64 content hashes
    into per-batch 128 KiB bitmaps, OR-merged on the driver (order-
    independent) and broadcast once; the new side streams through a
    vectorized membership test — DEFINITE negatives (the vast majority:
    Bloom has no false negatives) pass straight through with ZERO
    shuffle, and only the maybe-duplicate candidates co-group against
    the exact reference hashes for the anti-join verify. The output is
    EXACT (false positives are killed by the verify), so the SQL oracle
    is a plain NOT EXISTS anti-join; hash equality stands in for text
    equality per the dedup_exact convention. The xxh64 pass runs ONCE
    over the corpus into a pinned hashed stream (WWX_PIN_MODE governs
    the pin strategy at scale, as in the near-dup family); the bitmap /
    direct / candidate / reference consumers are cheap column scans of
    that stream."""
    import ray

    from osmwaterwayextractor_ray.stages.fastagg import cogroup
    from osmwaterwayextractor_ray.stages.pin import pin
    from osmwaterwayextractor_ray.state.bloom import (
        M_BITS,
        bloom_contains,
        bloom_merge,
        bloom_partial,
    )

    mb = M_BITS if m_bits is None else m_bits  # tests shrink mb to force FPs
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        h = text_hash64(texts)
        return batch.append_column("h", pa.array(h.view(np.int64), type=pa.int64()))

    hashed = pin(
        ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192),
        "incdedup_hashed",
    )

    def _cols(batch: pa.Table):
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        return ids, h

    def ref_bitmap(batch: pa.Table) -> pa.Table:
        ids, h = _cols(batch)
        bm = bloom_partial(h[ids % _INC_REF_MOD == 0], mb)
        return pa.table({"bm": pa.array([bm], type=pa.list_(pa.uint8()))})

    def fold(batch: pa.Table) -> pa.Table:
        """Distributed OR-fold: 64 partial bitmaps -> 1, so the driver
        collects O(blocks/64) rows instead of one bitmap per block (at
        10^6 blocks the unfolded collect would be ~100 GB driver-side)."""
        col = batch.column("bm")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.values.to_numpy(zero_copy_only=False)
        bm = np.bitwise_or.reduce(flat.reshape(len(batch), -1), axis=0)
        return pa.table({"bm": pa.array([bm], type=pa.list_(pa.uint8()))})

    parts = (
        hashed.map_batches(ref_bitmap, batch_format="pyarrow")
        .map_batches(fold, batch_format="pyarrow", batch_size=64)
        .take_all()
    )
    bm = bloom_merge((np.asarray(r["bm"], dtype=np.uint8) for r in parts), m_bits=mb)
    ref_bm = ray.put(bm)

    def direct_keep(batch: pa.Table) -> pa.Table:
        """New docs the Bloom filter clears outright — no shuffle."""
        ids, h = _cols(batch)
        new = ids % _INC_REF_MOD != 0
        keep = new & ~bloom_contains(ray.get(ref_bm), h, mb)
        return batch.filter(pa.array(keep)).drop_columns(["h"])

    def candidates(batch: pa.Table) -> pa.Table:
        ids, h = _cols(batch)
        new = ids % _INC_REF_MOD != 0
        keep = new & bloom_contains(ray.get(ref_bm), h, mb)
        return batch.filter(pa.array(keep))

    def ref_hashes(batch: pa.Table) -> pa.Table:
        ids, _ = _cols(batch)
        sel = ids % _INC_REF_MOD == 0
        return batch.filter(pa.array(sel)).select(["h"])

    cand_schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("h", pa.int64())]
    )
    grouped, split = cogroup(
        hashed.map_batches(candidates, batch_format="pyarrow", batch_size=8192),
        hashed.map_batches(ref_hashes, batch_format="pyarrow", batch_size=8192),
        ["h"],
        num_parts=8,
        left_schema=cand_schema,
        right_schema=pa.schema([("h", pa.int64())]),
    )

    def verify(g: pa.Table) -> pa.Table:
        lg, rg = split(g)
        lh = lg.column("h").to_numpy(zero_copy_only=False)
        rh = np.unique(rg.column("h").to_numpy(zero_copy_only=False))
        keep = ~np.isin(lh, rh)
        return lg.filter(pa.array(keep)).drop_columns(["h"])

    direct = hashed.map_batches(direct_keep, batch_format="pyarrow", batch_size=8192)
    return direct.union(grouped.map_groups(verify, batch_format="pyarrow"))


INCREMENTAL_DEDUP_SQL = f"""
SELECT d.doc_id, d.text FROM documents d
WHERE d.doc_id % {_INC_REF_MOD} <> 0
  AND NOT EXISTS (
    SELECT 1 FROM documents r
    WHERE r.doc_id % {_INC_REF_MOD} = 0 AND r.text = d.text
  )
"""


def doc_quality(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def quality(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(char_counts(texts), type=pa.int64()),
                "n_tokens": pa.array(token_counts(texts), type=pa.int64()),
                "n_punct": pa.array(punct_counts(texts), type=pa.int64()),
            }
        )

    return ds.map_batches(quality, batch_format="pyarrow", batch_size=8192)


DOC_QUALITY_SQL = r"""
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> '')) AS n_tokens,
       length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct
FROM documents
"""


def lang_doc_stats(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ds = _read_documents(sf_dir, ["lang", "n_chars"])
    return (
        ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .map_batches(
            lambda t: t.append_column(
                "avg_chars",
                pc.round(
                    pc.divide(pc.cast(t["total_chars"], pa.float64()), pc.cast(t["n_docs"], pa.float64())),
                    4,
                ),
            ),
            batch_format="pyarrow",
        )
    )


LANG_DOC_STATS_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
FROM documents GROUP BY lang
"""


def token_totals(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        df = pd.DataFrame({"source": batch.column("source").to_pylist(), "n": token_counts(texts)})
        g = df.groupby("source", as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("source")
        .aggregate(Sum("n", alias_name="total_tokens"))
    )


TOKEN_TOTALS_SQL = r"""
SELECT source,
       CAST(sum(len(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> ''))) AS BIGINT) AS total_tokens
FROM documents GROUP BY source
"""


# ---- near-duplicate detection (MinHash + LSH) ----

def _corpus_with_planted_dups(sf_dir: str, spread: int | None = 8):
    """documents ∪ deterministic near-dup copies (doc_id + 1_000_000, last
    40 chars dropped) — gives the LSH pipeline known positives at any sf.

    NOTE (measured, r3+r4): the corpus is ONE parquet file with ONE row
    group, so without a spread the shingling/fingerprint stages run
    near-serially. r3 measured ``.repartition(pool_max())`` (= 32) as
    consistently SLOWER (extra barrier + 32x downstream task count); r4
    re-measured with a MODERATE spread=8 and it wins decisively
    (minhash 10.5 -> 6.9 s, simhash 4.2 -> 3.5 s at sf0.1/32,
    interleaved 3/3) — enough blocks to parallelize the per-doc text
    kernels, few enough that downstream shuffles keep their task counts.
    Real many-file inputs parallelize at the read with no barrier."""
    import ray.data as rd

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        dup_mask = [len(t) > 200 for t in texts]
        dup_ids = [int(i) + 1_000_000 for i, m in zip(ids.tolist(), dup_mask) if m]
        dup_texts = [t[:-40] for t, m in zip(texts, dup_mask) if m]
        return pa.table(
            {
                "doc_id": pa.array(ids.tolist() + dup_ids, type=pa.int64()),
                "text": pa.array(texts + dup_texts, type=pa.string()),
            }
        )

    out = ds.map_batches(plant, batch_format="pyarrow", batch_size=8192)
    if spread:
        out = out.repartition(spread)
    return out


class _MinHashStage:
    """Actor-pool stage: shingle + MinHash + LSH band keys in ONE pass,
    emitted one row per doc: (packed id, 21 band keys, sorted distinct
    shingle hashes). Pinning this table once lets the band explosion AND
    both verify join sides project from it — each doc is shingled
    exactly once in the whole pipeline (compiled state — permutation
    tables — is module-level, loaded once per worker).

    Band geometry is 21 bands × 3 rows (63 of the 64 permutations): the
    s-curve midpoint (1/b)^(1/r) ≈ 0.36 sits just below the 0.6 query
    threshold, so recall at J=0.6 is 1-(1-0.6³)^21 ≈ 0.994 while pairs
    down at the corpus' ambient J≈0.1 collide with probability
    1-(1-0.001)^21 ≈ 2% instead of ~27%. The previous 32×2 geometry
    (midpoint 0.18, recall 1-6e-7) was measured to emit 2.1M candidate
    pairs from an 8.5k-doc corpus — quadratic junk that made the exact
    verify 90% of the pipeline's wall time and would be fatal on web
    text. The recall loss is the documented LSH trade (Leskovec et al.,
    MMDS ch.3); the deterministic complement with full recall is
    ngram_jaccard_neardup.

    The emitted doc id is packed as ``doc_id << 17 | min(n_shingles,
    2^17-1)`` so the AllPairs length filter (J <= min/max of set sizes)
    can run on the candidate pairs BEFORE any payload join. Clamping at
    the 17-bit cap only ever raises the min/max ratio, so an over-long
    doc can never be wrongly filtered — just verified."""

    def __init__(self, n_bands: int = 21):
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmwaterwayextractor_ray.functions.text import (
            minhash_signature_from_shingles,
            shingle_hashes,
        )

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        out_keys, out_packed, sh_lists = [], [], []
        for did, t in zip(ids.tolist(), texts):
            sh = shingle_hashes(t)
            sig = minhash_signature_from_shingles(sh)
            out_packed.append((did << _NSH_BITS) | min(len(sh), _NSH_CAP))
            out_keys.append(minhash_bands(sig, self.n_bands))
            sh_lists.append(sh.view(np.int64))
        ns = np.fromiter((len(s) for s in sh_lists), dtype=np.int64, count=len(sh_lists))
        flat = np.concatenate(sh_lists) if sh_lists else np.empty(0, np.int64)
        offs = np.concatenate(([0], np.cumsum(ns))).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(out_packed, type=pa.int64()),
                "bands": pa.array(out_keys, type=pa.list_(pa.int64())),
                "sh": pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()),
                    pa.array(flat, type=pa.int64()),
                ),
            }
        )


# module-level stage instance: the permutation tables are module-level
# constants, so the shingle+sign pass needs no per-actor state — plain
# task-based map_batches reuses prestarted workers instead of paying an
# actor-pool spin-up for a handful of batches (interleaved A/B at
# sf0.1/32: prep 2.8-3.2 s task vs 3.8-4.4 s actor, 3/3 reps faster)
_MINHASH_STAGE = None


def _minhash_prep(batch: pa.Table) -> pa.Table:
    global _MINHASH_STAGE
    if _MINHASH_STAGE is None:
        _MINHASH_STAGE = _MinHashStage()
    return _MINHASH_STAGE(batch)


def minhash_neardup(sf_dir: str, threshold: float = 0.6, skew_threshold: int | None = None):
    """Candidate pairs from LSH buckets, verified with exact shingle
    Jaccard >= threshold. Returns (doc_a, doc_b, jaccard) with doc_a <
    doc_b, deduplicated across buckets.

    The exact-Jaccard verify is fully distributed: candidate pairs are
    joined back to the shingle table twice (doc_a side, doc_b side) —
    no whole-corpus driver materialization or broadcast. ONE task-based
    pass (_MinHashStage) shingles, signs and bands every doc, and its
    pinned per-doc output (object-store blocks, spillable) feeds the
    band explosion AND both verify join sides — each doc is shingled
    exactly once in the whole pipeline."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import bucketed_pairs

    prep = pin(
        _corpus_with_planted_dups(sf_dir)
        .map_batches(_minhash_prep, batch_format="pyarrow", batch_size=1024),
        "minhash_prep",
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        col = batch.column("bands")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        keys = arr.values.to_numpy(zero_copy_only=False)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(offs)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        band_idx = np.concatenate([np.arange(k, dtype=np.int32) for k in n]) if len(n) else np.empty(0, np.int32)
        return pa.table(
            {
                "band": pa.array(band_idx, type=pa.int32()),
                "band_key": pa.array(keys[offs[0] : offs[-1]] if len(keys) else keys, type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids, n), type=pa.int64()),
            }
        )

    bands = prep.map_batches(explode_bands, batch_format="pyarrow", batch_size=8192)

    # candidate pairs per (band, band_key) LSH bucket — resolved with one
    # vectorized kernel per coarse hash bucket, NOT one map_groups call per
    # fine bucket (10^4+ fine buckets made the per-group overhead dominate);
    # >200-id buckets are dropped (stop-band guard, unchanged semantics).
    # Ids arrive size-packed (_MinHashStage): apply the exact AllPairs
    # length filter (J <= min/max of the distinct-shingle counts, Bayardo
    # et al. WWW'07) on the skinny pair stream, then unpack — pairs whose
    # sizes already disqualify them never reach the payload joins.
    cand = bucketed_pairs(
        bands, ["band", "band_key"], "doc_id", "doc_a", "doc_b", max_group=200
    )

    def length_filter(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        na, nb = a & _NSH_CAP, b & _NSH_CAP
        keep = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
        return pa.table(
            {
                "doc_a": pa.array(a[keep] >> _NSH_BITS, type=pa.int64()),
                "doc_b": pa.array(b[keep] >> _NSH_BITS, type=pa.int64()),
            }
        )

    cand = cand.map_batches(length_filter, batch_format="pyarrow", batch_size=65536)

    # multi-collision requirement (the multi-probe/"c of b" LSH trick,
    # MMDS ch.3): a pair must collide in >= 2 of the 21 bands. The band
    # multiplicity comes free from the pair stream (fastagg.pair_counts —
    # the same grouped count the exact ngram join uses), and it replaces
    # the distinct-dedup pass. Ambient pairs (J ~= 0.1, per-band p = J^3)
    # almost never double-collide (P ~= 210*J^6), while verify-relevant
    # pairs survive with P = 1-(1-p)^21-21p(1-p)^20: 0.959 at J = 0.6,
    # 0.989 at 0.65, 0.9998 at 0.8. Measured on the sf0.1 corpus this
    # cuts candidates 835k -> ~15k, making the exact verify ~free.
    from osmwaterwayextractor_ray.stages.fastagg import pair_counts

    counted = pair_counts(cand, "doc_a", "doc_b", "n_bands")

    def multi_collision(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("n_bands"), 2)
        out = batch.filter(keep)
        return out.select(["doc_a", "doc_b"])

    # pin the (tiny) candidate set: feeding the un-pinned 3-shuffle
    # candidate pipeline straight into the verify joins' union/cogroup
    # DAG re-executed it (measured +10 s at sf0.1 — same symptom as the
    # corpus pin above)
    cand = counted.map_batches(multi_collision, batch_format="pyarrow", batch_size=65536).materialize()

    # distributed exact-Jaccard verify: pairs ⋈ shingle table on doc_a,
    # then doc_b — the sorted distinct shingle arrays are a PROJECTION of
    # the pinned prep table (no re-shingling anywhere) — then one
    # vectorized lexsort per batch counts the per-pair intersections.
    from osmwaterwayextractor_ray.stages.fastagg import hash_join, lookup_join

    def _sh_side(id_col: str, sh_col: str):
        def rn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    id_col: pa.array(ids >> _NSH_BITS, type=pa.int64()),
                    sh_col: batch["sh"],
                }
            )

        return prep.map_batches(rn, batch_format="pyarrow", batch_size=8192)

    # skew_threshold: opt-in hot-key guard for the verify joins (a
    # mega-duplicate doc id appearing in >threshold candidate pairs is
    # salted across sub-buckets — fastagg.hash_join docstring). Off by
    # default: the max_group stop-band above already bounds any one doc to
    # O(bands × max_group) pairs, and the Arrow-native lookup_join attaches
    # the shingle payload with pc.take (no pandas row objects). When on,
    # pin the candidate set so the heavy-hitter pre-pass doesn't re-run
    # the LSH banding.
    if skew_threshold is not None:
        cand = cand.materialize()
        paired = hash_join(
            cand, _sh_side("doc_a", "sh_a"), on=["doc_a"], skew_threshold=skew_threshold
        ).materialize()  # pre-pass for join 2 must not re-run join 1
        paired = hash_join(
            paired, _sh_side("doc_b", "sh_b"), on=["doc_b"], skew_threshold=skew_threshold
        )
    else:
        # the side is a cheap projection of the pinned prep table — no
        # extra pin needed (re-projection per consumer is just pc.take)
        side = _sh_side("doc_id", "sh")
        paired = lookup_join(cand, side, "doc_a", "doc_id", {"sh": "sh_a"})
        # chained joins: pass the first join's (computed) schema so the
        # second join's probe never re-executes it (CLAUDE.md rule)
        from osmwaterwayextractor_ray.stages.fastagg import joined_schema

        paired = lookup_join(
            paired, side, "doc_b", "doc_id", {"sh": "sh_b"},
            left_schema=joined_schema(cand, side, {"sh": "sh_a"}),
        )

    def _list_parts(col):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # slice-safe: honor the array's offset window into its value buffer
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = arr.values.to_numpy(zero_copy_only=False)
        return vals, offs

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        n = len(a)
        if n == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        va, oa = _list_parts(batch.column("sh_a"))
        vb, ob = _list_parts(batch.column("sh_b"))
        na, nb = np.diff(oa), np.diff(ob)
        # both sides are distinct-per-doc, so duplicates in the combined
        # per-pair stream = the intersection: concat values with their
        # pair index, lexsort, count adjacent equals
        pid = np.concatenate([np.repeat(np.arange(n), na), np.repeat(np.arange(n), nb)])
        vals = np.concatenate(
            [va[oa[0] : oa[-1]] if len(va) else va, vb[ob[0] : ob[-1]] if len(vb) else vb]
        )
        order = np.lexsort((vals, pid))
        pid, vals = pid[order], vals[order]
        dup = (pid[1:] == pid[:-1]) & (vals[1:] == vals[:-1])
        inter = np.bincount(pid[1:][dup], minlength=n)
        union = na + nb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep], type=pa.int64()),
                "doc_b": pa.array(b[keep], type=pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6), type=pa.float64()),
            }
        )

    return paired.map_batches(verify, batch_format="pyarrow", batch_size=4096)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR, Hacker's Delight 5-2)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_neardup(sf_dir: str, max_hamming: int = 3):
    """EXACT all-pairs SimHash near-dup join over the planted corpus:
    every pair with hamming(simhash_a, simhash_b) <= max_hamming.
    Returns (doc_a, doc_b, hamming), doc_a < doc_b.

    Completeness is by pigeonhole (the classic Manku/Jain/Sarma WWW'07
    block-permutation scheme): the 64-bit fingerprint splits into 4
    16-bit blocks, and any pair within hamming 3 differs in at most 3
    blocks, so at least one block is IDENTICAL — emitting each doc under
    its 4 (block_idx, block_value) keys and pairing within buckets
    yields every qualifying pair exactly. The popcount verify runs on
    fingerprints shipped through two skinny Arrow lookup_joins; nothing
    is corpus-sized on the driver. ``max_hamming`` must stay < 4 for
    the 4-block cover to be complete (guarded).

    Scale trade (documented, not guarded): completeness forbids a
    stop-band, so a 16-bit block value shared by m docs contributes
    O(m^2) candidate rows — a corpus of exact-duplicate fingerprints is
    quadratic (as is its OUTPUT). At web scale run exact dedup first
    (collapse identical texts) and use `minhash_neardup`'s bounded
    bucketed plan for the fuzzy tail."""
    if max_hamming >= 4:
        raise ValueError("4-block pigeonhole cover requires max_hamming <= 3")

    corpus = pin(_corpus_with_planted_dups(sf_dir), "simhash_corpus")

    def fingerprint(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        vals = np.fromiter((simhash64(t) for t in texts), dtype=np.uint64, count=len(texts))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(vals.view(np.int64), type=pa.int64()),
            }
        )

    # feeds the band stage AND both verify join sides
    prints = pin(
        corpus.map_batches(fingerprint, batch_format="pyarrow", batch_size=1024),
        "simhash_prints",
    )

    from osmwaterwayextractor_ray.stages.fastagg import hamming_selfjoin

    pairs = hamming_selfjoin(prints, "doc_id", "simhash", max_hamming)
    return pairs.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "hamming"]),
        batch_format="pyarrow",
    )


def simhash_fingerprints(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def sh(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        vals = np.fromiter((simhash64(t) for t in texts), dtype=np.uint64, count=len(texts))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(vals.view(np.int64), type=pa.int64()),
            }
        )

    return ds.map_batches(sh, batch_format="pyarrow", batch_size=2048)


def langid_pred(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def li(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array([langid(t) for t in texts], type=pa.string()),
            }
        )

    return ds.map_batches(li, batch_format="pyarrow", batch_size=4096)


def winnow_counts(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def wc(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        fps = [winnow_fingerprints(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": pa.array([len(f) for f in fps], type=pa.int64()),
                "min_fingerprint": pa.array(
                    [int(f.min()) & 0x7FFFFFFFFFFFFFFF for f in fps], type=pa.int64()
                ),
            }
        )

    return ds.map_batches(wc, batch_format="pyarrow", batch_size=2048)

# ---- exact n-gram Jaccard similarity self-join (prefix filtering) ----

_NSH_BITS = 17
_NSH_CAP = (1 << _NSH_BITS) - 1


def ngram_jaccard_neardup(sf_dir: str, threshold: float = 0.5):
    """EXACT all-pairs word-trigram Jaccard >= threshold over `documents`
    — the deterministic complement to the probabilistic minhash_neardup,
    with a full DuckDB oracle (NGRAM_JACCARD_SQL).

    Count-based exact set-similarity join (the classic inverted-index
    plan, e.g. Sarawagi & Kirpal SIGMOD'04 — public): every (shingle,
    doc) posting is emitted flat, per-shingle doc pairs are generated in
    hash buckets (one row per SHARED shingle per pair), and a grouped
    COUNT of those rows is |A ∩ B| exactly — so Jaccard needs no shingle
    lists shipped to the pair at all. Each doc's set size rides packed in
    the id's low ``_NSH_BITS`` bits, which also powers the AllPairs
    length filter (Bayardo et al., WWW'07: J <= min/max of the sizes, so
    min < t*max disqualifies) BEFORE the counting shuffle:

      postings (map_batches, per-doc distinct hashes, flat — no lists)
      -> per-shingle pairs (fastagg.bucketed_pairs, multiplicity kept)
      -> vectorized length filter -> grouped count = n_inter
      -> unpack sizes, Jaccard, threshold.

    An earlier revision used AllPairs prefix emission + two joins that
    shipped the shingle lists to each candidate pair; the posting-count
    plan is ~2x the pair rows (two int64s each) but zero list shipping
    and no verify kernel — measured 2x faster end-to-end. Both plans are
    quadratic in a shingle's doc frequency; for web-scale corpora with
    stop-shingles the bounded-cost answer is `minhash_neardup`.

    Docs with more than ``_NSH_CAP`` shingles fail loud (ValueError)
    rather than silently mis-scoring. Nothing is corpus-sized on the
    driver; every stage is a map_batches or a bucketed shuffle."""
    return _ngram_jaccard_pairs(_read_documents(sf_dir, ["doc_id", "text"]), threshold)


def _shingle_posting_pairs(docs):
    """Shared head of the posting-count set-similarity plan: per-doc
    distinct word-trigram postings (set size packed in the id's low
    ``_NSH_BITS`` bits) -> per-shingle unordered doc pairs, one row per
    SHARED shingle per pair (multiplicity downstream IS |A ∩ B|)."""
    from osmwaterwayextractor_ray.functions.text import word_ngram_hashes
    from osmwaterwayextractor_ray.stages.fastagg import bucketed_pairs

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        lists = [word_ngram_hashes(t) for t in texts]
        ns = np.fromiter((len(l) for l in lists), dtype=np.int64, count=len(lists))
        if (ns > _NSH_CAP).any():
            raise ValueError(
                f"document exceeds {_NSH_CAP} distinct shingles; use "
                "minhash_neardup for unbounded-length corpora"
            )
        packed = (ids << _NSH_BITS) | ns
        g = np.concatenate(lists).view(np.int64) if len(lists) else np.empty(0, np.int64)
        return pa.table(
            {
                "g": pa.array(g, type=pa.int64()),
                "doc_id": pa.array(np.repeat(packed, ns), type=pa.int64()),
            }
        )

    # small batches: the per-doc shingling loop is the one Python-loop
    # stage, so give the actor pool enough tasks to spread it
    post = docs.map_batches(postings, batch_format="pyarrow", batch_size=512)
    # one output row per (shared shingle, pair): multiplicity IS the signal
    return bucketed_pairs(post, ["g"], "doc_id", "id_a", "id_b")


def _ngram_jaccard_pairs(docs, threshold: float):
    """The posting-count join over any (doc_id, text) Dataset — see
    ngram_jaccard_neardup for the plan; curate_corpus runs it on the
    filtered/deduped survivor set."""
    pairs = _shingle_posting_pairs(docs)

    def length_filter(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        na, nb = a & _NSH_CAP, b & _NSH_CAP
        keep = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
        return pa.table(
            {
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
            }
        )

    filtered = pairs.map_batches(length_filter, batch_format="pyarrow", batch_size=65536)

    # grouped count over nearly-unique (id_a, id_b) keys — one row per
    # shared shingle, so the multiplicity IS |A ∩ B| (fastagg.pair_counts)
    from osmwaterwayextractor_ray.stages.fastagg import pair_counts

    counted = pair_counts(filtered, "id_a", "id_b", "n_inter")

    def finish(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        inter = batch.column("n_inter").to_numpy(zero_copy_only=False).astype(np.int64)
        union = (a & _NSH_CAP) + (b & _NSH_CAP) - inter
        jac = inter / union
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep] >> _NSH_BITS, type=pa.int64()),
                "id_b": pa.array(b[keep] >> _NSH_BITS, type=pa.int64()),
                "n_inter": pa.array(inter[keep], type=pa.int64()),
                "n_union": pa.array(union[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow", batch_size=65536)


def _ngram_jaccard_sql(threshold: float = 0.5, source: str = "documents") -> str:
    # word trigrams via the SAME single-space split as word_ngram_hashes;
    # ``source`` lets curate_corpus run the identical join over its
    # filtered survivor CTE
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS sp FROM {source}),
sh AS (
  SELECT DISTINCT doc_id,
         list_aggregate(list_slice(sp, i, i + 2), 'string_agg', chr(31)) AS g
  FROM toks, LATERAL UNNEST(generate_series(1, greatest(len(sp) - 2, 0))) AS t(i)
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(c AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - c AS BIGINT) AS n_union,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {threshold}
"""


NGRAM_JACCARD_SQL = _ngram_jaccard_sql()


# ---- TF-IDF cosine similarity join (sparse dot products) ----

TFIDF_Q = 1000       # idf quantization: idf = floor(ln(N/df) * Q), int64
TFIDF_TF_CAP = 255   # tf saturates (bounds the int64 weight budget)
# vocabulary screen: a term survives iff df * DEN <= N * NUM — the
# relative document-frequency stop-word cut (50% by default)
TFIDF_DF_NUM, TFIDF_DF_DEN = 1, 2


def tfidf_cosine_neardup(sf_dir: str, thr_num: int = 4, thr_den: int = 5):
    """EXACT all-pairs TF-IDF cosine >= thr_num/thr_den over `documents`
    — the weighted complement to ngram_jaccard_neardup (set overlap ->
    vector-space similarity; Salton's VSM, the classic IR formulation).

    Exactness device: weights are integers — w(d,t) = min(tf, 255) *
    floor(ln(N/df) * 1000) — so dot products and squared norms are exact
    int64 sums in any order (block-structure invariant), and the cosine
    test runs as s^2 * den^2 >= num^2 * nn_a * nn_b in float64 with a
    1e-9 certainty band, falling back to Python big ints inside the band
    (the semdedup device). ln is IEEE libm in both numpy and DuckDB, so
    the quantized idf agrees bit-for-bit (the lm_quality precedent).

    Plan (the posting-product join — bucketed_pair_products emits one
    (id_a, id_b, w_a*w_b) row per SHARED term per pair, and pair_sums'
    grouped sum is the exact sparse dot product; no term lists are ever
    shipped to a pair):

      postings (map_batches: per-doc tf, term = xxh64(token))
      -> df (grouped count) -> idf vocab, terms with df <= N/2 only
      -> weighted postings (lookup_join, inner)
      -> norms per doc (grouped sum of w^2)
      -> per-term pair products -> grouped pair sums = dots
      -> two skinny norm attaches -> integer threshold test.

    The df <= N/2 vocabulary cut is the standard stop-word screen and
    bounds the stop-band blow-up; the join remains quadratic in a
    surviving term's df — for web-scale corpora the bounded-cost answers
    are minhash_neardup / semdedup, same contract as ngram_jaccard.
    Nothing is corpus-sized on the driver.

    Oracle bound (fails LOUD, never silently wrong): the SQL twin runs
    the threshold test in HUGEINT (int128), which overflows — DuckDB
    raises Out of Range — once dot > ~8.2e17 or nn_a*nn_b > ~1e37; the
    engine's big-int fallback has no such bound. Within the int64 weight
    budget that needs docs with >~1e5 surviving distinct terms, far past
    any tested corpus."""
    from osmwaterwayextractor_ray.functions.hashing import xxh64
    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.fastagg import (
        bucketed_pair_products,
        grouped_agg,
        lookup_join,
        pair_sums,
    )

    docs = _read_documents(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()  # O(1) driver scalar (pruned single column)

    def postings(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        t_out, d_out, tf_out = [], [], []
        for did, text in zip(ids.tolist(), texts):
            cnt = Counter(tokenize(text or ""))
            for tok, c in cnt.items():
                t_out.append(xxh64(tok.encode("utf-8", "surrogatepass")))
                d_out.append(did)
                tf_out.append(min(c, TFIDF_TF_CAP))
        return pa.table(
            {
                "t": pa.array(np.array(t_out, dtype=np.uint64).view(np.int64)),
                "doc_id": pa.array(d_out, type=pa.int64()),
                "tf": pa.array(tf_out, type=pa.int64()),
            }
        )

    post_schema = pa.schema(
        [("t", pa.int64()), ("doc_id", pa.int64()), ("tf", pa.int64())]
    )
    # small batches: the per-doc Counter loop is the one Python stage.
    # Pinned: the posting scan feeds BOTH the df count and the weight
    # join (Ray re-executes shared sub-plans per consumer; parquet spill
    # at scale via WWX_PIN_MODE — the span-posting precedent).
    post = pin(
        docs.map_batches(postings, batch_format="pyarrow", batch_size=512),
        "tfidf_postings",
    )

    df = grouped_agg(post, ["t"], {"df": ("doc_id", "count")}, num_parts=16)

    def to_idf(batch: pa.Table) -> pa.Table:
        t = batch.column("t").to_numpy(zero_copy_only=False)
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        keep = dfv * TFIDF_DF_DEN <= n_docs * TFIDF_DF_NUM
        t, dfv = t[keep], dfv[keep]
        idf = np.floor(np.log(float(n_docs) / dfv) * TFIDF_Q).astype(np.int64)
        pos = idf > 0
        return pa.table(
            {
                "t": pa.array(t[pos], type=pa.int64()),
                "idf": pa.array(idf[pos], type=pa.int64()),
            }
        )

    vocab = df.map_batches(to_idf, batch_format="pyarrow")
    vocab_schema = pa.schema([("t", pa.int64()), ("idf", pa.int64())])

    wp = lookup_join(
        post, vocab, "t", "t", {"idf": "idf"},
        num_parts=16, left_schema=post_schema, right_schema=vocab_schema,
    )

    def weigh(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        idf = batch.column("idf").to_numpy(zero_copy_only=False)
        w = tf * idf
        return pa.table(
            {
                "t": batch["t"],
                "doc_id": batch["doc_id"],
                "w": pa.array(w, type=pa.int64()),
                "w2": pa.array(w * w, type=pa.int64()),
            }
        )

    # pinned: feeds the norms aggregate AND the pair-product join
    weighted = pin(wp.map_batches(weigh, batch_format="pyarrow"), "tfidf_weighted")

    # pinned: attached twice (nn_a, nn_b); skinny O(docs) table
    nn = pin(
        grouped_agg(weighted, ["doc_id"], {"nn": ("w2", "sum")}, num_parts=16),
        "tfidf_norms",
    )
    nn_schema = pa.schema([("doc_id", pa.int64()), ("nn", pa.int64())])

    # project w2 off before the pair shuffle — the O(postings) pair
    # generation is the pipeline's largest input shuffle and only needs
    # (t, doc_id, w)
    pairs = bucketed_pair_products(
        weighted.map_batches(
            lambda t: t.select(["t", "doc_id", "w"]), batch_format="pyarrow"
        ),
        ["t"], "doc_id", "w", "id_a", "id_b", "p", num_parts=32,
    )
    dots = pair_sums(pairs, "id_a", "id_b", "p", sum_col="dot")
    dots_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("dot", pa.int64())]
    )

    withna = lookup_join(
        dots, nn, "id_a", "doc_id", {"nn": "nn_a"},
        num_parts=16, left_schema=dots_schema, right_schema=nn_schema,
    )
    withna_schema = dots_schema.append(pa.field("nn_a", pa.int64()))
    withnb = lookup_join(
        withna, nn, "id_b", "doc_id", {"nn": "nn_b"},
        num_parts=16, left_schema=withna_schema, right_schema=nn_schema,
    )

    num2 = float(thr_num * thr_num)
    den2 = float(thr_den * thr_den)

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("dot").to_numpy(zero_copy_only=False)
        nu = batch.column("nn_a").to_numpy(zero_copy_only=False)
        nv = batch.column("nn_b").to_numpy(zero_copy_only=False)
        sf = s.astype(np.float64)
        lhs = sf * sf * den2
        rhs = num2 * nu.astype(np.float64) * nv.astype(np.float64)
        hit = (s > 0) & (lhs >= rhs)
        # certainty band: exact big-int test for pairs within float noise
        near = (s > 0) & (
            np.abs(lhs - rhs) <= 1e-9 * np.maximum(np.abs(lhs), np.abs(rhs))
        )
        for i in np.nonzero(near)[0]:
            hit[i] = int(s[i]) ** 2 * thr_den * thr_den >= (
                thr_num * thr_num * int(nu[i]) * int(nv[i])
            )
        return pa.table(
            {
                "id_a": pa.array(batch.column("id_a").to_numpy(zero_copy_only=False)[hit], type=pa.int64()),
                "id_b": pa.array(batch.column("id_b").to_numpy(zero_copy_only=False)[hit], type=pa.int64()),
                "dot": pa.array(s[hit], type=pa.int64()),
                "nn_a": pa.array(nu[hit], type=pa.int64()),
                "nn_b": pa.array(nv[hit], type=pa.int64()),
            }
        )

    return withnb.map_batches(finish, batch_format="pyarrow", batch_size=65536)


def _tfidf_cosine_sql(thr_num: int = 4, thr_den: int = 5) -> str:
    return rf"""
WITH n AS (SELECT count(*) AS n FROM documents),
toks AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                            x -> x <> '')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, LEAST(count(*), {TFIDF_TF_CAP}) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
idf AS (
  SELECT t, CAST(floor(ln(CAST((SELECT n FROM n) AS DOUBLE) / df) * {TFIDF_Q}) AS BIGINT) AS idf
  FROM df WHERE df * {TFIDF_DF_DEN} <= (SELECT n FROM n) * {TFIDF_DF_NUM}
),
w AS (
  SELECT tf.doc_id, tf.t, tf.tf * idf.idf AS w
  FROM tf JOIN idf USING (t) WHERE tf.tf * idf.idf > 0
),
nn AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS nn FROM w GROUP BY 1),
s AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(sum(a.w * b.w) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT s.id_a, s.id_b, s.dot, na.nn AS nn_a, nb.nn AS nn_b
FROM s JOIN nn na ON na.doc_id = s.id_a JOIN nn nb ON nb.doc_id = s.id_b
WHERE s.dot > 0
  AND CAST(s.dot AS HUGEINT) * s.dot * {thr_den * thr_den}
      >= {thr_num * thr_num} * CAST(na.nn AS HUGEINT) * nb.nn
"""


TFIDF_COSINE_SQL = _tfidf_cosine_sql()


# ---- windowed co-occurrence PMI (the word-embedding-era primitive) ----

PMI_W = 2          # forward co-occurrence window (i < j <= i + W)
PMI_MIN_CNT = 5    # pairs below this corpus count are noise — dropped
PMI_Q = 10**6      # PMI quantization: floor(pmi * Q) micro-nats


def token_pmi(sf_dir: str):
    """Pointwise mutual information over windowed token co-occurrences
    (Church & Hanks 1990) — the count table word2vec/GloVe-era embedding
    training starts from. For each unordered token pair within a forward
    window of PMI_W:

      pmi(a,b) = ln( (c_ab / P) / ((c_a / T) * (c_b / T)) )

    quantized to floor(pmi * 1e6) — the exact float expression shape is
    shared with the SQL oracle (IEEE ops in the same order + libm ln, the
    lm_quality device), so int64 results agree bit-for-bit. Pairs are
    canonicalized (a, b) = (min, max) by UTF-8 order, where Python and
    DuckDB binary collation agree (the bpe_train precedent).

    Scale shape: per-batch Counter partials compress the pair stream to
    distinct-pairs-per-batch before ONE grouped-sum shuffle (O(distinct
    co-occurring pairs) — the standard co-occurrence-matrix layout);
    unigram counts are a skinny O(vocab) lookup side attached twice; the
    driver sees two O(1) totals. Returns (tok_a, tok_b, c_ab, pmi_q)
    for pairs with c_ab >= PMI_MIN_CNT."""
    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join

    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        pc: Counter = Counter()
        uc: Counter = Counter()
        tot_t = 0
        tot_p = 0
        for text in batch.column("text").to_pylist():
            toks = tokenize(text or "")
            uc.update(toks)
            tot_t += len(toks)
            n = len(toks)
            for i in range(n):
                for d in range(1, PMI_W + 1):
                    j = i + d
                    if j >= n:
                        break
                    a, b = toks[i], toks[j]
                    if b < a:
                        a, b = b, a
                    pc[(a, b)] += 1
                    tot_p += 1
        # kind 0: pair counts; kind 1: unigram counts; kind 2: totals
        ka, kb, kc, kk = [], [], [], []
        for (a, b), c in pc.items():
            ka.append(a); kb.append(b); kc.append(c); kk.append(0)
        for a, c in uc.items():
            ka.append(a); kb.append(""); kc.append(c); kk.append(1)
        ka += ["", ""]; kb += ["t", "p"]; kc += [tot_t, tot_p]; kk += [2, 2]
        return pa.table(
            {
                "kind": pa.array(kk, type=pa.int64()),
                "tok_a": pa.array(ka, type=pa.string()),
                "tok_b": pa.array(kb, type=pa.string()),
                "c": pa.array(kc, type=pa.int64()),
            }
        )

    counts = pin(
        grouped_agg(
            docs.map_batches(partials, batch_format="pyarrow", batch_size=512),
            ["kind", "tok_a", "tok_b"],
            {"c": ("c", "sum")},
            num_parts=16,
        ),
        "pmi_counts",
    )
    counts_schema = pa.schema(
        [("kind", pa.int64()), ("tok_a", pa.string()),
         ("tok_b", pa.string()), ("c", pa.int64())]
    )

    import pyarrow.compute as pc_

    # the two corpus totals: O(1) rows to the driver
    totals = {
        r["tok_b"]: r["c"]
        for r in counts.map_batches(
            lambda t: t.filter(pc_.equal(t["kind"], 2)).select(["tok_b", "c"]),
            batch_format="pyarrow",
        ).take_all()
    }
    T, P = int(totals["t"]), int(totals["p"])

    pairs = counts.map_batches(
        lambda t: t.filter(pc_.equal(t["kind"], 0)).select(["tok_a", "tok_b", "c"]),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: t.rename_columns(["tok_a", "tok_b", "c_ab"]),
        batch_format="pyarrow",
    )
    pairs = pairs.map_batches(
        lambda t: t.filter(pc_.greater_equal(t["c_ab"], PMI_MIN_CNT)),
        batch_format="pyarrow",
    )
    pairs_schema = pa.schema(
        [("tok_a", pa.string()), ("tok_b", pa.string()), ("c_ab", pa.int64())]
    )

    # pinned: attached twice (c_a, c_b); skinny O(vocab) table
    uni = pin(
        counts.map_batches(
            lambda t: t.filter(pc_.equal(t["kind"], 1)).select(["tok_a", "c"]),
            batch_format="pyarrow",
        ),
        "pmi_uni",
    )
    uni_schema = pa.schema([("tok_a", pa.string()), ("c", pa.int64())])

    withca = lookup_join(
        pairs, uni, "tok_a", "tok_a", {"c": "c_a"},
        num_parts=16, left_schema=pairs_schema, right_schema=uni_schema,
    )
    withca_schema = pairs_schema.append(pa.field("c_a", pa.int64()))
    uni_b = uni.map_batches(
        lambda t: t.rename_columns(["tok_b", "c"]), batch_format="pyarrow"
    )
    withcb = lookup_join(
        withca, uni_b, "tok_b", "tok_b", {"c": "c_b"},
        num_parts=16, left_schema=withca_schema,
        right_schema=pa.schema([("tok_b", pa.string()), ("c", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        cab = t.column("c_ab").to_numpy(zero_copy_only=False).astype(np.float64)
        ca = t.column("c_a").to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t.column("c_b").to_numpy(zero_copy_only=False).astype(np.float64)
        # expression shape shared with the SQL oracle — do not reorder
        pmi = np.floor(np.log((cab / P) / ((ca / T) * (cb / T))) * PMI_Q)
        return pa.table(
            {
                "tok_a": t["tok_a"],
                "tok_b": t["tok_b"],
                "c_ab": t["c_ab"],
                "pmi_q": pa.array(pmi.astype(np.int64), type=pa.int64()),
            }
        )

    return withcb.map_batches(finish, batch_format="pyarrow")


TOKEN_PMI_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                     x -> x <> '') AS sp
  FROM documents
),
pairs AS (
  SELECT least(sp[i], sp[i + d]) AS tok_a, greatest(sp[i], sp[i + d]) AS tok_b
  FROM toks,
       LATERAL UNNEST(generate_series(1, len(sp))) AS t(i),
       LATERAL UNNEST(generate_series(1, {PMI_W})) AS w(d)
  WHERE i + d <= len(sp)
),
cab AS (SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS c_ab FROM pairs GROUP BY 1, 2),
uni AS (
  SELECT u AS tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT UNNEST(sp) AS u FROM toks) GROUP BY 1
),
tot AS (SELECT CAST(sum(len(sp)) AS BIGINT) AS t FROM toks),
ptot AS (SELECT CAST(count(*) AS BIGINT) AS p FROM pairs)
SELECT cab.tok_a, cab.tok_b, cab.c_ab,
       CAST(floor(ln((CAST(cab.c_ab AS DOUBLE) / ptot.p)
                     / ((CAST(ca.c AS DOUBLE) / tot.t)
                        * (CAST(cb.c AS DOUBLE) / tot.t))) * {PMI_Q}) AS BIGINT)
         AS pmi_q
FROM cab
JOIN uni ca ON ca.tok = cab.tok_a
JOIN uni cb ON cb.tok = cab.tok_b
CROSS JOIN tot CROSS JOIN ptot
WHERE cab.c_ab >= {PMI_MIN_CNT}
"""


# ---- near-dup clustering (distributed connected components) ----

def dedup_clusters(sf_dir: str, threshold: float = 0.5):
    """Assign every document to its near-duplicate cluster: connected
    components over the EXACT n-gram Jaccard pair graph
    (ngram_jaccard_neardup), component id = min doc_id of the cluster,
    singletons map to themselves. This is the operator a real dedup
    pipeline runs AFTER pair finding — keep one representative per
    component, not per pair (pairs alone under-delete transitive
    duplicate chains A~B~C where A~C is below threshold).

    Scale design: pairs come from the bounded posting-count join; the
    components run through stages/components.connected_components
    (per-partition union-find + O(boundary) driver closure — the snap-
    clustering pattern, nothing O(corpus) on the driver); the singleton
    fill is one partitioned left join against the doc-id column."""
    from osmwaterwayextractor_ray.stages.components import connected_components
    from osmwaterwayextractor_ray.stages.fastagg import hash_join

    pairs = ngram_jaccard_neardup(sf_dir, threshold)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["id_a", "id_b"])

    edges = pairs.map_batches(project, batch_format="pyarrow", batch_size=65536)
    assigns = connected_components(edges, "id_a", "id_b", out_node="doc_id", out_comp="component")

    docs = _read_documents(sf_dir, ["doc_id"])
    joined = hash_join(docs, assigns, on=["doc_id"], how="left")

    def fill(batch: pa.Table) -> pa.Table:
        # unmatched docs are singletons: component = own doc_id. The
        # left-join's miss marker may be an Arrow null (int path) or a
        # NaN (pandas float round-trip) — handle both.
        import pyarrow.compute as pc

        d = pc.cast(batch.column("doc_id"), pa.int64())
        cf = pc.cast(batch.column("component"), pa.float64(), safe=False)
        miss = pc.or_kleene(pc.is_null(cf), pc.is_nan(cf))
        c = pc.cast(pc.if_else(miss, pc.cast(d, pa.float64()), cf), pa.int64())
        return pa.table({"doc_id": d, "component": c})

    return joined.map_batches(fill, batch_format="pyarrow", batch_size=65536)


def _dedup_clusters_sql(threshold: float = 0.5) -> str:
    # transitive closure of the exact pair graph via label propagation:
    # reach(d, l) enumerates every component member label reachable from
    # d (bounded by sum of component sizes squared — components are
    # small), MIN(l) is the component id; UNION (not ALL) terminates it
    pairs = _ngram_jaccard_sql(threshold)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(d, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.l FROM reach r JOIN edges e ON e.b = r.d
)
SELECT d AS doc_id, CAST(MIN(l) AS BIGINT) AS component FROM reach GROUP BY d
"""


DEDUP_CLUSTERS_SQL = _dedup_clusters_sql()


# ---- flagship corpus curation (filter -> dedup -> representative) ----

def curate_corpus(
    sf_dir: str,
    min_tokens: int = 20,
    min_chars: int = 100,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    threshold: float = 0.5,
):
    """The end-to-end training-corpus curation pipeline, chaining the
    engine's text operators the way a real data pipeline would:

      quality filter (token/char floors, punct ratio <= 10% in exact
      integer math) -> language whitelist -> exact dedup (min doc_id
      per content hash) -> exact near-dup clustering over the SURVIVORS
      (ngram Jaccard pairs -> distributed connected components) -> keep
      only cluster representatives (doc_id == component min).

    Returns (doc_id, lang, n_tokens) for every kept document. Fully
    SQL-checkable (CURATE_CORPUS_SQL) because each stage is; clustering
    runs on the filtered survivor set, NOT the raw corpus — filtering
    first is both the cheaper order and the semantics real pipelines
    use (a near-dup of a rejected doc must not be dropped for it)."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.components import connected_components
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, hash_join, lookup_join

    ds = _read_documents(sf_dir, ["doc_id", "text", "lang"])
    lang_set = set(langs)

    def filt(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        nt = np.asarray(token_counts(texts), dtype=np.int64)
        nc = np.asarray(char_counts(texts), dtype=np.int64)
        npn = np.asarray(punct_counts(texts), dtype=np.int64)
        lang_ok = np.fromiter(
            (l in lang_set for l in batch.column("lang").to_pylist()), dtype=bool, count=len(texts)
        )
        keep = (nt >= min_tokens) & (nc >= min_chars) & (npn * 10 <= nc) & lang_ok
        out = batch.append_column("n_tokens", pa.array(nt, type=pa.int64()))
        return out.filter(pa.array(keep))

    # pinned: feeds the dedup chain AND the final metadata join side
    filtered = pin(
        ds.map_batches(filt, batch_format="pyarrow", batch_size=4096), "curate_filtered"
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        h = text_hash64(texts)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "h": pa.array(h.view(np.int64), type=pa.int64()),
            }
        )

    deduped = grouped_agg(
        filtered.map_batches(add_hash, batch_format="pyarrow", batch_size=8192),
        ["h"],
        {"doc_id": ("doc_id", "min"), "text": ("text", "min")},
    ).select_columns(["doc_id", "text"])
    deduped = pin(deduped, "curate_deduped")  # feeds pairs AND the survivor join

    pairs = _ngram_jaccard_pairs(deduped, threshold)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["id_a", "id_b"])

    edges = pairs.map_batches(project, batch_format="pyarrow", batch_size=65536)
    assigns = connected_components(edges, "id_a", "id_b", out_node="doc_id", out_comp="component")

    survivors = deduped.select_columns(["doc_id"])
    joined = hash_join(survivors, assigns, on=["doc_id"], how="left")

    def reps(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch.column("doc_id"), pa.int64())
        cf = pc.cast(batch.column("component"), pa.float64(), safe=False)
        miss = pc.or_kleene(pc.is_null(cf), pc.is_nan(cf))
        c = pc.cast(pc.if_else(miss, pc.cast(d, pa.float64()), cf), pa.int64())
        return pa.table({"doc_id": d}).filter(pc.equal(d, c))

    # pinned: the final lookup_join schema-probes `kept`; unpinned, the
    # survivor hash_join would execute for the probe and again for real
    kept = joined.map_batches(reps, batch_format="pyarrow", batch_size=65536).materialize()

    def meta(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "lang", "n_tokens"])

    meta_side = filtered.map_batches(meta, batch_format="pyarrow", batch_size=65536)
    return lookup_join(
        kept, meta_side, "doc_id", "doc_id", {"lang": "lang", "n_tokens": "n_tokens"}
    )


def _curate_corpus_sql(
    min_tokens: int = 20,
    min_chars: int = 100,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    threshold: float = 0.5,
) -> str:
    in_list = ", ".join(f"'{l}'" for l in langs)
    pairs = _ngram_jaccard_sql(threshold, source="d")
    return f"""
WITH RECURSIVE fq AS (
  SELECT doc_id, text, lang,
         length(text) AS n_chars,
         len(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> '')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct
  FROM documents
),
f AS (
  SELECT doc_id, text, lang, n_tokens FROM fq
  WHERE n_tokens >= {min_tokens} AND n_chars >= {min_chars}
    AND n_punct * 10 <= n_chars AND lang IN ({in_list})
),
d AS (SELECT min(doc_id) AS doc_id, text FROM f GROUP BY text),
pairs AS ({pairs}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(x, l) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT e.a, r.l FROM reach r JOIN edges e ON e.b = r.x
),
comp AS (SELECT x AS doc_id, MIN(l) AS component FROM reach GROUP BY x)
SELECT f.doc_id, f.lang, CAST(f.n_tokens AS BIGINT) AS n_tokens
FROM comp JOIN f ON f.doc_id = comp.doc_id
WHERE comp.doc_id = comp.component
"""


CURATE_CORPUS_SQL = _curate_corpus_sql()


# ---- exact distributed percentiles (value histogram) ----

def quality_percentiles(sf_dir: str, ps: tuple[float, ...] = (0.5, 0.95, 0.99)):
    """EXACT per-language percentiles of doc length — the
    value-histogram plan for bounded-cardinality columns: one grouped
    count per (lang, n_chars) — the distributed shuffle is O(distinct
    values), NOT O(docs) — then the cumulative-count rank selection runs
    on the tiny histogram (driver-side; bounded by value cardinality,
    the same budget class as cluster.py's boundary collect). Exact
    lower-value convention: p-th percentile = smallest v with
    cum_count >= ceil(p * n). Complements stages/qa.py's t-digest
    (approximate, unbounded-cardinality floats) with an exact path for
    integer-valued metrics."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_documents(sf_dir, ["lang", "n_chars"])
    hist = grouped_agg(ds, ["lang", "n_chars"], {"cnt": ("n_chars", "count")})
    rows = hist.take_all()

    import collections

    by_lang: dict[str, list[tuple[int, int]]] = collections.defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append((int(r["n_chars"]), int(r["cnt"])))
    out = []
    for lang in sorted(by_lang):
        vc = sorted(by_lang[lang])
        vals = np.array([v for v, _ in vc], dtype=np.int64)
        cum = np.cumsum([c for _, c in vc])
        n = int(cum[-1])
        row = {"lang": lang}
        for p in ps:
            rank = int(np.ceil(p * n))
            row[f"p{int(p * 100)}"] = int(vals[np.searchsorted(cum, rank)])
        out.append(row)
    return pd.DataFrame(out)


def _quality_percentiles_sql(ps: tuple[float, ...] = (0.5, 0.95, 0.99)) -> str:
    cols = ",\n  ".join(
        f"CAST(min(CASE WHEN cum >= ceil({p} * n) THEN v END) AS BIGINT) AS p{int(p * 100)}"
        for p in ps
    )
    return f"""
WITH c AS (SELECT lang, n_chars AS v, count(*) AS cnt FROM documents GROUP BY 1, 2),
w AS (
  SELECT lang, v,
         sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS n
  FROM c
)
SELECT lang,
  {cols}
FROM w GROUP BY lang
"""


QUALITY_PERCENTILES_SQL = _quality_percentiles_sql()


# ---- deterministic stratified sampling ----

def stratified_sample(sf_dir: str, k: int = 10):
    """k docs per source, chosen by a deterministic pseudo-random order:
    Knuth multiplicative hash h = (doc_id * 2654435761) mod 2^32, ties
    broken by doc_id — the standard seeded-sample trick that is exactly
    reproducible in SQL (STRATIFIED_SAMPLE_SQL), independent of block
    structure, and needs no global sort: each batch keeps its local
    top-k per source (partial), then one tiny per-source merge."""
    ds = _read_documents(sf_dir, ["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["h"] = (df["doc_id"].to_numpy().astype(np.int64) * 2654435761) % 4294967296
        df = df.sort_values(["source", "h", "doc_id"]).groupby("source", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["h", "doc_id"]).head(k)
        return pa.Table.from_pandas(
            g[["source", "doc_id"]], preserve_index=False
        ).replace_schema_metadata(None)

    return parts.groupby("source").map_groups(final, batch_format="pandas")


def _stratified_sample_sql(k: int = 10) -> str:
    return f"""
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {k}
"""


STRATIFIED_SAMPLE_SQL = _stratified_sample_sql()


def bpe_token_stats(sf_dir: str):
    """Per-source BPE-pretokenizer stats (the token-budget accounting a
    training-data pipeline runs before tokenizer training): doc counts +
    total BPE-ish tokens. Per-batch vectorized partials, skinny grouped
    sum. The regex is RE2-compatible by construction, so the DuckDB
    oracle runs the IDENTICAL pattern (functions/text.py::BPE_PATTERN)."""
    from osmwaterwayextractor_ray.functions.text import bpe_token_counts
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_documents(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "source": batch["source"],
                "n_bpe": pa.array(bpe_token_counts(texts), type=pa.int64()),
            }
        )

    toks = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    return grouped_agg(
        toks,
        keys=["source"],
        agg_spec={"n_docs": ("n_bpe", "count"), "total_bpe_tokens": ("n_bpe", "sum")},
        num_parts=4,
    )


def _bpe_sql() -> str:
    from osmwaterwayextractor_ray.functions.text import BPE_PATTERN

    # single quotes doubled for the SQL literal; backslashes pass through
    # verbatim (DuckDB standard strings are not escape-processed)
    pat = BPE_PATTERN.replace("'", "''")
    return f"""
SELECT source, count(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) AS total_bpe_tokens
FROM documents GROUP BY source
"""


BPE_TOKEN_STATS_SQL = _bpe_sql()


def neardup_triangles(sf_dir: str, threshold: float = 0.5):
    """Distributed triangle counting over the exact near-dup graph
    (graph-motif counting — the clustering-coefficient / community-
    density building block). Canonical a<b<c orientation: wedges come
    from one partitioned self-join of the edge list on the lower vertex
    (e1=(a,b) ⨝ e2=(a,c), c>b), and each wedge closes iff (b,c) is an
    edge — one more cogroup against the edge set, counted per bucket
    with a packed-key np.isin. Every triangle is counted exactly once.
    Full SQL oracle composes the exact ngram-pair CTE with two joins."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import cogroup, grouped_agg, hash_join

    pairs = ngram_jaccard_neardup(sf_dir, threshold)
    # feeds the self-join twice and the closing cogroup
    edges = pin(
        pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"),
        "triangle_edges",
    )

    def rename_c(batch: pa.Table) -> pa.Table:
        return pa.table({"id_a": batch["id_a"], "id_c": batch["id_b"]})

    e2 = edges.map_batches(rename_c, batch_format="pyarrow")
    wedges = hash_join(edges, e2, on=["id_a"], num_parts=16).map_batches(
        lambda t: t.filter(pc.greater(t["id_c"], t["id_b"])).select(["id_b", "id_c"]),
        batch_format="pyarrow",
    )

    # wedges is a lazy join output -> pass its (static) schema so the
    # closing cogroup's probe doesn't re-execute the self-join
    wedge_schema = pa.schema([("id_b", pa.int64()), ("id_c", pa.int64())])
    grouped, split = cogroup(
        wedges, edges, ["id_b", "id_c"], right_on=["id_a", "id_b"],
        num_parts=16, left_schema=wedge_schema,
    )

    def close_count(g: pa.Table) -> pa.Table:
        from osmwaterwayextractor_ray.stages.fastagg import pack_ids32

        lg, rg = split(g)
        wb = lg.column("id_b").to_numpy(zero_copy_only=False)
        wc = lg.column("id_c").to_numpy(zero_copy_only=False)
        eb = rg.column("id_a").to_numpy(zero_copy_only=False)
        ec = rg.column("id_b").to_numpy(zero_copy_only=False)
        closed = np.isin(pack_ids32(wb, wc), pack_ids32(eb, ec))
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n": pa.array([int(closed.sum())], type=pa.int64()),
            }
        )

    per_bucket = grouped.map_groups(close_count, batch_format="pyarrow")
    # O(buckets) rows -> one driver scalar; an empty graph still yields
    # the single zero row the SQL oracle produces
    n = per_bucket.sum("n") or 0
    return pa.table({"n_triangles": pa.array([int(n)], type=pa.int64())})


NEARDUP_TRIANGLES_SQL = f"""
WITH pairs AS ({NGRAM_JACCARD_SQL})
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM pairs e1
JOIN pairs e2 ON e2.id_a = e1.id_a AND e2.id_b > e1.id_b
JOIN pairs e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b
"""


def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (word/bigram duplication per document)
# ---------------------------------------------------------------------------


def doc_repetition(sf_dir: str):
    """Per-document repetition counters — the duplicate-word /
    duplicate-bigram signals a Gopher-style quality filter thresholds on
    (Rae et al. 2021, "Scaling Language Models", §A.1.1 repetition
    filters). Integer counts only, so the SQL oracle is exact:
    (doc_id, n_words, n_distinct_words, max_word_count,
    n_bigrams, n_distinct_bigrams).

    Tokenization contract: split on single spaces, exactly DuckDB's
    string_split(text, ' ') (the corpus has no tabs/newlines/double
    spaces; empties would count identically on both sides anyway).
    Stateless map_batches, no shuffle — scale-safe by construction."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        n_w, n_dw, mx, n_b, n_db = [], [], [], [], []
        for t in texts:
            ws = t.split(" ")
            arr = np.array(ws, dtype=object)
            uniq, counts = np.unique(arr, return_counts=True)
            n_w.append(len(ws))
            n_dw.append(len(uniq))
            mx.append(int(counts.max()) if len(counts) else 0)
            if len(ws) >= 2:
                big = np.array([f"{a} {b}" for a, b in zip(ws[:-1], ws[1:])], dtype=object)
                n_b.append(len(big))
                n_db.append(len(np.unique(big)))
            else:
                n_b.append(0)
                n_db.append(0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_w, type=pa.int64()),
                "n_distinct_words": pa.array(n_dw, type=pa.int64()),
                "max_word_count": pa.array(mx, type=pa.int64()),
                "n_bigrams": pa.array(n_b, type=pa.int64()),
                "n_distinct_bigrams": pa.array(n_db, type=pa.int64()),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow", batch_size=8192)


DOC_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), ex AS (
  SELECT doc_id, ws[i] AS word, i
  FROM w, UNNEST(range(1, len(ws) + 1)) AS t(i)
), wc AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
         count(*) AS n_distinct_words, max(cnt) AS max_word_count
  FROM (SELECT doc_id, word, count(*) AS cnt FROM ex GROUP BY doc_id, word)
  GROUP BY doc_id
), bg AS (
  SELECT a.doc_id,
         count(*) AS n_bigrams,
         count(DISTINCT a.word || ' ' || b.word) AS n_distinct_bigrams
  FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY a.doc_id
)
SELECT wc.doc_id, wc.n_words, wc.n_distinct_words, wc.max_word_count,
       COALESCE(bg.n_bigrams, 0) AS n_bigrams,
       COALESCE(bg.n_distinct_bigrams, 0) AS n_distinct_bigrams
FROM wc LEFT JOIN bg ON wc.doc_id = bg.doc_id
"""


# ---------------------------------------------------------------------------
# Benchmark-contamination screen (broadcast small-side n-gram membership)
# ---------------------------------------------------------------------------

_CONTAM_N = 5        # words per shingle
_CONTAM_MOD = 37     # doc_id % MOD == 0 -> benchmark member


def _word_grams(text: str, n: int) -> list[str]:
    ws = text.split(" ")
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def contamination_check(sf_dir: str):
    """Benchmark-contamination screen: docs whose text contains any word
    5-gram that also occurs in the 'benchmark' slice (doc_id % 37 == 0 —
    a deterministic stand-in for a held-out eval set). Returns
    (doc_id, n_hits) for every NON-benchmark doc with >= 1 hit, where
    n_hits counts 5-gram POSITIONS matching the benchmark gram set.

    Shape: the benchmark gram set is extracted distributed, deduped with
    the hash-partition distinct, and broadcast ONCE (ray.put) — the
    canonical broadcast-small-side screen (the benchmark is small by
    construction; the corpus side streams, one membership pass per
    batch, no corpus-sized shuffle). At 100 TB the benchmark set builds
    once and is reused across runs."""
    import ray

    from osmwaterwayextractor_ray.stages.fastagg import distinct

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        out: set[str] = set()
        for did, t in zip(ids.tolist(), texts):
            if did % _CONTAM_MOD == 0:
                out.update(_word_grams(t, _CONTAM_N))
        return pa.table({"gram": pa.array(sorted(out), type=pa.string())})

    bench = distinct(
        ds.map_batches(bench_grams, batch_format="pyarrow", batch_size=8192), ["gram"]
    ).take_all()
    gram_set = frozenset(r["gram"] for r in bench)
    ref = ray.put(gram_set)

    def hits(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        out_id, out_n = [], []
        for did, t in zip(ids.tolist(), texts):
            if did % _CONTAM_MOD == 0:
                continue
            n = sum(1 for g in _word_grams(t, _CONTAM_N) if g in s)
            if n:
                out_id.append(did)
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_hits": pa.array(out_n, type=pa.int64()),
            }
        )

    return ds.map_batches(hits, batch_format="pyarrow", batch_size=8192)


CONTAMINATION_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(ws) - {_CONTAM_N - 2}, 1)),
                               i -> array_to_string(ws[i:i+{_CONTAM_N - 1}], ' '))) AS gram
  FROM w
), bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % {_CONTAM_MOD} = 0
)
SELECT g.doc_id, count(*) AS n_hits
FROM g JOIN bench USING (gram)
WHERE g.doc_id % {_CONTAM_MOD} <> 0
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# corpus datasheet (wave 21)
# ---------------------------------------------------------------------------


def corpus_datasheet(sf_dir: str):
    """One-row corpus dataset card ("Datasheets for Datasets", Gebru et
    al. 2021) — the summary every training-data release ships: doc and
    empty-doc counts, char/token totals and max, exact distinct-text
    count (xxh64 content hash standing in for text equality, the
    dedup_exact convention) and lang/source cardinalities. All exact
    int64.

    Scale shape (100 TB bar): ONE text scan computes the skinny per-doc
    row (hash, token count, flags), pinned; the scalar reductions AND the
    tiny lang/source cardinalities ride one per-block partial pass (the
    driver sees O(blocks × cardinality) rows); only the distinct-text
    count shuffles, and it ships 8-byte hashes."""
    from osmwaterwayextractor_ray.stages.fastagg import distinct

    ds = _read_documents(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])

    def skinny(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        h = text_hash64(texts).view(np.int64)
        nt = token_counts(texts)
        empty = np.fromiter(
            (1 if t == "" else 0 for t in texts), dtype=np.int64, count=len(texts)
        )
        return pa.table(
            {
                "h": pa.array(h, type=pa.int64()),
                "lang": batch["lang"],
                "source": batch["source"],
                "n_chars": batch["n_chars"],
                "n_tokens": pa.array(nt, type=pa.int64()),
                "is_empty": pa.array(empty, type=pa.int64()),
            }
        )

    rows = pin(
        ds.map_batches(skinny, batch_format="pyarrow", batch_size=8192),
        "datasheet_rows",
    )

    def part(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        nt = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        em = batch.column("is_empty").to_numpy(zero_copy_only=False)
        # per-block distinct lang/source sets ride the same partial; NULLs
        # are excluded to match SQL count(DISTINCT col) semantics
        langs = sorted({v for v in batch.column("lang").to_pylist() if v is not None})
        srcs = sorted({v for v in batch.column("source").to_pylist() if v is not None})
        return pa.table(
            {
                "n": pa.array([len(nc)], type=pa.int64()),
                "n_empty": pa.array([int(em.sum())], type=pa.int64()),
                "sum_chars": pa.array([int(nc.sum())], type=pa.int64()),
                "max_chars": pa.array([int(nc.max()) if len(nc) else 0], type=pa.int64()),
                "sum_tokens": pa.array([int(nt.sum())], type=pa.int64()),
                "langs": pa.array([langs], type=pa.list_(pa.string())),
                "sources": pa.array([srcs], type=pa.list_(pa.string())),
            }
        )

    parts = rows.map_batches(part, batch_format="pyarrow", batch_size=65536).take_all()
    n_distinct = distinct(rows, ["h"], num_parts=16).count()
    n_langs = len({v for p in parts for v in p["langs"]})
    n_sources = len({v for p in parts for v in p["sources"]})

    return pa.table(
        {
            "n_docs": pa.array([sum(p["n"] for p in parts)], type=pa.int64()),
            "n_empty": pa.array([sum(p["n_empty"] for p in parts)], type=pa.int64()),
            "total_chars": pa.array(
                [sum(p["sum_chars"] for p in parts)], type=pa.int64()
            ),
            "max_chars": pa.array(
                [max((p["max_chars"] for p in parts), default=0)], type=pa.int64()
            ),
            "total_tokens": pa.array(
                [sum(p["sum_tokens"] for p in parts)], type=pa.int64()
            ),
            "n_distinct_texts": pa.array([n_distinct], type=pa.int64()),
            "n_langs": pa.array([n_langs], type=pa.int64()),
            "n_sources": pa.array([n_sources], type=pa.int64()),
        }
    )


CORPUS_DATASHEET_SQL = r"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0
            END), 0) AS BIGINT) AS n_empty,
       CAST(COALESCE(sum(n_chars), 0) AS BIGINT) AS total_chars,
       CAST(COALESCE(max(n_chars), 0) AS BIGINT) AS max_chars,
       CAST(COALESCE(sum(len(list_filter(string_split_regex(COALESCE(text, ''),
            '[ \t\n\r\f\v]+'), x -> x <> ''))), 0) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT COALESCE(text, '')) AS BIGINT) AS n_distinct_texts,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
"""


# ---------------------------------------------------------------------------
# asymmetric n-gram containment near-dup (wave 25)
# ---------------------------------------------------------------------------

_CT_OFF = 1 << 24          # excerpt ids live above every real doc_id
_CT_NUM, _CT_DEN = 4, 5    # containment threshold 0.8 as an exact rational
_CT_MIN_HEAD = 4           # excerpt = first max(n_words // 2, 4) words


def _with_excerpts(docs):
    """``documents`` plus a planted excerpt doc (the first
    max(n_words // 2, 4) words, id = doc_id + _CT_OFF) for every
    doc_id % 5 == 0 — the pure-function planting device (_plant_pii,
    line_dedup), reproduced verbatim by the SQL oracle so the containment
    join has real signal: an excerpt's word trigrams are by construction
    a subset of its base doc's distinct trigram set."""

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_id = list(ids.tolist())
        out_tx = list(texts)
        for did, t in zip(ids.tolist(), texts):
            if did % 5 == 0:
                sp = (t or "").split(" ")
                out_id.append(did + _CT_OFF)
                out_tx.append(" ".join(sp[: max(len(sp) // 2, _CT_MIN_HEAD)]))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "text": pa.array(out_tx, type=pa.string()),
            }
        )

    return docs.map_batches(plant, batch_format="pyarrow", batch_size=2048)


def containment_neardup(sf_dir: str):
    """EXACT all-pairs word-trigram CONTAINMENT — the asymmetric twin of
    ngram_jaccard_neardup: C(A, B) = |A ∩ B| / min(|A|, |B|) flags the
    excerpt/quote duplication Jaccard misses (a short doc fully contained
    in a long one has tiny Jaccard but containment 1.0 — Broder's
    resemblance-vs-containment distinction, STOC'97, public).

    Same posting-count plan as ngram_jaccard (_shingle_posting_pairs ->
    grouped pair count = |A ∩ B| exactly), but the AllPairs min/max
    LENGTH filter does NOT apply — containment is length-free — so the
    candidate volume is the unfiltered per-shingle pair stream: quadratic
    in a shingle's doc frequency (same stop-shingle caveat as Jaccard;
    the bounded-cost answer at crawl scale is minhash_neardup). The
    threshold is the exact rational _CT_NUM/_CT_DEN compared by integer
    cross-multiplication; the reported ``containment`` double is the same
    int/int division the oracle computes, so the match is bit-exact.
    """
    from osmwaterwayextractor_ray.stages.fastagg import pair_counts

    pairs = _shingle_posting_pairs(
        _with_excerpts(_read_documents(sf_dir, ["doc_id", "text"]))
    )
    counted = pair_counts(pairs, "id_a", "id_b", "n_inter")

    def finish(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        inter = batch.column("n_inter").to_numpy(zero_copy_only=False).astype(np.int64)
        nmin = np.minimum(a & _NSH_CAP, b & _NSH_CAP)
        keep = inter * _CT_DEN >= _CT_NUM * nmin
        return pa.table(
            {
                "id_a": pa.array(a[keep] >> _NSH_BITS, type=pa.int64()),
                "id_b": pa.array(b[keep] >> _NSH_BITS, type=pa.int64()),
                "n_inter": pa.array(inter[keep], type=pa.int64()),
                "n_min": pa.array(nmin[keep], type=pa.int64()),
                "containment": pa.array(inter[keep] / nmin[keep], type=pa.float64()),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow", batch_size=65536)


CONTAINMENT_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_CT_OFF} AS doc_id,
         array_to_string(sp[1:greatest(len(sp) // 2, {_CT_MIN_HEAD})], ' ') AS text
  FROM (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS sp
        FROM documents WHERE doc_id % 5 = 0)
),
toks AS (SELECT doc_id, string_split(text, ' ') AS sp FROM corpus),
sh AS (
  SELECT DISTINCT doc_id,
         list_aggregate(list_slice(sp, i, i + 2), 'string_agg', chr(31)) AS g
  FROM toks, LATERAL UNNEST(generate_series(1, greatest(len(sp) - 2, 0))) AS t(i)
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(c AS BIGINT) AS n_inter,
       CAST(least(sa.n, sb.n) AS BIGINT) AS n_min,
       CAST(c AS DOUBLE) / least(sa.n, sb.n) AS containment
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE c * {_CT_DEN} >= {_CT_NUM} * least(sa.n, sb.n)
"""


# ---------------------------------------------------------------------------
# blocked exact edit-distance dedup (wave 25)
# ---------------------------------------------------------------------------

_ED_OFF = 1 << 24
_ED_D = 2       # max edit distance (UTF-8 bytes — DuckDB levenshtein units)
_ED_HEAD = 8    # compared head = the doc's first 8 words
_ED_BLKW = 2    # blocking key = the head's first 2 words


def edit_dedup(sf_dir: str):
    """Blocked exact-Levenshtein near-dup join (classic record-linkage
    blocking — Christen's survey, Springer 2012, public): candidate pairs
    are docs whose HEAD (first ``_ED_HEAD`` words) shares a blocking key
    (the head's own first ``_ED_BLKW`` words); every candidate pair is
    then verified with the exact vectorized banded-Levenshtein DP
    (functions.text.banded_levenshtein — numpy across all pairs, no
    per-pair Python). The blocking key is PART of the operator's
    semantics (like LSH banding) and the oracle blocks identically, so
    the oracle comparison is exact end to end; distances are over UTF-8
    BYTES to match DuckDB's byte-based ``levenshtein``.

    Planted signal: every doc_id % 6 == 0 gets a twin (id + _ED_OFF)
    whose head's last character becomes '#' — edit distance exactly 1,
    same block whenever the head keeps its first two words.

    Scale: ONE hash-bucket shuffle generates in-block candidate pairs
    (fastagg.bucketed_pairs, no stop-band drop — the oracle has none, so
    a corpus where every head opens identically degrades quadratically:
    the standard blocking caveat); heads attach to pairs via two
    partitioned Arrow lookup_joins; the DP touches candidates only.
    """
    from osmwaterwayextractor_ray.functions.text import banded_levenshtein
    from osmwaterwayextractor_ray.stages.fastagg import (
        bucketed_pairs,
        joined_schema,
        lookup_join,
    )

    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def heads(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_id, out_head = [], []
        for did, t in zip(ids.tolist(), texts):
            head = " ".join((t or "").split(" ")[:_ED_HEAD])
            out_id.append(did)
            out_head.append(head)
            if did % 6 == 0 and len(head) >= 2:
                out_id.append(did + _ED_OFF)
                out_head.append(head[:-1] + "#")
        blks = [" ".join(h.split(" ")[:_ED_BLKW]) for h in out_head]
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "head": pa.array(out_head, type=pa.string()),
                "blk": pa.array(blks, type=pa.string()),
            }
        )

    head_tbl = docs.map_batches(heads, batch_format="pyarrow", batch_size=2048)
    # pin the (small) candidate set: the two verify joins would otherwise
    # re-execute the pair shuffle (CLAUDE.md lazy-shuffle rule)
    cand = bucketed_pairs(head_tbl, ["blk"], "doc_id", "id_a", "id_b").materialize()
    paired = lookup_join(cand, head_tbl, "id_a", "doc_id", {"head": "head_a"})
    paired = lookup_join(
        paired, head_tbl, "id_b", "doc_id", {"head": "head_b"},
        left_schema=joined_schema(cand, head_tbl, {"head": "head_a"}),
    )

    def verify(batch: pa.Table) -> pa.Table:
        ha = [s.encode() for s in batch.column("head_a").to_pylist()]
        hb = [s.encode() for s in batch.column("head_b").to_pylist()]
        dist = banded_levenshtein(ha, hb, _ED_D)
        keep = dist <= _ED_D
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "dist": pa.array(dist[keep], type=pa.int64()),
            }
        )

    return paired.map_batches(verify, batch_format="pyarrow", batch_size=16384)


EDIT_DEDUP_SQL = f"""
WITH hb AS (
  SELECT doc_id, array_to_string(sp[1:{_ED_HEAD}], ' ') AS head
  FROM (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS sp FROM documents)
), corpus AS (
  SELECT doc_id, head FROM hb
  UNION ALL
  SELECT doc_id + {_ED_OFF} AS doc_id, substr(head, 1, length(head) - 1) || '#' AS head
  FROM hb WHERE doc_id % 6 = 0 AND length(head) >= 2
), b AS (
  SELECT doc_id, head,
         array_to_string(string_split(head, ' ')[1:{_ED_BLKW}], ' ') AS blk
  FROM corpus
)
SELECT a.doc_id AS id_a, c.doc_id AS id_b,
       CAST(levenshtein(a.head, c.head) AS BIGINT) AS dist
FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
WHERE levenshtein(a.head, c.head) <= {_ED_D}
"""


# ---------------------------------------------------------------------------
# digit-normalized template dedup (wave 40)
# ---------------------------------------------------------------------------


def dedup_numnorm(sf_dir: str):
    """Number-agnostic exact dedup (the CCNet normalization trick):
    replace every digit with '0' before hashing, so templated documents
    that differ only in numbers ('Chapter 1 ...' / 'Chapter 2 ...',
    timestamps, counters) collapse into one group. Keeps the min doc_id
    per normalized class and reports the class size. Returns (doc_id,
    n_variants).

    Same scale shape as dedup_exact: the corpus leaves the scan only as
    a 64-bit normalized-content hash, ONE hash-keyed grouped_agg."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.functions.hashing import text_hash64
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            batch.column("text").combine_chunks(), pattern=r"[0-9]", replacement="0"
        )
        texts = ["" if t is None else t for t in norm.to_pylist()]
        h = text_hash64(texts)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(h.view(np.int64), type=pa.int64()),
                "one": pa.array(np.ones(len(texts), dtype=np.int64)),
            }
        )

    return grouped_agg(
        ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192),
        ["h"],
        {"doc_id": ("doc_id", "min"), "n_variants": ("one", "sum")},
        num_parts=16,
    ).select_columns(["doc_id", "n_variants"])


DEDUP_NUMNORM_SQL = """
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_variants
FROM (SELECT doc_id, regexp_replace(COALESCE(text, ''), '[0-9]', '0', 'g') AS t
      FROM documents)
GROUP BY t
"""


# ---------------------------------------------------------------------------
# source token-set Jaccard similarity (wave 49)
# ---------------------------------------------------------------------------


def source_jaccard(sf_dir: str):
    """Exact pairwise Jaccard similarity between the distinct-token SETS
    of every source pair — the corpus-overlap audit behind mixture
    design (two crawls with jacc -> 1 are the same corpus twice).
    Returns (src_a, src_b, inter, union_n, jacc_ppm) for every pair
    sharing at least one token, src_a < src_b, with
    jacc_ppm = |A∩B|·1e6 // |A∪B| — integer parts-per-million.

    Shape: one distinct (source, tok) shuffle (O(sources × vocab) rows,
    never the corpus); per-source set sizes are an O(sources) driver
    dict; intersections come from ``bucketed_pairs`` over each token's
    source list + ONE ``pair_counts`` shuffle — at most
    C(n_sources, 2) rows per token, bounded because the source
    dimension is small. (A large-cardinality pair dimension would use
    the posting-count plan from ngram_jaccard_neardup instead.)

    NULL sources coalesce to '' on both sides (the host_keywords
    lesson: fastagg's grouped_agg drops null keys, SQL keeps them)."""
    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.fastagg import (
        bucketed_pairs,
        distinct,
        grouped_agg,
        pair_counts,
    )
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_documents(sf_dir, ["source", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        s_out: list[str] = []
        t_out: list[str] = []
        for s, t in zip(srcs, texts):
            s = "" if s is None else s
            for tk in set(tokenize(t or "")):
                s_out.append(s)
                t_out.append(tk)
        return pa.table(
            {
                "source": pa.array(s_out, type=pa.string()),
                "tok": pa.array(t_out, type=pa.string()),
            }
        )

    st = pin(
        distinct(
            ds.map_batches(toks, batch_format="pyarrow", batch_size=8192),
            ["source", "tok"],
            num_parts=16,
        ),
        "src_jacc_st",
    )

    sizes = grouped_agg(
        st.map_batches(
            lambda t: pa.table(
                {
                    "source": t["source"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["source"],
        {"n": ("one", "sum")},
        num_parts=4,
    ).to_pandas()
    names = sorted(sizes["source"].tolist())  # ASCII sort == SQL VARCHAR <
    sid = {s: i for i, s in enumerate(names)}
    n_by_sid = np.zeros(len(names), dtype=np.int64)
    for s, n in zip(sizes["source"], sizes["n"]):
        n_by_sid[sid[s]] = int(n)

    with_ids = st.map_batches(
        lambda t: pa.table(
            {
                "tok": t["tok"],
                "sid": pa.array(
                    [sid[s] for s in t.column("source").to_pylist()],
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    inter = pair_counts(
        bucketed_pairs(with_ids, ["tok"], "sid", "sa", "sb", num_parts=16),
        "sa",
        "sb",
        count_col="inter",
        num_parts=4,
    )

    def finish(t: pa.Table) -> pa.Table:
        sa = t.column("sa").to_numpy(zero_copy_only=False)
        sb = t.column("sb").to_numpy(zero_copy_only=False)
        iv = t.column("inter").to_numpy(zero_copy_only=False)
        union = n_by_sid[sa] + n_by_sid[sb] - iv
        return pa.table(
            {
                "src_a": pa.array([names[i] for i in sa], type=pa.string()),
                "src_b": pa.array([names[i] for i in sb], type=pa.string()),
                "inter": pa.array(iv, type=pa.int64()),
                "union_n": pa.array(union, type=pa.int64()),
                "jacc_ppm": pa.array(
                    iv * 1_000_000 // union, type=pa.int64()
                ),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")


SOURCE_JACCARD_SQL = r"""
WITH st AS (
  SELECT DISTINCT coalesce(source, '') AS source, u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                          x -> x <> '')) AS u(tok)
),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY 1),
i AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, inter, sa.n + sb.n - inter AS union_n,
       CAST(inter * 1000000 // (sa.n + sb.n - inter) AS BIGINT) AS jacc_ppm
FROM i JOIN sz sa ON sa.source = i.src_a JOIN sz sb ON sb.source = i.src_b
"""
