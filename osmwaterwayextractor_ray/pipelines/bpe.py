"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016:
"Neural Machine Translation of Rare Words with Subword Units", ACL).

The published scalable formulation: ONE corpus pass collapses the corpus
to the distinct-word frequency table (Heaps' law — |distinct words| is
sublinear in corpus size), and every merge iteration after that runs over
the word table only:

  * pair counting  — per-batch vectorized partial counts (numpy over the
    flattened Arrow list column, weighted by word frequency) + an
    O(distinct pairs) combine shuffle (stages/fastagg.grouped_agg);
  * argmax          — per-block partial top-1, O(blocks) driver merge
    (the heavy_users exact plan); tie-break = count DESC, then
    (left id, right id) ASC — ids are assigned deterministically
    (sorted alphabet, then one per merge in creation order), so the
    result is a total order independent of block structure;
  * merge rewrite   — one vectorized map over the word table
    (leftmost-greedy non-overlapping replacement computed on the
    ORIGINAL symbol sequence — the classic single-pass scan semantics),
    re-pinned per iteration (the pagerank iteration pattern:
    WWX_PIN_MODE=parquet turns the pin into the standard
    between-iteration checkpoint at 100 TB).

The corpus itself is touched exactly once. No SQL oracle (iterative,
list-rewriting — not ANSI-SQL-expressible); correctness is pinned by an
independent pure-python dict-loop reference (tests/test_bpe.py) on an
adversarial fixture (overlapping pairs, ties, EOW merges) plus the
sf0.001 table, and by block-structure invariance.

The per-word char->id encode step loops over words in Python: it runs on
the O(distinct words) table, once, not on the corpus — documented
deviation from the no-row-loops rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
from osmwaterwayextractor_ray.stages.pin import pin

N_MERGES = 8
_EOW = "</w>"
_PAIR_M = 1 << 21  # pair key = left * _PAIR_M + right (ids << 2^21)


def _read_documents(sf_dir: str, columns):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(f"{sf_dir}/documents.parquet", columns=columns)


def _word_freqs(sf_dir: str):
    """One corpus pass -> the distinct-word frequency table."""
    from osmwaterwayextractor_ray.functions.text import tokenize

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            toks.extend(tokenize("" if t is None else t))
        tbl = pa.table(
            {
                "word": pa.array(toks, type=pa.string()),
                "freq": pa.array(np.ones(len(toks), dtype=np.int64)),
            }
        )
        return (
            tbl.group_by("word", use_threads=False)
            .aggregate([("freq", "sum")])
            .rename_columns(["word", "freq"])
        )

    return grouped_agg(
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=8192),
        ["word"],
        {"freq": ("freq", "sum")},
        num_parts=8,
    )


def _ids_arrays(batch: pa.Table):
    col = batch.column("ids")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = flat[offs[0] : offs[-1]]
    offs = offs - offs[0]
    freq = batch.column("freq").to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    wid = np.repeat(np.arange(len(freq), dtype=np.int64), lens)
    return flat, lens, wid, freq


def _list_col(flat: np.ndarray, lens: np.ndarray) -> pa.ListArray:
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(flat.astype(np.int32), type=pa.int32()),
    )


def bpe_train(sf_dir: str, n_merges: int = N_MERGES) -> pd.DataFrame:
    """Train ``n_merges`` BPE merges over the corpus; returns the merge
    table (step, left, right, pair_count, new_token) — the tokenizer
    artifact a training pipeline ships. See module docstring for the
    distributed plan and the determinism contract."""
    merges, _ = _bpe_train_full(sf_dir, n_merges)
    return merges


def _bpe_train_full(sf_dir: str, n_merges: int = N_MERGES):
    """The full training loop; returns (merge table, final encoded word
    table Dataset with columns word / ids / freq) — bpe_encode consumes
    the latter for the per-word post-merge token lengths."""
    import ray

    words = pin(_word_freqs(sf_dir), "bpe_words")

    # alphabet: per-batch distinct chars (tiny rows), driver union
    def chars_partial(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for w in batch.column("word").to_pylist():
            seen.update(w)
        return pa.table({"ch": pa.array(sorted(seen), type=pa.string())})

    char_rows = words.map_batches(
        chars_partial, batch_format="pyarrow"
    ).take_all()  # O(batches x alphabet) rows — tiny
    alphabet = sorted({r["ch"] for r in char_rows})
    vocab: list[str] = alphabet + [_EOW]
    c2i = {s: i for i, s in enumerate(alphabet)}
    eow_id = len(alphabet)
    ref_map = ray.put((c2i, eow_id))

    def encode(batch: pa.Table) -> pa.Table:
        m, eow = ray.get(ref_map)
        ws = batch.column("word").to_pylist()
        lens = np.fromiter((len(w) + 1 for w in ws), dtype=np.int64, count=len(ws))
        flat = np.empty(int(lens.sum()), dtype=np.int64)
        p = 0
        for w in ws:  # O(distinct words), once — see module docstring
            for ch in w:
                flat[p] = m[ch]
                p += 1
            flat[p] = eow
            p += 1
        return pa.table(
            {
                "word": batch.column("word"),
                "ids": _list_col(flat, lens),
                "freq": batch.column("freq"),
            }
        )

    encoded = pin(
        words.map_batches(encode, batch_format="pyarrow", batch_size=65536),
        "bpe_encoded",
    )

    merges: list[tuple[int, str, str, int, str]] = []
    for step in range(n_merges):

        def pair_partial(batch: pa.Table) -> pa.Table:
            flat, lens, wid, freq = _ids_arrays(batch)
            if len(flat) < 2:
                return pa.table(
                    {
                        "pair": pa.array([], type=pa.int64()),
                        "cnt": pa.array([], type=pa.int64()),
                    }
                )
            valid = wid[:-1] == wid[1:]
            keys = flat[:-1][valid] * _PAIR_M + flat[1:][valid]
            w = np.repeat(freq, lens)[:-1][valid]
            uk, inv = np.unique(keys, return_inverse=True)
            cnt = np.zeros(len(uk), dtype=np.int64)
            np.add.at(cnt, inv, w)
            return pa.table(
                {
                    "pair": pa.array(uk, type=pa.int64()),
                    "cnt": pa.array(cnt, type=pa.int64()),
                }
            )

        combined = grouped_agg(
            encoded.map_batches(pair_partial, batch_format="pyarrow", batch_size=65536),
            ["pair"],
            {"cnt": ("cnt", "sum")},
            num_parts=8,
        )

        def top1(batch: pa.Table) -> pa.Table:
            p = batch.column("pair").to_numpy(zero_copy_only=False)
            c = batch.column("cnt").to_numpy(zero_copy_only=False)
            if not len(p):
                return batch
            o = np.lexsort((p, -c))[:1]
            return pa.table(
                {
                    "pair": pa.array(p[o], type=pa.int64()),
                    "cnt": pa.array(c[o], type=pa.int64()),
                }
            )

        cands = combined.map_batches(top1, batch_format="pyarrow").to_pandas()
        if cands.empty:
            break  # no adjacent pairs remain anywhere
        cands = cands.sort_values(["cnt", "pair"], ascending=[False, True])
        best_pair = int(cands.iloc[0]["pair"])
        best_cnt = int(cands.iloc[0]["cnt"])
        a, b = best_pair // _PAIR_M, best_pair % _PAIR_M
        new_id = len(vocab)
        new_tok = vocab[a] + vocab[b]
        merges.append((step, vocab[a], vocab[b], best_cnt, new_tok))
        vocab.append(new_tok)

        ref_merge = ray.put((a, b, new_id))

        def apply_merge(batch: pa.Table) -> pa.Table:
            aa, bb, cc = ray.get(ref_merge)
            flat, lens, wid, freq = _ids_arrays(batch)
            if len(flat) < 2:
                return batch
            valid = wid[:-1] == wid[1:]
            m = (flat[:-1] == aa) & (flat[1:] == bb) & valid
            pos = np.flatnonzero(m)
            if len(pos):
                # leftmost-greedy non-overlap: inside a run of consecutive
                # match positions (only possible when aa == bb), keep
                # every other match starting with the leftmost
                starts = np.flatnonzero(np.r_[True, np.diff(pos) != 1])
                runpos = np.arange(len(pos)) - np.repeat(
                    starts, np.diff(np.r_[starts, len(pos)])
                )
                kept = pos[runpos % 2 == 0]
                flat = flat.copy()
                flat[kept] = cc
                del_mask = np.zeros(len(flat), dtype=bool)
                del_mask[kept + 1] = True
                flat = flat[~del_mask]
                lens = lens - np.bincount(wid[kept], minlength=len(lens))
            return pa.table(
                {
                    "word": batch.column("word"),
                    "ids": _list_col(flat, lens),
                    "freq": batch.column("freq"),
                }
            )

        encoded = pin(
            encoded.map_batches(apply_merge, batch_format="pyarrow", batch_size=65536),
            f"bpe_step{step}",
        )

    mdf = pd.DataFrame(
        merges, columns=["step", "left", "right", "pair_count", "new_token"]
    ).astype({"step": np.int64, "pair_count": np.int64})
    return mdf, encoded


def bpe_encode(sf_dir: str, n_merges: int = N_MERGES):
    """Apply the trained BPE merges to the corpus — the tokenize step a
    training pipeline runs after bpe_train. Per document:
    (doc_id, n_words, n_bpe_tokens), n_bpe_tokens = total symbols after
    all merges (each word carries its </w> terminal).

    Scale shape: training already reduced every distinct word to its
    post-merge symbol sequence, so encoding the corpus is a per-word
    LENGTH LOOKUP, not a re-run of the merge loop: the (word -> n
    symbols) table is O(distinct words) and broadcast (ray.put) — for
    vocabularies beyond broadcast size the same join is
    fastagg.lookup_join, the engine's standard distributed twin. The
    corpus streams once through a vectorized pc.index_in lookup."""
    import pyarrow.compute as pc
    import ray

    from osmwaterwayextractor_ray.functions.text import tokenize

    _, encoded = _bpe_train_full(sf_dir, n_merges)

    def word_lens(batch: pa.Table) -> pa.Table:
        col = batch.column("ids")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "word": batch.column("word"),
                "n_sym": pa.array(np.diff(offs), type=pa.int64()),
            }
        )

    wl = encoded.map_batches(word_lens, batch_format="pyarrow").to_pandas()
    word_arr = pa.array(wl["word"].tolist(), type=pa.string())
    len_arr = wl["n_sym"].to_numpy(np.int64)
    ref = ray.put((word_arr, len_arr))

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        wa, la = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch.column("text").to_pylist()
        flat: list[str] = []
        nw = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tk = tokenize("" if t is None else t)
            nw[i] = len(tk)
            flat.extend(tk)
        nbpe = np.zeros(len(nw), dtype=np.int64)
        nz = nw > 0
        if len(flat):
            # every corpus word is in the trained table by construction
            # (same corpus, same tokenizer); fill_null is belt-and-braces
            iv = (
                pc.index_in(pa.array(flat, type=pa.string()), value_set=wa)
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            tw = np.where(iv >= 0, la[np.maximum(iv, 0)], 0)
            # reduceat over the NON-EMPTY docs only (their starts are
            # strictly increasing and in-bounds); empty docs keep 0 —
            # clamping starts instead would truncate the last non-empty
            # doc's segment whenever an empty doc ends the batch
            nw_nz = nw[nz]
            starts = np.cumsum(nw_nz) - nw_nz
            nbpe[nz] = np.add.reduceat(tw, starts)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_words": pa.array(nw, type=pa.int64()),
                "n_bpe_tokens": pa.array(nbpe, type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
