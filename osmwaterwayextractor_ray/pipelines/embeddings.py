"""Embedding-space pipelines over the `embeddings` table
(vec_id:int64, embedding:list<float>, label:int32).

  * embed_topk   — brute-force cosine top-k against a broadcast query
                   matrix: one numpy matmul per batch, partial top-k per
                   batch, tiny groupby(qid) merge. Exact DuckDB oracle
                   (float64 cosine via list_transform — verified to agree
                   with numpy to ~1e-16).
  * embed_neardup — near-duplicate vectors via sign-random-projection LSH
                   buckets + exact cosine verify over planted near-dups
                   (rows-only; pytest pins the planted pairs).

The IVF-style scale path is the same shape: assign each vector to its
nearest of C coarse centroids inside map_batches, groupby(centroid),
search per bucket — documented here, implemented as the LSH variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osmwaterwayextractor_ray.stages.pin import pin
from osmwaterwayextractor_ray.stages._pool import pool_max

DIM = 64
N_QUERIES = 10
K = 5

# deterministic LSH hyperplanes (fixed seed, drawn once at import):
# 3 bands x 8 bits — recall at cosine 0.995 (angle ~6°) is
# 1 - (1 - (1-0.018)^8)^3 ≈ 0.9975, with 256 buckets/band bounding the
# per-bucket pair blowup
_N_BANDS, _ROWS = 3, 8
_PLANES = np.random.RandomState(7).standard_normal((_N_BANDS * _ROWS, DIM)).astype(np.float64)


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    col = batch.column("embedding")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    mat = flat[offs[0] : offs[-1]].reshape(len(ids), -1)
    return ids, mat


def embed_topk(sf_dir: str):
    """For each query vector (vec_id < N_QUERIES), the K most cosine-similar
    other vectors (ties by vec_id)."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    # predicate pushdown: only row groups containing query ids leave
    # storage (the query side is the tiny broadcast side)
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    )
    q_ids = qt.column("vec_id").to_numpy(zero_copy_only=False)
    sel = np.nonzero(q_ids < N_QUERIES)[0]
    q_mat = np.array(
        [qt.column("embedding")[int(i)].as_py() for i in sel], dtype=np.float64
    )
    q_ids = q_ids[sel]
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, qn))

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class PartialTopK:
        def __init__(self):
            self.q_ids, self.qn = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _emb_matrix(batch)
            matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = self.qn @ matn.T  # (n_q, n_batch)
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids.tolist()):
                row = sims[qi]
                mask = ids != qid
                cand = np.nonzero(mask)[0]
                order = cand[np.lexsort((ids[cand], -row[cand]))][:K]
                out_q.append(np.full(len(order), qid, dtype=np.int64))
                out_v.append(ids[order])
                out_s.append(row[order])
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q), type=pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                    "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
                }
            )

    def topk_fn(batch):
        return PartialTopK()(batch)

    partials = ds.map_batches(topk_fn, batch_format="pyarrow", batch_size=4096)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(K).copy()
        g["cosine"] = g["cosine"].round(6)
        return g

    return partials.groupby("qid").map_groups(merge, batch_format="pandas")


EMBED_TOPK_SQL = f"""
WITH qs AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
d AS (
  SELECT qs.qid, e.vec_id,
    list_sum(list_transform(range(1, {DIM + 1}), i -> CAST(qs.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
    / sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> CAST(qs.qe[i] AS DOUBLE) * CAST(qs.qe[i] AS DOUBLE))))
    / sqrt(list_sum(list_transform(range(1, {DIM + 1}), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) AS cosine
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id <> qs.qid
)
SELECT qid, vec_id, round(cosine, 6) AS cosine FROM d
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) <= {K}
"""


def _corpus_with_planted_neighbors(sf_dir: str):
    """embeddings ∪ perturbed copies (vec_id + 1_000_000): v' = v + 0.01 *
    mean(|v|) in every coordinate — cosine(v, v') ≈ 0.99+, deterministic."""
    import ray.data as rd

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def plant(batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        pert = mat + 0.01 * np.mean(np.abs(mat), axis=1, keepdims=True)
        all_ids = np.concatenate([ids, ids + 1_000_000])
        all_mat = np.vstack([mat, pert])
        flat = all_mat.ravel()
        offs = np.arange(0, (len(all_ids) + 1) * DIM, DIM, dtype=np.int32)
        return pa.table(
            {
                "vec_id": pa.array(all_ids, type=pa.int64()),
                "embedding": pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()), pa.array(flat, type=pa.float64())
                ),
            }
        )

    return ds.map_batches(plant, batch_format="pyarrow", batch_size=4096)


def embed_neardup(sf_dir: str, threshold: float = 0.995, skew_threshold: int | None = None):
    """Candidate pairs from 16-bit sign-LSH buckets, verified with exact
    float64 cosine >= threshold. Returns (vec_a, vec_b, cosine), a < b.

    The exact-cosine verify is fully distributed: candidate pairs are
    hash-joined back to the corpus embeddings twice (vec_a side, vec_b
    side) — no whole-corpus driver matrix / broadcast. The planted corpus
    is materialized ONCE (object-store blocks, spillable) and feeds all
    three consumers (band stage + both join sides) — re-deriving it per
    consumer tripled the corpus work (VERDICT r2 perf #2)."""
    corpus = pin(_corpus_with_planted_neighbors(sf_dir), "embed_corpus")

    N_BANDS, ROWS = _N_BANDS, _ROWS

    def bucketize(batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        signs = ((mat @ _PLANES.T) > 0).astype(np.int64)  # (n, 16)
        out_band, out_key, out_id = [], [], []
        for b in range(N_BANDS):
            key = np.zeros(len(ids), dtype=np.int64)
            for r in range(ROWS):
                key |= signs[:, b * ROWS + r] << r
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_key.append(key)
            out_id.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), type=pa.int32()),
                "bucket": pa.array(np.concatenate(out_key), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            }
        )

    buckets = corpus.map_batches(bucketize, batch_format="pyarrow", batch_size=4096)

    from osmwaterwayextractor_ray.stages.fastagg import bucketed_pairs
    from osmwaterwayextractor_ray.stages.fastagg import distinct as fa_distinct

    # candidate pairs per (band, bucket) — one vectorized kernel per coarse
    # hash bucket instead of a map_groups call per fine LSH bucket
    cand = bucketed_pairs(buckets, ["band", "bucket"], "vec_id", "vec_a", "vec_b")
    cand = fa_distinct(cand, ["vec_a", "vec_b"])

    # distributed exact-cosine verify: pairs ⋈ corpus on vec_a, then vec_b,
    # shipping pre-normalized embeddings through the partitioned join
    from osmwaterwayextractor_ray.stages.fastagg import hash_join, lookup_join

    def _emb_side(id_col: str, emb_col: str):
        def rn(batch: pa.Table) -> pa.Table:
            ids, mat = _emb_matrix(batch)
            matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            offs = np.arange(0, (len(ids) + 1) * DIM, DIM, dtype=np.int32)
            return pa.table(
                {
                    id_col: pa.array(ids, type=pa.int64()),
                    emb_col: pa.ListArray.from_arrays(
                        pa.array(offs, type=pa.int32()),
                        pa.array(matn.ravel(), type=pa.float64()),
                    ),
                }
            )

        return corpus.map_batches(rn, batch_format="pyarrow", batch_size=4096)

    # skew_threshold: opt-in hot-key guard (fastagg.hash_join) for a
    # mega-duplicate vector dominating the candidate pairs; pins the
    # intermediate sets so the heavy-hitter pre-pass doesn't re-run
    # upstream stages. Off by default (bucket sizes bound the pair count),
    # where the Arrow-native lookup_join attaches the vectors with pc.take
    # — the list<float64> payload never round-trips through pandas rows.
    if skew_threshold is not None:
        cand = cand.materialize()
        paired = hash_join(
            cand, _emb_side("vec_a", "emb_a"), on=["vec_a"], skew_threshold=skew_threshold
        ).materialize()
        paired = hash_join(
            paired, _emb_side("vec_b", "emb_b"), on=["vec_b"], skew_threshold=skew_threshold
        )
    else:
        from osmwaterwayextractor_ray.stages.fastagg import joined_schema

        side_a = _emb_side("vec_id", "emb")
        paired = lookup_join(cand, side_a, "vec_a", "vec_id", {"emb": "emb_a"})
        # chained joins: computed schema, no probe re-execution (CLAUDE.md)
        paired = lookup_join(
            paired, _emb_side("vec_id", "emb"), "vec_b", "vec_id", {"emb": "emb_b"},
            left_schema=joined_schema(cand, side_a, {"emb": "emb_a"}),
        )

    def _list_matrix(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        return flat[offs[0] : offs[-1]].reshape(len(arr), DIM)

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").to_numpy(zero_copy_only=False)
        b = batch.column("vec_b").to_numpy(zero_copy_only=False)
        if len(a):
            ma = _list_matrix(batch.column("emb_a"))
            mb = _list_matrix(batch.column("emb_b"))
            cos = np.einsum("ij,ij->i", ma, mb)
        else:
            cos = np.array([])
        keep = cos >= threshold
        return pa.table(
            {
                "vec_a": pa.array(a[keep], type=pa.int64()),
                "vec_b": pa.array(b[keep], type=pa.int64()),
                "cosine": pa.array(np.round(cos[keep], 6), type=pa.float64()),
            }
        )

    return paired.map_batches(verify, batch_format="pyarrow", batch_size=8192)


# ---- distributed k-means (Lloyd) over the embedding column ----

KM_K = 8
KM_ITERS = 3
_KM_Q = 1_000_000  # centroid quantization grid (1e-6)


def _km_assign(mat: np.ndarray, C_: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment, elementwise (x_i - c_i)^2 distances —
    the exact expression the SQL oracles evaluate; ties -> lowest index."""
    d2 = ((mat[:, None, :] - C_[None, :, :]) ** 2).sum(axis=-1)
    return d2.argmin(axis=1)


def _kmeans_centroids(
    sf_dir: str, k: int = KM_K, iters: int = KM_ITERS, ds=None
) -> np.ndarray:
    """The Lloyd iteration loop of kmeans_embeddings, returning the final
    centroid matrix (see kmeans_embeddings for the exactness contract).
    Pass ``ds`` to reuse a caller's (vec_id, embedding) Dataset instead of
    constructing a second read (each construction pays a metadata fetch)."""
    import ray

    import pyarrow.parquet as pq

    if ds is None:
        ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # deterministic init: the first k vectors by vec_id (predicate
    # pushdown — only row groups containing them leave storage)
    it = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    )
    ids0 = it.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.argsort(ids0)
    order = order[ids0[order] < k]
    C = np.array(
        [it.column("embedding")[int(i)].as_py() for i in order], dtype=np.float64
    )

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            C_ = ray.get(ref)
            ids, mat = _emb_matrix(batch)
            cl = _km_assign(mat, C_)
            q = np.floor(mat * _KM_Q + 0.5).astype(np.int64)
            kk = C_.shape[0]
            S = np.zeros((kk, mat.shape[1]), dtype=np.int64)
            np.add.at(S, cl, q)
            n = np.bincount(cl, minlength=kk).astype(np.int64)
            offs = np.arange(0, (kk + 1) * mat.shape[1], mat.shape[1], dtype=np.int32)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(kk), type=pa.int64()),
                    "n": pa.array(n, type=pa.int64()),
                    "s": pa.ListArray.from_arrays(
                        pa.array(offs, type=pa.int32()),
                        pa.array(S.ravel(), type=pa.int64()),
                    ),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).take_all()
        S = np.zeros((k, C.shape[1]), dtype=np.int64)
        n = np.zeros(k, dtype=np.int64)
        for r in rows:  # O(k x n_batches) driver rows — tiny
            S[r["cluster"]] += np.asarray(r["s"], dtype=np.int64)
            n[r["cluster"]] += r["n"]
        nz = n > 0
        C = C.copy()
        C[nz] = (S[nz] / n[nz, None]) / _KM_Q
    return C


def kmeans_embeddings(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS):
    """Lloyd's k-means over the embedding column — the iterative
    broadcast-and-partial-aggregate primitive (semantic clustering /
    data-mixing buckets for a training corpus). Per iteration:

      centroids (k x DIM, tiny) -> ray.put broadcast;
      map_batches: argmin-of-squared-distance assignment + per-cluster
      PARTIAL sums — emitted as EXACT int64 sums of the inputs quantized
      to the 1e-6 grid (floor(v*1e6 + 0.5)), so the reduce is integer
      addition: bit-identical under ANY batch structure / num_cpus / add
      order (the CLAUDE.md invariance rule — float partial sums would
      drift in the low bits and could flip boundary assignments);
      driver: combine the O(k x n_batches) partials, mean, de-quantize.
      Empty clusters keep their previous centroid.

    Init is the first k vectors by vec_id (deterministic). Distances use
    the elementwise (x_i - c_i)^2 form — the same expression the SQL
    oracle evaluates, so both engines see identical centroids and
    distances up to per-dimension addition order. Returns
    (vec_id, cluster) from a final assignment pass. KMEANS_SQL unrolls
    the same ``iters`` iterations as chained CTEs."""
    import ray

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    C = _kmeans_centroids(sf_dir, k=k, iters=iters, ds=ds)
    ref = ray.put(C)

    def final(batch: pa.Table) -> pa.Table:
        C_ = ray.get(ref)
        ids, mat = _emb_matrix(batch)
        cl = _km_assign(mat, C_)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(cl, type=pa.int64()),
            }
        )

    return ds.map_batches(final, batch_format="pyarrow", batch_size=4096)


def _kmeans_sql(k: int = KM_K, iters: int = KM_ITERS, final_select: str | None = None) -> str:
    """Unrolled-CTE Lloyd loop. ``final_select`` overrides the closing
    SELECT (it may reference ``af`` — the final assignment — and
    ``c{iters}`` — the final float centroids) so downstream twins
    (proto_prune) can reuse the identical iteration chain."""
    dim, q = DIM, _KM_Q

    def d2(c_alias: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (CAST(e.embedding[i] AS DOUBLE) - {c_alias}.emb[i]) "
            f"* (CAST(e.embedding[i] AS DOUBLE) - {c_alias}.emb[i])))"
        )

    parts = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, list_transform(range(1, {dim + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE)) AS emb FROM embeddings WHERE vec_id < {k})",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2('c')}, c.cid) AS rn
    FROM e CROSS JOIN c{t - 1} c
  ) WHERE rn = 1
)"""
        )
        parts.append(
            f"""u{t} AS (
  SELECT a.cid, i,
         SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * {q} + 0.5) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM a{t} a JOIN e ON e.vec_id = a.vec_id,
       LATERAL UNNEST(generate_series(1, {dim})) AS t(i)
  GROUP BY a.cid, i
)"""
        )
        parts.append(
            f"""c{t} AS (
  SELECT p.cid, COALESCE(uu.emb, p.emb) AS emb
  FROM c{t - 1} p LEFT JOIN (
    SELECT cid, list((CAST(s AS DOUBLE) / n) / {q} ORDER BY i) AS emb
    FROM u{t} GROUP BY cid
  ) uu ON uu.cid = p.cid
)"""
        )
    parts.append(
        f"""af AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2('c')}, c.cid) AS rn
    FROM e CROSS JOIN c{iters} c
  ) WHERE rn = 1
)"""
    )
    if final_select is None:
        final_select = "SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM af"
    return "WITH " + ",\n".join(parts) + "\n" + final_select


KMEANS_SQL = _kmeans_sql()


def cluster_label_mix(sf_dir: str):
    """Semantic data-mixing table: per (k-means cluster, label) vector
    counts — the audit behind cluster-balanced corpus sampling (how are
    the topical labels distributed over semantic clusters?). Runs the
    same deterministic Lloyd loop as kmeans_embeddings
    (`_kmeans_centroids` — exact int64 partial sums, bit-identical under
    any block structure), then ONE streaming assignment pass emitting
    per-batch PARTIAL (cluster, label) counts, combined by an O(k x
    labels) fastagg shuffle. The corpus never shuffles; the broadcast is
    the k x DIM centroid matrix. Returns (cluster, label, n_vecs)."""
    import ray

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    C = _kmeans_centroids(sf_dir)
    ref = ray.put(C)

    def partial(batch: pa.Table) -> pa.Table:
        C_ = ray.get(ref)
        _, mat = _emb_matrix(batch)
        cl = _km_assign(mat, C_)
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        # per-batch combine: pack (cluster, label) into one key — the
        # label rides in the low 32 bits as its uint32 image, so ANY
        # int32 label (negative included) round-trips exactly
        key = (cl.astype(np.int64) << 32) | (lab & 0xFFFFFFFF)
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        lab_u = (uk & 0xFFFFFFFF).astype(np.uint32).view(np.int32).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(uk >> 32, type=pa.int64()),
                "label": pa.array(lab_u, type=pa.int64()),
                "n_vecs": pa.array(n, type=pa.int64()),
            }
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096),
        ["cluster", "label"],
        {"n_vecs": ("n_vecs", "sum")},
        num_parts=4,
    )


CLUSTER_LABEL_MIX_SQL = f"""
SELECT km.cluster, CAST(l.label AS BIGINT) AS label, count(*) AS n_vecs
FROM ({KMEANS_SQL}) km
JOIN embeddings l ON l.vec_id = km.vec_id
GROUP BY 1, 2
"""


# ---- IVF-style bucketed ANN (the scale path for similarity search) ----

N_COARSE = 16   # coarse centroids (deterministic: the first N_COARSE vectors)
N_PROBE = 4     # buckets searched per query


def _prefix_rows(sf_dir: str, max_id: int):
    """Broadcast-side loader shared by the ANN variants: reads ONLY the
    vec_id < max_id prefix (predicate pushdown — the coarse-centroid /
    training / query sides are tiny constant-size model artifacts) and
    returns (ids, rows) where rows(mask) materializes the masked
    embeddings as a float64 matrix in file order."""
    import pyarrow.parquet as pq

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", max_id)],
    )
    ids_all = qt.column("vec_id").to_numpy(zero_copy_only=False)
    emb_col = qt.column("embedding")

    def rows(mask) -> np.ndarray:
        sel = [int(i) for i in np.nonzero(mask)[0]]
        return np.array([emb_col[i].as_py() for i in sel], dtype=np.float64)

    return ids_all, rows


def _bucket_table(batch: pa.Table, coarse_n: np.ndarray) -> pa.Table:
    """IVF bucket assignment kernel (one matmul per batch): normalize,
    argmax against the coarse centroids, emit (bucket, vec_id, embn)."""
    ids, mat = _emb_matrix(batch)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bucket = np.argmax(matn @ coarse_n.T, axis=1).astype(np.int64)
    offs = np.arange(0, (len(ids) + 1) * DIM, DIM, dtype=np.int32)
    return pa.table(
        {
            "bucket": pa.array(bucket, type=pa.int64()),
            "vec_id": pa.array(ids, type=pa.int64()),
            "embn": pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(matn.ravel(), type=pa.float64()),
            ),
        }
    )


def embed_topk_ivf(sf_dir: str):
    """Approximate top-k: vectors are assigned to their nearest coarse
    centroid inside map_batches (one matmul per batch), shuffled once by
    bucket, and each query searches only its N_PROBE nearest buckets —
    the IVF structure that keeps ANN sub-linear at 10^9+ vectors. The
    coarse "codebook" here is deterministic (first N_COARSE vectors);
    swapping in k-means centroids changes recall, not the pipeline shape.

    Returns (qid, vec_id, cosine) like embed_topk; recall vs brute force
    is pinned by tests (approximate by design -> rows-only check)."""
    import ray

    ids_all, _rows = _prefix_rows(sf_dir, max(N_COARSE, N_QUERIES))
    coarse = _rows(ids_all < N_COARSE)
    coarse_n = coarse / np.linalg.norm(coarse, axis=1, keepdims=True)
    q_mat = _rows(ids_all < N_QUERIES)
    q_ids = ids_all[ids_all < N_QUERIES]
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    # each query probes its N_PROBE nearest coarse buckets
    q_aff = qn @ coarse_n.T
    q_probe = np.argsort(-q_aff, axis=1)[:, :N_PROBE]
    shared = ray.put((coarse_n, q_ids, qn, q_probe))

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        return _bucket_table(batch, ray.get(shared)[0])

    bucketed = ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)

    def search_bucket(g: pd.DataFrame) -> pa.Table:
        coarse_n, q_ids, qn, q_probe = ray.get(shared)
        b = int(g["bucket"].iloc[0])
        probing = np.nonzero((q_probe == b).any(axis=1))[0]
        if len(probing) == 0:
            return pa.table(
                {"qid": pa.array([], type=pa.int64()), "vec_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        ids = g["vec_id"].to_numpy()
        mat = np.array(g["embn"].tolist(), dtype=np.float64)
        sims = qn[probing] @ mat.T
        out_q, out_v, out_s = [], [], []
        for row, qi in enumerate(probing):
            qid = int(q_ids[qi])
            mask = ids != qid
            cand = np.nonzero(mask)[0]
            order = cand[np.lexsort((ids[cand], -sims[row][cand]))][:K]
            out_q.append(np.full(len(order), qid, dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(sims[row][order])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cosine": pa.array(np.round(np.concatenate(out_s), 6), type=pa.float64()),
            }
        )

    partials = bucketed.groupby("bucket").map_groups(search_bucket, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(K)

    return partials.groupby("qid").map_groups(merge, batch_format="pandas")

# ---- product-quantization ANN (asymmetric distance computation) ----

PQ_M = 16  # subspaces of DIM // PQ_M dims -> 16-byte codes (16x vs fp32)
PQ_K = 32  # centroids per subspace (fits uint8 codes with headroom)
PQ_TRAIN = 1024  # deterministic training sample: vec_id < PQ_TRAIN
PQ_ITERS = 10
PQ_RERANK = 64  # global ADC shortlist size per query for exact rerank
# (M=16, K=32, R=64 measured recall@5 = 1.0 vs brute force at sf0.001;
# M=8/R=40 was 0.78 — the tuning sweep lives in NOTES_r3.md)


def _pq_train(sample: np.ndarray, seed: int = 11) -> np.ndarray:
    """Per-subspace Lloyd k-means codebooks over a normalized training
    sample (Jégou, Douze & Schmid 2011). Driver-side on a CONSTANT-size
    sample — the codebook is a model artifact like the LSH planes, not a
    data-scale computation. Deterministic (fixed-seed init, numpy only).
    Returns (PQ_M, PQ_K, DIM // PQ_M)."""
    n, dim = sample.shape
    sub = dim // PQ_M
    k = min(PQ_K, n)
    books = np.empty((PQ_M, k, sub), dtype=np.float64)
    rs = np.random.RandomState(seed)
    for m in range(PQ_M):
        x = sample[:, m * sub : (m + 1) * sub]
        cents = x[rs.choice(n, k, replace=False)].copy()
        for _ in range(PQ_ITERS):
            d = ((x[:, None, :] - cents[None]) ** 2).sum(-1)
            assign = d.argmin(1)
            for ci in range(k):
                mask = assign == ci
                if mask.any():
                    cents[ci] = x[mask].mean(0)
        books[m] = cents
    return books


def _pq_c2(books: np.ndarray) -> np.ndarray:
    """||c||^2 per subspace centroid, for the encode argmin without the
    (constant) ||x||^2 term. Query-independent — computed once driver-side
    and shipped with the codebooks."""
    return np.stack([(b**2).sum(1) for b in books])


def _adc_sims(matn: np.ndarray, books: np.ndarray, c2: np.ndarray,
              tabs_rows: np.ndarray) -> np.ndarray:
    """ADC scan: encode each candidate row to its per-subspace nearest
    centroid and sum the queries' inner-product table entries.
    tabs_rows is (n_queries, PQ_M, PQ_K); returns (n_queries, n_rows)."""
    sub = matn.shape[1] // PQ_M
    xs = matn.reshape(len(matn), PQ_M, sub)
    sims = np.zeros((tabs_rows.shape[0], len(matn)))
    for m in range(PQ_M):
        codes = (c2[m][None, :] - 2.0 * xs[:, m, :] @ books[m].T).argmin(1)
        sims += tabs_rows[:, m, codes]
    return sims


def embed_topk_pq(sf_dir: str):
    """Approximate cosine top-k via product quantization: every vector is
    encoded to PQ_M uint8 codes (16 bytes at DIM=64 — 16x smaller than
    the fp32 payload, the memory-bound regime for 10^9+ vector ANN), and
    each query scores candidates with one table lookup per subspace
    (asymmetric distance: query stays exact, candidate is its nearest
    per-subspace centroid), then the GLOBAL ADC top-PQ_RERANK shortlist
    per query (assembled exactly from per-batch top-R partials, since ADC
    scores are batch-independent) is reranked with exact cosine — the
    standard
    PQ-scan + rerank plan: exact math touches ~1% of the vectors, the
    other 99% are scored from 8-byte codes. Same
    partial-top-k-per-batch + tiny groupby(qid) merge as embed_topk;
    composes with the IVF bucketing (embed_topk_ivf) for the full
    IVF-PQ scale path.

    Approximate by design -> rows-only driver check; recall vs the exact
    brute force and golden values are pinned in tests."""
    import ray

    ids_all, _rows = _prefix_rows(sf_dir, max(PQ_TRAIN, N_QUERIES))
    train = _rows(ids_all < PQ_TRAIN)
    train_n = train / np.linalg.norm(train, axis=1, keepdims=True)
    books = _pq_train(train_n)
    sub = train.shape[1] // PQ_M

    q_mat = _rows(ids_all < N_QUERIES)
    q_ids = ids_all[ids_all < N_QUERIES]
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    # ADC inner-product tables: tabs[q, m, k] = q_sub(m) . books[m, k]
    tabs = np.einsum("qmd,mkd->qmk", qn.reshape(len(q_ids), PQ_M, sub), books)
    shared = ray.put((q_ids, qn, tabs, books, _pq_c2(books)))

    def encode_fn(batch: pa.Table) -> pa.Table:
        q_ids_, qn_, tabs_, books_, c2_ = ray.get(shared)
        ids, mat = _emb_matrix(batch)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = _adc_sims(matn, books_, c2_, tabs_)
        out_q, out_v, out_a, out_s = [], [], [], []
        for qi, qid in enumerate(q_ids_.tolist()):
            row = sims[qi]
            cand = np.nonzero(ids != qid)[0]
            short = cand[np.lexsort((ids[cand], -row[cand]))][:PQ_RERANK]
            exact = matn[short] @ qn_[qi]
            out_q.append(np.full(len(short), qid, dtype=np.int64))
            out_v.append(ids[short])
            out_a.append(row[short])
            out_s.append(exact)
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "adc": pa.array(np.concatenate(out_a), type=pa.float64()),
                "cosine": pa.array(
                    np.round(np.concatenate(out_s), 6), type=pa.float64()
                ),
            }
        )

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partials = ds.map_batches(encode_fn, batch_format="pyarrow", batch_size=4096)

    # Batching-invariant merge: the ADC score of a candidate depends only
    # on (candidate vector, codebooks, query) — never on which block it
    # arrived in — so per-batch top-R by (adc desc, vec_id asc) merges
    # EXACTLY to the global top-R ADC shortlist (any global top-R element
    # is a top-R element of its own batch). Reranking that canonical
    # shortlist with the exact cosines makes the result independent of
    # block structure / num_cpus, per the repo invariance rule.
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        short = g.sort_values(["adc", "vec_id"], ascending=[False, True]).head(PQ_RERANK)
        top = short.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(K)
        return top[["qid", "vec_id", "cosine"]]

    return partials.groupby("qid").map_groups(merge, batch_format="pandas")


# ---- composed IVF-PQ ANN (the full 10^9-vector scale path) ----


def embed_topk_ivfpq(sf_dir: str):
    """The composed IVF-PQ plan both building blocks document: vectors
    shuffle ONCE into coarse IVF buckets; each query searches only its
    N_PROBE nearest buckets; inside a bucket, candidates are scored from
    PQ codes (ADC table lookups — the memory-bound 16-bytes-per-vector
    regime) and only the per-bucket ADC shortlist is reranked with exact
    cosine. The global merge is batching-invariant by the same argument
    as embed_topk_pq: ADC scores depend only on (vector, codebooks,
    query), and buckets PARTITION the probed candidates, so per-bucket
    top-R shortlists merge exactly to the global top-R.

    At 10^9+ vectors this is the standard serving layout (IVF prunes to
    N_PROBE/N_COARSE of the corpus, PQ cuts bytes-touched 16x, exact
    math touches only the shortlist). Approximate by design -> rows-only
    driver check; recall vs brute force pinned in tests."""
    import ray

    ids_all, _rows = _prefix_rows(sf_dir, max(PQ_TRAIN, N_COARSE, N_QUERIES))
    coarse = _rows(ids_all < N_COARSE)
    coarse_n = coarse / np.linalg.norm(coarse, axis=1, keepdims=True)
    train = _rows(ids_all < PQ_TRAIN)
    train_n = train / np.linalg.norm(train, axis=1, keepdims=True)
    books = _pq_train(train_n)
    sub = train.shape[1] // PQ_M

    q_mat = _rows(ids_all < N_QUERIES)
    q_ids = ids_all[ids_all < N_QUERIES]
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_probe = np.argsort(-(qn @ coarse_n.T), axis=1)[:, :N_PROBE]
    tabs = np.einsum("qmd,mkd->qmk", qn.reshape(len(q_ids), PQ_M, sub), books)
    shared = ray.put((coarse_n, q_ids, qn, q_probe, tabs, books, _pq_c2(books)))

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        return _bucket_table(batch, ray.get(shared)[0])

    bucketed = ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)

    def search_bucket(g: pd.DataFrame) -> pa.Table:
        _, q_ids_, qn_, q_probe_, tabs_, books_, c2_ = ray.get(shared)
        b = int(g["bucket"].iloc[0])
        probing = np.nonzero((q_probe_ == b).any(axis=1))[0]
        empty = pa.table(
            {
                "qid": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "adc": pa.array([], type=pa.float64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
        if len(probing) == 0:
            return empty
        ids = g["vec_id"].to_numpy()
        matn = np.array(g["embn"].tolist(), dtype=np.float64)
        sims = _adc_sims(matn, books_, c2_, tabs_[probing])
        out_q, out_v, out_a, out_s = [], [], [], []
        for row, qi in enumerate(probing):
            qid = int(q_ids_[qi])
            cand = np.nonzero(ids != qid)[0]
            short = cand[np.lexsort((ids[cand], -sims[row][cand]))][:PQ_RERANK]
            out_q.append(np.full(len(short), qid, dtype=np.int64))
            out_v.append(ids[short])
            out_a.append(sims[row][short])
            out_s.append(matn[short] @ qn_[qi])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "adc": pa.array(np.concatenate(out_a), type=pa.float64()),
                "cosine": pa.array(
                    np.round(np.concatenate(out_s), 6), type=pa.float64()
                ),
            }
        )

    partials = bucketed.groupby("bucket").map_groups(
        search_bucket, batch_format="pandas"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        short = g.sort_values(["adc", "vec_id"], ascending=[False, True]).head(
            PQ_RERANK
        )
        top = short.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(K)
        return top[["qid", "vec_id", "cosine"]]

    return partials.groupby("qid").map_groups(merge, batch_format="pandas")


# ---- grouped vector aggregate (per-label centroid sums) ----


def label_centroid_sums(sf_dir: str):
    """Grouped aggregate over a VECTOR column: per-label sum of the
    embedding vectors plus member counts — the reduction behind class
    centroids / per-domain mean embeddings in a training-data pipeline.
    Per batch, one np.add.at folds the whole (rows x DIM) block into
    per-label partial matrices; only O(labels x DIM) skinny rows reach
    the shuffle. Sums are exact int64 on the 1e-6 quantization grid
    (floor(v*1e6 + 0.5), the kmeans discipline) so the result is
    bit-identical under any block structure AND matches the SQL oracle
    exactly. Output one row per (label, dim): mean_q = qsum / n_vecs
    de-quantizes driver-side when a caller wants the centroid."""
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, q.shape[1]), type=pa.int64()),
                "dim": pa.array(np.tile(np.arange(q.shape[1], dtype=np.int64), len(uniq))),
                "qsum": pa.array(sums.ravel(), type=pa.int64()),
                "n_vecs": pa.array(np.repeat(counts, q.shape[1]), type=pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return grouped_agg(
        parts,
        keys=["label", "dim"],
        agg_spec={"qsum": ("qsum", "sum"), "n_vecs": ("n_vecs", "sum")},
        num_parts=8,
    )


LABEL_CENTROID_SUMS_SQL = f"""
SELECT CAST(label AS BIGINT) AS label, g AS dim,
       CAST(SUM(CAST(floor(CAST(embedding[g + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS qsum,
       count(*) AS n_vecs
FROM embeddings, generate_series(0, {DIM - 1}) AS t(g)
GROUP BY label, g
"""


# ---- SemDeDup: semantic dedup inside k-means clusters (wave 10) ----

# cosine threshold as an exact rational NUM/DEN so the keep/drop test is
# pure integer arithmetic in both engines (0.25 bites on this corpus —
# the synthetic embeddings are near-isotropic, 99th-pct pairwise cosine
# ≈ 0.29; real near-dup corpora would run this at 0.9+)
SD_THR_NUM, SD_THR_DEN = 1, 4


def semdedup(sf_dir: str, thr_num: int = SD_THR_NUM, thr_den: int = SD_THR_DEN):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    corpus with k-means, then inside each cluster drop every vector that
    has a cosine-similar predecessor. Deterministic drop rule — v is
    dropped iff ANY u in the same cluster with u.vec_id < v.vec_id has
    cos(u, v) >= NUM/DEN — so the result is a pure function of the data
    (no greedy chain, SQL-expressible, block-structure invariant).

    Exactness: vectors are quantized to the 1e-6 grid (the kmeans
    discipline). All dot products / norms of quantized values stay below
    2^53 (|q| <= ~5e5, 64 dims -> sums <= ~1.6e13), so float64 BLAS
    matmuls compute them EXACTLY; the threshold test
    s > 0 AND s^2·DEN^2 >= NUM^2·nn_u·nn_v needs ~2^90 bits, so it runs
    in float64 with a certainty band and falls back to arbitrary-
    precision Python ints only for pairs inside the band. The SQL twin
    does the same test in HUGEINT — bit-identical keep sets.

    Scale: ONE shuffle of the corpus by cluster id; per-cluster work is
    O(n_c^2) dot products — the SemDeDup design point (k is chosen so
    n_c stays bounded; the paper runs k=50k over LAION). Assignment is a
    broadcast (k x DIM centroids via ray.put) streaming pass."""
    import ray

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    C = _kmeans_centroids(sf_dir, ds=ds)
    ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        C_ = ray.get(ref)
        _, mat = _emb_matrix(batch)
        cl = _km_assign(mat, C_)
        return batch.append_column("cluster", pa.array(cl, type=pa.int64()))

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)

    num2 = float(thr_num * thr_num)
    den2 = float(thr_den * thr_den)

    def kernel(g: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(g)
        cluster = int(g.column("cluster")[0].as_py())
        order = np.argsort(ids)  # vec_id unique -> total order
        ids, mat = ids[order], mat[order]
        q = np.floor(mat * _KM_Q + 0.5)  # integer-valued float64 (exact)
        nn = (q * q).sum(axis=1)  # exact: <= 64 * (5e5)^2 ~ 1.6e13 < 2^53
        n = len(ids)
        dropped = np.zeros(n, dtype=bool)
        B = 2048  # row block: bounds the Gram slab at B x n_c float64
        for b0 in range(1, n, B):
            b1 = min(b0 + B, n)
            S = q[b0:b1] @ q.T  # exact integer Gram (see docstring)
            lhs = S * S * den2
            rhs = num2 * np.outer(nn[b0:b1], nn)
            # only u strictly earlier than v counts
            earlier = np.arange(n)[None, :] < np.arange(b0, b1)[:, None]
            hit = (S > 0) & (lhs >= rhs) & earlier
            # certainty band: float64 products carry ~1e-15 rel error;
            # pairs within 1e-9 relative get the exact integer test
            near = (S > 0) & earlier & (
                np.abs(lhs - rhs) <= 1e-9 * np.maximum(lhs, np.abs(rhs))
            )
            for i, u in zip(*np.nonzero(near)):
                s = int(S[i, u])
                hit[i, u] = s * s * thr_den * thr_den >= (
                    thr_num * thr_num * int(nn[b0 + i]) * int(nn[u])
                )
            dropped[b0:b1] |= hit.any(axis=1)
        keep = ~dropped
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], type=pa.int64()),
                "cluster": pa.array(
                    np.full(int(keep.sum()), cluster), type=pa.int64()
                ),
            }
        )

    return assigned.groupby("cluster").map_groups(kernel, batch_format="pyarrow")


SEMDEDUP_SQL = f"""
WITH km AS ({KMEANS_SQL}),
q AS (
  SELECT vec_id,
         list_transform(range(1, {DIM + 1}),
                        i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * {_KM_Q} + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
a AS (
  SELECT km.vec_id, km.cluster, q.qv,
         list_sum(list_transform(q.qv, x -> x * x)) AS nn
  FROM km JOIN q USING (vec_id)
),
p AS (
  SELECT v.vec_id,
         list_sum(list_transform(range(1, {DIM + 1}), i -> u.qv[i] * v.qv[i])) AS s,
         u.nn AS nu, v.nn AS nv
  FROM a v JOIN a u ON u.cluster = v.cluster AND u.vec_id < v.vec_id
),
dropped AS (
  SELECT DISTINCT vec_id FROM p
  WHERE s > 0
    AND CAST(s AS HUGEINT) * s * {SD_THR_DEN * SD_THR_DEN}
        >= {SD_THR_NUM * SD_THR_NUM} * CAST(nu AS HUGEINT) * nv
)
SELECT a.vec_id, a.cluster FROM a
WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = a.vec_id)
"""


def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)


# ---- prototypicality pruning (wave 26) ----

PP_NUM, PP_DEN = 3, 10  # prune the 30% most prototypical of each cluster


def proto_prune(sf_dir: str):
    """Prototypicality-based corpus pruning (Sorscher et al., "Beyond
    neural scaling laws", NeurIPS 2022, public): cluster the embeddings
    with the shared deterministic Lloyd loop, score every vector by its
    squared distance to its cluster centroid, and inside each cluster
    DROP the floor(n_c * PP_NUM / PP_DEN) most prototypical vectors
    (smallest distance) — at scale, pruning easy/prototypical examples
    beats random pruning. Returns every vector with its cluster, exact
    integer distance and keep flag.

    Exactness contract (the kmeans/semdedup discipline): the RANKING
    metric is d2q = sum_i (q_i - cq_i)^2 where q = floor(x*1e6 + 0.5)
    and cq = floor(c*1e6 + 0.5) — both int64, products < 2^53, so the
    scores are exact integers and the per-cluster order
    (d2q DESC, vec_id ASC) is total: bit-identical under any block
    structure, and the SQL twin evaluates the identical expression
    (assignment itself uses the float centroids, exactly like
    kmeans_embeddings / KMEANS_SQL's final pass).

    Scale: one k x DIM broadcast + one streaming score pass + ONE
    shuffle by cluster; the per-cluster kernel is a lexsort (linear in
    the cluster, no pairwise work — unlike semdedup). For clusters too
    large for one task, the distributed in-stratum rank device
    (webtext.data_split) is the drop-in twin."""
    import ray

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    C = _kmeans_centroids(sf_dir, ds=ds)
    cq = np.floor(C * _KM_Q + 0.5).astype(np.int64)
    ref = ray.put((C, cq))

    def score(batch: pa.Table) -> pa.Table:
        C_, cq_ = ray.get(ref)
        ids, mat = _emb_matrix(batch)
        cl = _km_assign(mat, C_)
        q = np.floor(mat * _KM_Q + 0.5).astype(np.int64)
        diff = q - cq_[cl]
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(cl, type=pa.int64()),
                "d2q": pa.array((diff * diff).sum(axis=1), type=pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=4096)

    def rank(g: pa.Table) -> pa.Table:
        ids = g.column("vec_id").to_numpy(zero_copy_only=False)
        d2 = g.column("d2q").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -d2))  # d2q DESC, vec_id ASC — total
        nc = len(ids)
        n_keep = nc - nc * PP_NUM // PP_DEN
        keep = np.zeros(nc, dtype=np.int64)
        keep[order[:n_keep]] = 1
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": g["cluster"],
                "d2q": pa.array(d2, type=pa.int64()),
                "keep": pa.array(keep, type=pa.int64()),
            }
        )

    return scored.groupby("cluster").map_groups(rank, batch_format="pyarrow")


# the tail CTEs continue _kmeans_sql's WITH list (leading comma) so the
# twin reuses the byte-identical Lloyd chain, then scores/ranks exactly
PROTO_PRUNE_SQL = _kmeans_sql(
    final_select=f""",
qv AS (
  SELECT vec_id,
         list_transform(range(1, {DIM + 1}),
                        i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * {_KM_Q} + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
cq AS (
  SELECT cid, list_transform(emb, x -> CAST(floor(x * {_KM_Q} + 0.5) AS BIGINT)) AS cqv
  FROM c{KM_ITERS}
),
d AS (
  SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
         list_sum(list_transform(range(1, {DIM + 1}),
                  i -> (qv.qv[i] - cq.cqv[i]) * (qv.qv[i] - cq.cqv[i]))) AS d2q
  FROM af a JOIN qv ON qv.vec_id = a.vec_id JOIN cq ON cq.cid = a.cid
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY d2q DESC, vec_id) AS rn,
         count(*) OVER (PARTITION BY cluster) AS nc
  FROM d
)
SELECT vec_id, cluster, CAST(d2q AS BIGINT) AS d2q,
       CAST(CASE WHEN rn <= nc - (nc * {PP_NUM}) // {PP_DEN} THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM r"""
)


# ---------------------------------------------------------------------------
# exact Gram matrix (wave 32) — the PCA / covariance front-end
# ---------------------------------------------------------------------------


def embed_gram(sf_dir: str):
    """Exact Gram matrix of the embedding corpus on the 1e-6 grid:
    G[i,j] = Σ_rows q_i · q_j with q = floor(x·1e6 + 0.5) (the kmeans /
    semdedup quantization discipline), upper triangle only (i <= j,
    1-based to match the SQL twin). This is the distributed front-end of
    PCA / covariance estimation: mean sums are G's first moments'
    sibling and the eigensolve is an O(d²) driver step.

    Exactness: per-batch partials are float64 BLAS QᵀQ — exact integer
    arithmetic while batch_rows · max|q|² < 2^53 (|x| < 0.5 in this
    corpus → |q| ≤ 5e5 → 8192-row batches bound the partial at ~2e15),
    asserted fail-loud per batch; partials convert to int64 and combine
    by grouped sum. A sentinel row carries Σ_batches rows·max|q|² so the
    driver can certify the GLOBAL int64 budget (each |G[i,j]| is bounded
    by that total) before returning — overflow cannot pass silently.

    Shape: one streaming scan emitting d(d+1)/2 = 2080 rows per block +
    one O(d²) grouped sum. Nothing corpus-sized moves."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    iu, ju = np.triu_indices(DIM)

    def partial(batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        q = np.floor(mat * 1e6 + 0.5)
        maxq = float(np.abs(q).max(initial=0.0))
        budget = len(q) * maxq * maxq
        if budget >= 2**53:
            raise ValueError(
                "embed_gram: per-batch float64 exactness budget exceeded "
                f"({len(q)} rows x max|q|^2 {maxq**2:.3g})"
            )
        G = (q.T @ q)[iu, ju].astype(np.int64)
        # sentinel key j = -(first vec_id)-2: unique per batch (vec_ids are
        # unique and batches disjoint), so the grouped int64 sum NEVER adds
        # two budgets — the certification total is summed in Python ints on
        # the driver and cannot wrap
        i_out = np.r_[iu + 1, [-1]]
        j_out = np.r_[ju + 1, [-(int(ids[0]) if len(ids) else 0) - 2]]
        s_out = np.r_[G, [int(budget)]]
        return pa.table(
            {
                "i": pa.array(i_out, type=pa.int64()),
                "j": pa.array(j_out, type=pa.int64()),
                "s": pa.array(s_out, type=pa.int64()),
            }
        )

    summed = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192),
        ["i", "j"],
        {"s": ("s", "sum")},
        num_parts=4,
    )
    # O(d^2) rows: certify the global budget on the driver, drop the sentinel
    tbl = pa.Table.from_pandas(summed.to_pandas(), preserve_index=False)
    i = tbl.column("i").to_numpy(zero_copy_only=False)
    s = tbl.column("s").to_numpy(zero_copy_only=False)
    sent = i == -1
    if sent.any() and sum(int(x) for x in s[sent]) >= 2**62:
        raise ValueError("embed_gram: global int64 budget exceeded")
    out = tbl.filter(pa.array(~sent))
    return out.select(["i", "j", "s"]).sort_by([("i", "ascending"), ("j", "ascending")])


EMBED_GRAM_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
)
SELECT i, j, CAST(sum(qv[i] * qv[j]) AS BIGINT) AS s
FROM q,
     LATERAL UNNEST(generate_series(1, {DIM})) AS t(i),
     LATERAL UNNEST(generate_series(1, {DIM})) AS u(j)
WHERE j >= i
GROUP BY i, j
"""


# ---------------------------------------------------------------------------
# distributed PCA projection (wave 50)
# ---------------------------------------------------------------------------

_PCA_K = 2  # reported principal components


def pca_project(sf_dir: str):
    """Distributed PCA: project every embedding onto the corpus's top-2
    principal components — the classic spectral front-end (whitening /
    visualization / spectral dedup). Returns (vec_id, pc1, pc2) in
    EXACT integers (see units below), bit-identical under any block
    structure or num_cpus.

    Plan (the 10^12-row shape): one streaming pass accumulates the
    exact integer moment partials on the 1e-6 grid — per-dim sums S1
    and the upper-triangle second moment QᵀQ (the embed_gram kernel,
    same float64-exactness budget, fail-loud) — reduced by ONE O(d²)
    grouped sum. The driver forms the covariance from the exact
    moments, runs the O(d³) eigensolve on the d×d matrix (d=64), fixes
    each eigenvector's sign (largest-|component| positive) and
    quantizes it to the 1e-6 grid. A second streaming pass computes

        pc_k = Σ_d (n·q_d − S1_d) · w_kd        (pure int64 numpy)

    — i.e. n × grid² × (centered coordinate · eigenvector): integer
    matmul is exact and associative, so no BLAS/blocking effect can
    leak into the result. Nothing corpus-sized ever leaves the workers;
    the driver holds O(d²) integers.

    No SQL twin (eigensolve); pinned by an independent single-process
    reference + planted-structure + block-invariance tests."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    iu, ju = np.triu_indices(DIM)

    def moments(batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        q = np.floor(mat * 1e6 + 0.5)
        maxq = float(np.abs(q).max(initial=0.0))
        if len(q) * maxq * maxq >= 2**53:
            raise ValueError("pca_project: per-batch exactness budget exceeded")
        G = (q.T @ q)[iu, ju].astype(np.int64)
        s1 = q.sum(axis=0).astype(np.int64)
        # rows: (1, d) second moments; (0, d) first moments; (-1, 0) count
        i_out = np.r_[np.ones(len(G), dtype=np.int64), np.zeros(DIM, dtype=np.int64), [-1]]
        j_out = np.r_[iu * DIM + ju, np.arange(DIM, dtype=np.int64), [0]]
        s_out = np.r_[G, s1, [len(ids)]]
        return pa.table(
            {
                "i": pa.array(i_out, type=pa.int64()),
                "j": pa.array(j_out, type=pa.int64()),
                "s": pa.array(s_out, type=pa.int64()),
            }
        )

    mom = grouped_agg(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=8192),
        ["i", "j"],
        {"s": ("s", "sum")},
        num_parts=4,
    ).to_pandas()

    n = int(mom.loc[mom["i"] == -1, "s"].iloc[0])
    s1 = np.zeros(DIM, dtype=np.int64)
    for _, r in mom[mom["i"] == 0].iterrows():
        s1[int(r["j"])] = int(r["s"])
    G = np.zeros((DIM, DIM), dtype=np.int64)
    for _, r in mom[mom["i"] == 1].iterrows():
        a, b = divmod(int(r["j"]), DIM)
        G[a, b] = G[b, a] = int(r["s"])
    # covariance from exact integers (float64 only on the driver, once)
    cov = (G.astype(np.float64) - np.outer(s1, s1).astype(np.float64) / n) / n
    _, evecs = np.linalg.eigh(cov)
    W = evecs[:, ::-1][:, :_PCA_K]  # eigh is ascending; take the top-K
    # sign convention: largest-|component| positive (first index on ties)
    for k in range(_PCA_K):
        a = np.argmax(np.abs(W[:, k]))
        if W[a, k] < 0:
            W[:, k] = -W[:, k]
    wq = np.floor(W * 1e6 + 0.5).astype(np.int64)  # (d, K) integer grid

    import ray

    ref = ray.put((int(n), s1, wq))

    def project(batch: pa.Table) -> pa.Table:
        n_, s1_, wq_ = ray.get(ref)
        ids, mat = _emb_matrix(batch)
        q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        # int64 budget: |Σ_d (n·q − S1)·w| ≤ D · 2n·max|q| · max|w|
        bound = DIM * 2 * n_ * int(np.abs(q).max(initial=0)) * int(
            np.abs(wq_).max(initial=0)
        )
        if bound >= 2**63:
            raise ValueError(
                "pca_project: int64 projection budget exceeded — rescale "
                "the grid (corpus too large for the 1e-6 × n encoding)"
            )
        centered = q * n_ - s1_[None, :]  # exact: n·q − S1
        p = centered @ wq_  # int64 matmul — exact, order-free
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "pc1": pa.array(p[:, 0], type=pa.int64()),
                "pc2": pa.array(p[:, 1], type=pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", batch_size=8192)
