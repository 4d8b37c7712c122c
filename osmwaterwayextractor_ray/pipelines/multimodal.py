"""Multimodal (binary-column) plumbing.

Real image decode runs through PIL when Pillow is installed (probed once
per actor, ``_probe_pil``); this container has no codecs, so the synthetic
'image/fake' type decodes via a deterministic STUB (clearly marked below)
and other types raise. The Ray-side plumbing is identical either way and
fully tested: an opaque ``payload: binary`` column with typed metadata
flows through an actor-pool ``map_batches`` stage with small batches
(binary rows are wide), producing a feature table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.functions.hashing import xxh64

from osmwaterwayextractor_ray.stages._pool import pool_max


def media_from_documents(sf_dir: str):
    """Synthesize an opaque binary payload column from the documents table
    (utf-8 bytes stand in for an encoded image/audio blob)."""
    import ray.data as rd

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])

    def to_media(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        payloads = [t.encode("utf-8") for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_type": pa.array(
                    ["image/fake" for _ in payloads], type=pa.string()
                ),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    # block-native batches (no batch_size): slicing read blocks into fixed
    # batches would make Ray unify the parquet blocks' pandas-metadata
    # schemas, which are unhashable and spam "Failed to hash the schemas"
    # warnings; the output tables below are fresh, metadata-free schemas
    return ds.map_batches(to_media, batch_format="pyarrow")


def _probe_pil():
    """Optional-dependency probe: return PIL.Image when Pillow is
    installed, else None. Called once per actor (in __init__), so the
    import cost is paid per worker process, not per batch."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_stub(payload: bytes) -> dict:
    """STUB: stands in for a real decode (PIL.Image.open / av.open).

    Raises NotImplementedError for media types a real decoder would
    handle; returns deterministic fake features for the synthetic type so
    the pipeline shape is testable end-to-end."""
    h = xxh64(payload)
    return {
        "n_bytes": len(payload),
        "content_hash": h & 0x7FFFFFFFFFFFFFFF,
        # fake "decoded" dimensions derived from the content hash
        "width": 64 + (h & 0x3FF),
        "height": 64 + ((h >> 10) & 0x3FF),
    }


class MediaFeatureExtractor:
    """Actor-pool stage: per-batch decode + feature extraction. Decoder
    state (the probed PIL module — codec tables / a loaded model in a
    richer deployment) is held from __init__, once per actor.

    Media-type dispatch: 'image/fake' always uses the deterministic stub
    (the golden-pinned synthetic path); real 'image/*' payloads decode via
    PIL when Pillow is installed; anything else (or an image without PIL)
    raises NotImplementedError — declared, never silently fabricated."""

    def __init__(self):
        self.decode = _decode_stub
        self._pil_image = _probe_pil()

    def _decode_real(self, payload: bytes) -> dict:
        import io

        img = self._pil_image.open(io.BytesIO(payload))
        w, h = img.size
        return {
            "n_bytes": len(payload),
            "content_hash": xxh64(payload) & 0x7FFFFFFFFFFFFFFF,
            "width": int(w),
            "height": int(h),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        feats = []
        for p, mt in zip(payloads, mtypes):
            if mt == "image/fake":
                feats.append(self.decode(p or b""))
            elif mt.startswith("image/") and self._pil_image is not None:
                feats.append(self._decode_real(p or b""))
            else:
                raise NotImplementedError(
                    f"no decoder for media type {mt!r} in this environment"
                    + (" (install Pillow for image/*)" if mt.startswith("image/") else "")
                )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_bytes": pa.array([f["n_bytes"] for f in feats], type=pa.int64()),
                "content_hash": pa.array([f["content_hash"] for f in feats], type=pa.int64()),
                "width": pa.array([f["width"] for f in feats], type=pa.int64()),
                "height": pa.array([f["height"] for f in feats], type=pa.int64()),
            }
        )


def media_features(sf_dir: str):
    media = media_from_documents(sf_dir)
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=256,  # binary rows are wide — keep batches small
        concurrency=(1, pool_max()),
    )


def media_byte_stats(sf_dir: str):
    """Oracle-checkable projection of the media pipeline: payload byte
    length per doc (DuckDB: octet_length(encode(text)))."""
    import pyarrow.compute as pc

    return media_features(sf_dir).select_columns(["doc_id", "n_bytes"])


MEDIA_BYTE_STATS_SQL = "SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents"

class MediaResizer:
    """Actor-pool resize stage (thumbnailing for a vision training set).
    'image/fake' payloads "resize" via a deterministic byte-stride
    downsample sized by the stub-decoded dimensions — the STUB stand-in
    for PIL's ``img.resize`` + re-encode; real 'image/*' payloads resize
    through PIL when Pillow is installed. Output keeps the binary-column
    schema (payload stays opaque downstream), so resize stages chain
    like any other media transform."""

    TARGET = 64  # target square thumbnail edge

    def __init__(self):
        self._pil_image = _probe_pil()

    def _resize_stub(self, payload: bytes) -> tuple[bytes, int, int]:
        meta = _decode_stub(payload)
        # byte budget scales with pixel ratio, exactly like a re-encode
        ratio = (self.TARGET * self.TARGET) / float(meta["width"] * meta["height"])
        n_out = max(1, int(len(payload) * min(1.0, ratio)))
        stride = max(1, len(payload) // n_out)
        return payload[::stride][:n_out], self.TARGET, self.TARGET

    def _resize_real(self, payload: bytes) -> tuple[bytes, int, int]:
        import io

        img = self._pil_image.open(io.BytesIO(payload))
        thumb = img.resize((self.TARGET, self.TARGET))
        buf = io.BytesIO()
        thumb.save(buf, format="PNG")
        return buf.getvalue(), self.TARGET, self.TARGET

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        out, ws, hs = [], [], []
        for p, mt in zip(payloads, mtypes):
            if mt == "image/fake":
                b, w, h = self._resize_stub(p or b"")
            elif mt.startswith("image/") and self._pil_image is not None:
                b, w, h = self._resize_real(p or b"")
            else:
                raise NotImplementedError(f"no resizer for media type {mt!r}")
            out.append(b)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "media_type": batch["media_type"],
                "payload": pa.array(out, type=pa.binary()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
            }
        )


def media_resize(sf_dir: str):
    """Thumbnail pipeline: decode -> resize -> re-encoded binary column.
    Returns metadata only (payload dropped) so the driver's check stays
    small; payload determinism is pinned by tests/test_multimodal_ops.py."""
    import pyarrow.compute as pc

    media = media_from_documents(sf_dir)
    resized = media.map_batches(
        MediaResizer,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, pool_max()),
    )

    def meta(batch: pa.Table) -> pa.Table:
        n = pc.binary_length(batch["payload"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": batch["width"],
                "height": batch["height"],
                "thumb_bytes": pc.cast(n, pa.int64()),
            }
        )

    return resized.map_batches(meta, batch_format="pyarrow")


FRAME_BYTES = 256  # fake container frame size
FRAME_STRIDE = 4  # keep every 4th frame


def media_frame_sample(sf_dir: str):
    """Frame sampling for a fake video container: the payload is split
    into fixed FRAME_BYTES-size frames and every FRAME_STRIDE-th frame is
    emitted as its own row — the one-row-to-many-rows (flat_map) shape a
    real ffmpeg frame sampler has, with bounded per-row output. Fully
    oracle-checked: frame indices and byte lengths are pure functions of
    the payload length (the frame CONTENT hash is exercised by
    tests/test_multimodal_ops.py instead, since SQL can't xxh64)."""
    media = media_from_documents(sf_dir)

    def frames(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_n = [], [], []
        for did, p in zip(ids.tolist(), payloads):
            p = p or b""
            n_frames = max(1, -(-len(p) // FRAME_BYTES))
            for fi in range(0, n_frames, FRAME_STRIDE):
                chunk = p[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                out_id.append(did)
                out_idx.append(fi)
                out_n.append(len(chunk))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "n_frame_bytes": pa.array(out_n, type=pa.int64()),
            }
        )

    return media.map_batches(frames, batch_format="pyarrow")


MEDIA_FRAME_SAMPLE_SQL = f"""
WITH f AS (
  SELECT doc_id, octet_length(encode(text)) AS nb,
         unnest(range(0, GREATEST(1, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT)))) AS g
  FROM documents
)
SELECT doc_id, CAST(g AS BIGINT) AS frame_idx,
       CAST(LEAST({FRAME_BYTES}, nb - g * {FRAME_BYTES}) AS BIGINT) AS n_frame_bytes
FROM f WHERE g % {FRAME_STRIDE} = 0
"""


def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)


def media_dedup(sf_dir: str):
    """Exact binary-payload dedup — the media-modality twin of
    textops.dedup_exact: group the opaque payload column by its XXH64
    content hash (the binary blob itself never needs to compare equal in
    Python), keep the min doc_id per group, and report the copy count
    and payload size. Returns (doc_id, n_copies, n_bytes).

    Shape: one hash-keyed grouped_agg over (doc_id, h, n_bytes) — the
    payload leaves the scan ONLY as its 64-bit hash + length, so the
    shuffle moves 24 bytes/row no matter how wide the media blobs are
    (the pruned-shuffle discipline for multimodal columns)."""
    from osmwaterwayextractor_ray.functions.hashing import xxh64
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    media = media_from_documents(sf_dir)

    def add_hash(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        h = np.fromiter(
            (xxh64(p) for p in payloads), dtype=np.uint64, count=len(payloads)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(h.view(np.int64), type=pa.int64()),
                "n_bytes": pa.array(
                    np.fromiter((len(p) for p in payloads), dtype=np.int64,
                                count=len(payloads)),
                    type=pa.int64(),
                ),
                "one": pa.array(np.ones(len(payloads), dtype=np.int64)),
            }
        )

    hashed = media.map_batches(add_hash, batch_format="pyarrow")
    agg = grouped_agg(
        hashed,
        ["h"],
        {
            "doc_id": ("doc_id", "min"),
            "n_copies": ("one", "sum"),
            "n_bytes": ("n_bytes", "min"),
        },
        num_parts=16,
    )
    return agg.select_columns(["doc_id", "n_copies", "n_bytes"])


MEDIA_DEDUP_SQL = """
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents GROUP BY text
"""


# ---------------------------------------------------------------------------
# perceptual-hash near-dup over the media modality (wave 58)
# ---------------------------------------------------------------------------


def _phash_stub(payload: bytes) -> int:
    """STUB perceptual hash — the deterministic stand-in for a real
    pHash (DCT of a decoded thumbnail): split the byte stream into 64
    contiguous cells, bit i = (cell mean > global mean), integer
    arithmetic only. Near-identical payloads flip few cells, so the
    hamming distance behaves like a perceptual distance for the fake
    modality; a real deployment swaps this for a decoded-pixel DCT
    inside the same actor."""
    b = np.frombuffer(payload.ljust(64, b"\0"), dtype=np.uint8)
    idx = (np.arange(65, dtype=np.int64) * len(b)) // 64
    sums = np.add.reduceat(b.astype(np.int64), idx[:-1])
    counts = np.diff(idx)
    means = sums // counts
    bits = means > (int(means.sum()) // 64)
    h = 0
    for i in range(64):
        if bits[i]:
            h |= 1 << i
    return h


class MediaPHasher:
    """Actor-pool stage: decode (stub / PIL probe, the multimodal
    convention) + perceptual fingerprint per payload."""

    def __init__(self):
        self._pil_image = _probe_pil()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        hs = np.empty(len(payloads), dtype=np.uint64)
        for i, (p, mt) in enumerate(zip(payloads, mtypes)):
            if mt != "image/fake":
                raise NotImplementedError(
                    f"no perceptual hash for media type {mt!r} here"
                )
            hs[i] = _phash_stub(p or b"")
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "phash": pa.array(hs.view(np.int64), type=pa.int64()),
            }
        )


def _media_with_planted_copies(sf_dir: str):
    """media_from_documents ∪ planted copies: an exact byte-copy
    (doc_id + 1_000_000 — hamming 0 by construction) and a one-byte
    perturbation (doc_id + 2_000_000 — perceptually near) for every
    doc_id % 10 == 0, so the near-dup join has known positives at any
    scale without quadratic output."""
    media = media_from_documents(sf_dir)

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        mts = batch.column("media_type").to_pylist()
        out_id = list(ids)
        out_p = list(payloads)
        out_mt = list(mts)
        for did, p, mt in zip(ids.tolist(), payloads, mts):
            if did % 10:
                continue
            p = p or b""
            out_id.append(did + 1_000_000)
            out_p.append(p)
            out_mt.append(mt)
            flipped = bytearray(p.ljust(1, b"\0"))
            flipped[0] ^= 0x01
            out_id.append(did + 2_000_000)
            out_p.append(bytes(flipped))
            out_mt.append(mt)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "media_type": pa.array(out_mt, type=pa.string()),
                "payload": pa.array(out_p, type=pa.binary()),
            }
        )

    return media.map_batches(plant, batch_format="pyarrow")


def media_phash_neardup(sf_dir: str, max_hamming: int = 3):
    """Perceptual near-duplicate join over the media modality — the
    image-dedup stage of a multimodal training pipeline: per-payload
    64-bit perceptual hash (actor pool, decode state per actor), then
    the EXACT hamming <= 3 self-join via `fastagg.hamming_selfjoin`
    (4-block pigeonhole band + popcount verify — the simhash_neardup
    plan over binary payloads). Returns (doc_a, doc_b, hamming),
    doc_a < doc_b, over the planted-copy corpus.

    Payloads leave the scan only as 16 bytes/row (id + hash); nothing
    blob-sized shuffles. No SQL twin (the perceptual hash is not
    SQL-expressible) — pinned by a brute-force O(n²) popcount reference
    and planted exact-copy positives in tests/test_wave58.py."""
    from osmwaterwayextractor_ray.stages.fastagg import hamming_selfjoin
    from osmwaterwayextractor_ray.stages.pin import pin

    media = _media_with_planted_copies(sf_dir)
    prints = pin(
        media.map_batches(
            MediaPHasher,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, pool_max()),
        ),
        "media_phash_prints",
    )
    pairs = hamming_selfjoin(prints, "doc_id", "phash", max_hamming)
    return pairs.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "hamming"]),
        batch_format="pyarrow",
    )
