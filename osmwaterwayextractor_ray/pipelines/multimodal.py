"""Multimodal (binary-column) plumbing.

Real image decode: 'image/png' payloads decode through the repo's own
pure-stdlib PNG codec (``functions/png.py`` — zlib + numpy, from-scratch
per the public PNG spec), so REAL pixel paths run in this codec-less
container (VERDICT r4 #6); other 'image/*' types decode through PIL when
Pillow is installed (probed once per actor, ``_probe_pil``). The synthetic
'image/fake' type keeps its deterministic STUB (clearly marked below) for
the legacy golden-pinned queries, and genuinely unknown formats raise
NotImplementedError — the stub never silently stands in for a format a
real decoder would handle. The Ray-side plumbing is identical either way
and fully tested: an opaque ``payload: binary`` column with typed metadata
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
    (the golden-pinned synthetic path); 'image/png' decodes through the
    repo's own stdlib codec (real pixels, no optional dependency); other
    'image/*' payloads decode via PIL when Pillow is installed; anything
    else (or a non-PNG image without PIL) raises NotImplementedError —
    declared, never silently fabricated."""

    def __init__(self):
        self.decode = _decode_stub
        self._pil_image = _probe_pil()

    def _decode_png(self, payload: bytes) -> dict:
        from osmwaterwayextractor_ray.functions.png import decode_png

        px = decode_png(payload)
        return {
            "n_bytes": len(payload),
            "content_hash": xxh64(payload) & 0x7FFFFFFFFFFFFFFF,
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
        }

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
            elif mt == "image/png":
                feats.append(self._decode_png(p or b""))
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

    def _resize_png(self, payload: bytes) -> tuple[bytes, int, int]:
        """REAL pixel path: decode via the repo codec, nearest-neighbor
        resample to PNG_THUMB², re-encode. The source index for thumbnail
        pixel (y, x) is (y*h//T, x*w//T) — closed-form, so the downstream
        oracle can reproduce every thumbnail pixel in SQL. Target is
        PNG_THUMB (not the fake-path TARGET): thumbnails should be no
        larger than these ≤14-px sources, and the SQL twin explodes one
        row per thumbnail pixel, so the oracle budget stays O(64·c)/doc."""
        from osmwaterwayextractor_ray.functions.png import decode_png, encode_png

        px = decode_png(payload)
        h, w = px.shape[:2]
        iy = (np.arange(PNG_THUMB, dtype=np.int64) * h) // PNG_THUMB
        ix = (np.arange(PNG_THUMB, dtype=np.int64) * w) // PNG_THUMB
        thumb = px[iy][:, ix]
        return encode_png(thumb, filter_mode=2), PNG_THUMB, PNG_THUMB

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        out, ws, hs = [], [], []
        for p, mt in zip(payloads, mtypes):
            if mt == "image/fake":
                b, w, h = self._resize_stub(p or b"")
            elif mt == "image/png":
                b, w, h = self._resize_png(p or b"")
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


def _phash_png(payload: bytes) -> int:
    """REAL-pixel perceptual hash: decode via the repo codec, integer
    grayscale (channel sum // channels), nearest-neighbor resample to
    8×8, bit i = (cell > integer mean of the 64 cells). All-integer, so
    bit-identical across hosts; a one-pixel perturbation moves at most
    the few cells that sample it — hamming behaves perceptually."""
    from osmwaterwayextractor_ray.functions.png import decode_png

    px = decode_png(payload).astype(np.int64)
    h, w, c = px.shape
    gray = px.sum(axis=2) // c
    iy = (np.arange(8, dtype=np.int64) * h) // 8
    ix = (np.arange(8, dtype=np.int64) * w) // 8
    cells = gray[iy][:, ix].ravel()
    bits = cells > (int(cells.sum()) // 64)
    out = 0
    for i in range(64):
        if bits[i]:
            out |= 1 << i
    return out


class MediaPHasher:
    """Actor-pool stage: decode (repo PNG codec for 'image/png', stub for
    the synthetic type — the multimodal convention) + perceptual
    fingerprint per payload."""

    def __init__(self):
        self._pil_image = _probe_pil()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        hs = np.empty(len(payloads), dtype=np.uint64)
        for i, (p, mt) in enumerate(zip(payloads, mtypes)):
            if mt == "image/fake":
                hs[i] = _phash_stub(p or b"")
            elif mt == "image/png":
                hs[i] = _phash_png(p or b"")
            else:
                raise NotImplementedError(
                    f"no perceptual hash for media type {mt!r} here"
                )
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


# ---------------------------------------------------------------------------
# real-PNG pixel paths (VERDICT r4 #6) — from-scratch stdlib codec
# ---------------------------------------------------------------------------

PNG_THUMB = 8  # thumbnail edge for the real-pixel resize path

# Synthetic-corpus dimension/pixel formulas. Closed-form in doc_id so the
# SQL oracle can reproduce every decoded pixel:
#   w = 8 + doc_id % 5           (8..12)
#   h = 8 + doc_id % 7           (8..14)
#   c = (1, 3, 4)[doc_id % 3]    (grey / RGB / RGBA)
#   flat pixel g in [0, w*h*c):  v = (doc_id*7 + g*13) % 256
_PNG_CH = (1, 3, 4)


def _png_dims(doc_id: int) -> tuple[int, int, int]:
    return 8 + doc_id % 5, 8 + doc_id % 7, _PNG_CH[doc_id % 3]


def media_from_documents_png(sf_dir: str):
    """Synthesize a REAL encoded-PNG payload column keyed by the documents
    table: per-row dimensions/channels/pixels are closed-form in doc_id
    (formulas above), encoded through the repo codec with scanline filter
    doc_id % 5 — so across any ≥5 rows every PNG filter type is exercised
    on the distributed decode path, and every downstream pixel statistic
    has an exact SQL twin."""
    from osmwaterwayextractor_ray.functions.png import encode_png

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_png(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = []
        for did in ids.tolist():
            w, h, c = _png_dims(did)
            g = np.arange(w * h * c, dtype=np.int64)
            px = ((did * 7 + g * 13) % 256).astype(np.uint8).reshape(h, w, c)
            payloads.append(encode_png(px, filter_mode=did % 5))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "media_type": pa.array(["image/png"] * len(payloads), type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return ds.map_batches(to_png, batch_format="pyarrow")


class PNGPixelStats:
    """Actor-pool stage: REAL decode (repo codec) -> integer pixel
    statistics. Separate from MediaFeatureExtractor so the legacy
    golden-pinned feature schema stays untouched while the oracle query
    checks actual decoded pixels (width/height/channels from the IHDR the
    decoder parsed, px_sum over the defiltered scanlines)."""

    def __init__(self):
        from osmwaterwayextractor_ray.functions.png import decode_png

        self._decode = decode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        ws, hs, cs, sums = [], [], [], []
        for p in payloads:
            px = self._decode(p)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            cs.append(px.shape[2])
            sums.append(int(px.astype(np.int64).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "channels": pa.array(cs, type=pa.int64()),
                "px_sum": pa.array(sums, type=pa.int64()),
            }
        )


def media_png_features(sf_dir: str):
    """Real-PNG decode pipeline: encode (filter cycling over doc_id % 5)
    -> actor-pool decode -> per-image integer pixel stats. Every value is
    reproduced exactly by MEDIA_PNG_FEATURES_SQL from the closed-form
    pixel formula, so a hash-match here certifies the full encode ->
    shuffle -> defilter -> stats path bit-for-bit."""
    media = media_from_documents_png(sf_dir)
    return media.map_batches(
        PNGPixelStats,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, pool_max()),
    )


MEDIA_PNG_FEATURES_SQL = """
WITH dims AS (
  SELECT doc_id,
         8 + doc_id % 5 AS w,
         8 + doc_id % 7 AS h,
         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c
  FROM documents
), px AS (
  SELECT doc_id, w, h, c, unnest(range(0, w*h*c)) AS g FROM dims
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(c AS BIGINT) AS channels,
       CAST(sum((doc_id*7 + g*13) % 256) AS BIGINT) AS px_sum
FROM px GROUP BY doc_id, w, h, c
"""


def media_png_resize(sf_dir: str):
    """Real-PNG thumbnail pipeline: encode -> MediaResizer (repo-codec
    decode, nearest-neighbor PNG_THUMB² resample, RE-encode with filter 2)
    -> a second decode stage summing the thumbnail pixels. The re-encoded
    payload is itself decoded downstream, so BOTH codec directions run
    distributed; thumb_px_sum has an exact SQL twin because the
    nearest-neighbor source index is closed-form ((y*h//T, x*w//T))."""
    media = media_from_documents_png(sf_dir)
    resized = media.map_batches(
        MediaResizer,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, pool_max()),
    )

    def thumb_stats(batch: pa.Table) -> pa.Table:
        from osmwaterwayextractor_ray.functions.png import decode_png

        payloads = batch.column("payload").to_pylist()
        sums, cs = [], []
        for p in payloads:
            px = decode_png(p)
            cs.append(px.shape[2])
            sums.append(int(px.astype(np.int64).sum()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": batch["width"],
                "height": batch["height"],
                "channels": pa.array(cs, type=pa.int64()),
                "thumb_px_sum": pa.array(sums, type=pa.int64()),
            }
        )

    return resized.map_batches(thumb_stats, batch_format="pyarrow")


MEDIA_PNG_RESIZE_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         8 + doc_id % 5 AS w,
         8 + doc_id % 7 AS h,
         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c
  FROM documents
), px AS (
  -- one row per THUMBNAIL pixel g; recover (y, x, ch), map to the
  -- nearest-neighbor source pixel, then the closed-form source value
  SELECT doc_id, w, h, c, unnest(range(0, {PNG_THUMB * PNG_THUMB}*c)) AS g FROM dims
)
SELECT doc_id,
       CAST({PNG_THUMB} AS BIGINT) AS width,
       CAST({PNG_THUMB} AS BIGINT) AS height,
       CAST(c AS BIGINT) AS channels,
       CAST(sum(
         (doc_id*7
          + ((((g // ({PNG_THUMB}*c)) * h // {PNG_THUMB}) * w
              + ((g % ({PNG_THUMB}*c)) // c) * w // {PNG_THUMB}) * c
             + g % c) * 13
         ) % 256
       ) AS BIGINT) AS thumb_px_sum
FROM px GROUP BY doc_id, c
"""


def _png_with_planted_copies(sf_dir: str):
    """media_from_documents_png ∪ planted near-copies: for every
    doc_id % 10 == 0, an exact byte-copy (doc_id + 1_000_000 — hamming 0
    by construction) and a one-pixel ±1 perturbation re-encoded with a
    DIFFERENT scanline filter (doc_id + 2_000_000 — perceptually near but
    byte-distinct, so only a real decode can see the similarity)."""
    from osmwaterwayextractor_ray.functions.png import decode_png, encode_png

    media = media_from_documents_png(sf_dir)

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id = list(ids)
        out_p = list(payloads)
        for did, p in zip(ids.tolist(), payloads):
            if did % 10:
                continue
            out_id.append(did + 1_000_000)
            out_p.append(p)
            px = decode_png(p)
            px[0, 0, 0] ^= 0x01
            out_id.append(did + 2_000_000)
            out_p.append(encode_png(px, filter_mode=(did + 1) % 5))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "media_type": pa.array(["image/png"] * len(out_id), type=pa.string()),
                "payload": pa.array(out_p, type=pa.binary()),
            }
        )

    return media.map_batches(plant, batch_format="pyarrow")


def media_png_phash_neardup(sf_dir: str, max_hamming: int = 3):
    """media_phash_neardup over REAL pixels: repo-codec decode -> integer
    grayscale -> 8×8 perceptual hash per payload (actor pool), then the
    exact hamming <= 3 self-join via `fastagg.hamming_selfjoin`. The
    planted exact copies land at hamming 0; the one-pixel perturbations
    are byte-distinct (different scanline filter) yet perceptually
    adjacent — findable only through the decode. No SQL twin (defilter +
    popcount are not SQL-expressible); pinned by the brute-force O(n²)
    reference and planted positives in tests/test_multimodal_png.py."""
    from osmwaterwayextractor_ray.stages.fastagg import hamming_selfjoin
    from osmwaterwayextractor_ray.stages.pin import pin

    media = _png_with_planted_copies(sf_dir)
    prints = pin(
        media.map_batches(
            MediaPHasher,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, pool_max()),
        ),
        "media_png_phash_prints",
    )
    pairs = hamming_selfjoin(prints, "doc_id", "phash", max_hamming)
    return pairs.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "hamming"]),
        batch_format="pyarrow",
    )
