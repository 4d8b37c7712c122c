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

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])

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