"""Resize and frame-sample media stages: payload determinism, chaining,
and the frame-content coverage SQL can't express (the frame-index/byte
plumbing itself is oracle-checked via MEDIA_FRAME_SAMPLE_SQL)."""

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.pipelines.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    MediaResizer,
)

SF = "/root/testdata/sf0.001"


def _media_batch(payloads):
    return pa.table(
        {
            "doc_id": pa.array(range(len(payloads)), type=pa.int64()),
            "media_type": pa.array(["image/fake"] * len(payloads), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def test_resize_stub_deterministic_and_bounded():
    r = MediaResizer()
    payloads = [bytes(range(256)) * 4, b"x" * 10, b""]
    out1 = r(_media_batch(payloads))
    out2 = r(_media_batch(payloads))
    assert out1.equals(out2)
    for i, p in enumerate(payloads):
        thumb = out1.column("payload")[i].as_py()
        assert len(thumb) <= max(1, len(p))  # resize never grows the payload
        assert out1.column("width")[i].as_py() == MediaResizer.TARGET
    # stub thumbnail is a strided subsequence of the source bytes
    src = payloads[0]
    thumb = out1.column("payload")[0].as_py()
    assert bytes(thumb) in bytes(src[:: max(1, len(src) // max(1, len(thumb)))])


def test_frame_sample_covers_payload(ray_session):
    """Sampled frames must tile the payload at the declared stride; the
    reassembled sampled bytes equal the payload's strided frame slices."""
    from osmwaterwayextractor_ray.pipelines.multimodal import (
        media_frame_sample,
        media_from_documents,
    )

    frames = media_frame_sample(SF).to_pandas()
    media = media_from_documents(SF).to_pandas().set_index("doc_id")
    assert (frames["frame_idx"] % FRAME_STRIDE == 0).all()
    for did, g in frames.groupby("doc_id"):
        payload = media.loc[did, "payload"]
        n_frames = max(1, -(-len(payload) // FRAME_BYTES))
        want_idx = np.arange(0, n_frames, FRAME_STRIDE)
        got = g.sort_values("frame_idx")
        assert np.array_equal(got["frame_idx"].to_numpy(), want_idx)
        for fi, nb in zip(got["frame_idx"], got["n_frame_bytes"]):
            assert nb == len(payload[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES])


def test_media_resize_query_runs(ray_session):
    from osmwaterwayextractor_ray.pipelines.multimodal import media_resize

    df = media_resize(SF).to_pandas()
    assert len(df) == 500
    assert (df["width"] == MediaResizer.TARGET).all()
    assert (df["thumb_bytes"] >= 1).all()
