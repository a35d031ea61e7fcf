"""Multimodal binary-column operators: frame sampling + resize.

Together with plans/textops.py's q_multimodal_binary (decode +
feature-extract), this completes the four verbs a multimodal
training-data pipeline runs over opaque binary columns: decode,
feature-extract, resize, frame-sample.

The container has no image/audio/video codecs, so the DECODE step is
stubbed two ways (SURVEY §2.10 ground rule):

- real mimes (image/*, video/*, audio/*) raise NotImplementedError —
  the honest stub;
- the synthetic ``fake/raw-gray`` / ``fake/raw-video`` mimes interpret
  the blob deterministically (raw W×H gray bytes; fixed-size frame
  chunks) so the SPARK-SIDE plumbing — schema, Arrow batching,
  partition parallelism, UDF signatures, output shapes — is real and
  testable end to end.

Scale shape: both operators are narrow mapInPandas passes — no
shuffle; blobs stay in executor Arrow buffers; parallelism = input
partition count (fan_out applies on single-file local inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FAKE_GRAY = "fake/raw-gray"
_FAKE_VIDEO = "fake/raw-video"


def frame_sample(media: DataFrame, frame_bytes: int, every_k: int) -> DataFrame:
    """Sample every k-th fixed-size frame from a binary video column.

    Input columns:  (media_id bigint, blob binary, mime string)
    Output columns: (media_id bigint, frame_idx int, frame binary)

    ``fake/raw-video`` blobs are a concatenation of ``frame_bytes``-byte
    frames (trailing partial frame dropped, as a real demuxer would);
    real video mimes raise NotImplementedError (no codecs here).
    """

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob, mime in zip(pdf["media_id"], pdf["blob"], pdf["mime"]):
                if mime != _FAKE_VIDEO:
                    raise NotImplementedError(f"no demuxer for {mime}")
                b = bytes(blob)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, every_k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(
        fn, "media_id bigint, frame_idx int, frame binary"
    )


def resize_gray(media: DataFrame, src_w: int, src_h: int, dst_w: int, dst_h: int) -> DataFrame:
    """Nearest-neighbor resize of raw W×H 8-bit gray images.

    Input columns:  (media_id bigint, blob binary, mime string)
    Output columns: (media_id bigint, blob binary, n_bytes bigint)

    ``fake/raw-gray`` blobs are row-major src_h×src_w bytes; real image
    mimes raise NotImplementedError. Nearest-neighbor with floor index
    mapping — fully deterministic, numpy-vectorized per Arrow batch.
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        ys = (np.arange(dst_h) * src_h) // dst_h
        xs = (np.arange(dst_w) * src_w) // dst_w
        for pdf in batches:
            ids, blobs, sizes = [], [], []
            for mid, blob, mime in zip(pdf["media_id"], pdf["blob"], pdf["mime"]):
                if mime != _FAKE_GRAY:
                    raise NotImplementedError(f"no decoder for {mime}")
                img = np.frombuffer(bytes(blob), dtype=np.uint8)[: src_h * src_w]
                img = img.reshape(src_h, src_w)
                out = img[np.ix_(ys, xs)].tobytes()
                ids.append(mid)
                blobs.append(out)
                sizes.append(len(out))
            yield pd.DataFrame(
                {"media_id": ids, "blob": blobs, "n_bytes": sizes}
            )

    return media.mapInPandas(fn, "media_id bigint, blob binary, n_bytes bigint")
