"""Multimodal binary plumbing (SURVEY §2.10): frame sampling + resize
over opaque binary columns, deterministic fake codecs (no image/video
libs in this container — the stubs raise for real mimes, and the
Spark-side schema/batching/parallelism is what's under test).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_streaming_kmeans_spark.operators.multimodal import (
    frame_sample,
    resize_gray,
)

FRAME = 64  # bytes per fake frame


def _fake_blob(seed: str, n: int) -> bytes:
    """Deterministic pseudo-random bytes: chained md5."""
    out = b""
    cur = seed.encode()
    while len(out) < n:
        cur = hashlib.md5(cur).digest()
        out += cur
    return out[:n]


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, _fake_blob(f"m{i}", FRAME * (10 + i)), "fake/raw-video")
        for i in range(6)
    ]
    return spark.createDataFrame(
        rows, "media_id bigint, blob binary, mime string"
    ).repartition(4)


def test_frame_sample_counts_and_content(media):
    out = frame_sample(media, FRAME, every_k=3).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    for i in range(6):
        n_frames = 10 + i
        want_idx = list(range(0, n_frames, 3))
        got = sorted(by_id[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == want_idx
        blob = _fake_blob(f"m{i}", FRAME * n_frames)
        for r in got:
            assert bytes(r.frame) == blob[r.frame_idx * FRAME : (r.frame_idx + 1) * FRAME]


def test_frame_sample_drops_trailing_partial_frame(spark):
    one = spark.createDataFrame(
        [(0, _fake_blob("x", FRAME * 2 + 10), "fake/raw-video")],
        "media_id bigint, blob binary, mime string",
    )
    idxs = sorted(r.frame_idx for r in frame_sample(one, FRAME, 1).collect())
    assert idxs == [0, 1]  # the 10 trailing bytes are not a frame


def test_resize_gray_shape_and_determinism(spark):
    src_w = src_h = 16
    imgs = spark.createDataFrame(
        [(i, _fake_blob(f"img{i}", src_w * src_h), "fake/raw-gray") for i in range(5)],
        "media_id bigint, blob binary, mime string",
    ).repartition(3)
    out1 = {r.media_id: bytes(r.blob) for r in resize_gray(imgs, src_w, src_h, 4, 4).collect()}
    out2 = {r.media_id: bytes(r.blob) for r in resize_gray(imgs, src_w, src_h, 4, 4).collect()}
    assert out1 == out2  # partitioning/batching must not affect output
    assert all(len(b) == 16 for b in out1.values())
    # nearest-neighbor floor mapping: out[0,0] is src[0,0]
    src0 = _fake_blob("img0", src_w * src_h)
    assert out1[0][0] == src0[0]


def test_real_mimes_are_honest_stubs(spark):
    jpeg = spark.createDataFrame(
        [(0, b"\xff\xd8\xff", "image/jpeg")],
        "media_id bigint, blob binary, mime string",
    )
    with pytest.raises(Exception, match="no decoder for image/jpeg"):
        resize_gray(jpeg, 1, 1, 1, 1).collect()
    with pytest.raises(Exception, match="no demuxer for image/jpeg"):
        frame_sample(jpeg, FRAME, 1).collect()
