"""Source-format smokes (SURVEY §2.1 unnamed rows): CSV point ingest
(the reference's actual input format — KMeansTool.java parsed text
lines into Feature POJOs [PK]) and a streaming rate source."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_csv_point_ingest_roundtrip(spark):
    """Write (id, x, y) points as CSV text lines, read them back with
    an explicit schema, and verify values — the reference's ingest
    path expressed as a declarative scan."""
    from flink_streaming_kmeans_spark.sources.loader import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    pts = e.select(
        F.col("vec_id").alias("id"),
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    d = tempfile.mkdtemp(prefix="fsk_csv_")
    try:
        pts.write.option("header", True).csv(d + "/pts")
        back = spark.read.option("header", True).schema(
            "id bigint, x double, y double"
        ).csv(d + "/pts")
        assert back.count() == 500
        orig = {r.id: (r.x, r.y) for r in pts.collect()}
        got = {r.id: (r.x, r.y) for r in back.collect()}
        assert set(got) == set(orig)
        vid = min(orig)
        assert abs(got[vid][0] - orig[vid][0]) < 1e-9
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_rate_source(spark):
    """rate-micro-batch source: deterministic rows per micro-batch."""
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "10")
        .load()
    )
    got: list = []
    q = (
        stream.writeStream.foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline and len(got) < 20:
            time.sleep(1)
    finally:
        q.stop()
    assert len(got) >= 20  # at least two full micro-batches
    assert {c for c in ("timestamp", "value")} <= set(got[0].asDict())
