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


def test_jsonl_corrupt_records_quarantined(spark, tmp_path):
    """PERMISSIVE JSON ingest: malformed lines land in the
    _corrupt_record column instead of failing the job — the resilience
    mode a 100 TB ingest must run in (FAILFAST dies on one bad row in
    a billion; DROPMALFORMED silently loses data — quarantine is the
    only auditable option)."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good row"}\n'
        "not json at all\n"
        '{"doc_id": 2, "text": "also good"}\n'
        '{"doc_id": "NaN-ish", "text": 3}\n'
    )
    df = (
        spark.read.schema(
            "doc_id bigint, text string, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = {r.doc_id: r for r in rows if r._corrupt_record is None}
    assert good[1].text == "good row"
    assert good[2].text == "also good"
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 2, rows
    assert any("not json" in r._corrupt_record for r in bad)


def test_gzip_jsonl_ingest(spark, tmp_path):
    """Training corpora commonly arrive as *.jsonl.gz shards; Spark
    must ingest them transparently (codec from the extension) and the
    result must equal the uncompressed read. Note the 100 TB caveat
    this test documents: gzip is NOT splittable, so one shard = one
    task — shard the corpus into many files (as producers do) or
    recompress to a splittable layout before heavy processing."""
    import gzip
    import json

    rows = [
        {"doc_id": i, "text": f"tok{i} shared text", "n": i * 3}
        for i in range(200)
    ]
    d = tmp_path / "jl"
    d.mkdir()
    # two shards, one plain + one gzipped, same schema
    with open(d / "a.jsonl", "w") as f:
        for r in rows[:100]:
            f.write(json.dumps(r) + "\n")
    with gzip.open(d / "b.jsonl.gz", "wt") as f:
        for r in rows[100:]:
            f.write(json.dumps(r) + "\n")

    df = spark.read.schema("doc_id bigint, text string, n bigint").json(
        str(d)
    )
    got = sorted((r.doc_id, r.text, r.n) for r in df.collect())
    want = sorted((r["doc_id"], r["text"], r["n"]) for r in rows)
    assert got == want


def test_local_df_matches_row_list_semantics(spark):
    """sources/loader.local_df (the Arrow local-relation fast path for
    small driver frames, r6) must be value-identical to the row-list
    createDataFrame it replaces — including the two hazards: NULLs in
    non-float columns ride the Arrow route as real SQL NULLs, and a
    None in a float/double column (which pandas would corrupt to NaN)
    falls back to the row-list path and stays NULL."""
    import datetime as dt

    from flink_streaming_kmeans_spark.sources.loader import local_df

    schema = "a bigint, b string, c timestamp, d double"
    rows = [
        (1, "x", dt.datetime(2024, 1, 1, 12, 0, 0), 1.5),
        (2, None, dt.datetime(2024, 1, 2, 0, 0, 0), 2.25),
        (None, "z", None, 3.0),
    ]
    got = local_df(spark, rows, schema).collect()
    want = spark.createDataFrame(rows, schema).collect()
    assert sorted(got, key=str) == sorted(want, key=str)

    # None in a double column: must be NULL (not NaN) — fallback path.
    nf = local_df(spark, [(1, "x", None, None)], schema).collect()[0]
    assert nf.d is None


def test_csv_null_vs_empty_law(spark):
    """Law 44 pinned directly (q_source_csv's carve-out): CSV cannot
    represent NULL and empty string distinctly under default options
    (both land as NULL on read), an in-band nullValue sentinel
    restores the distinction, and the sentinel's own literal then
    collides — all three facts asserted so an engine-side change in
    any of them fails loudly. Everything else round-trips exactly,
    including NUL bytes, CRLF, embedded quotes/commas and 10 KB
    values."""
    import tempfile

    rows = [
        (1, None),
        (2, ""),
        (3, "x"),
        (4, "\\N"),          # the sentinel's literal
        (5, "nul\x00byte"),
        (6, "crlf\r\nrow"),
        (7, 'q"x,y'),
        (8, "y" * 10000),
    ]
    df = spark.createDataFrame(rows, "k bigint, v string")
    schema = "k bigint, v string"

    # Default options: '' collapses to NULL; all hostile bytes survive.
    d = tempfile.mkdtemp(prefix="csv_law_")
    df.write.mode("overwrite").option("header", True).csv(d + "/dflt")
    back = {
        r.k: r.v
        for r in spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .csv(d + "/dflt")
        .collect()
    }
    assert back[2] is None  # the carve-out
    assert back[1] is None
    assert back[3] == "x" and back[5] == "nul\x00byte"
    assert back[6] == "crlf\r\nrow" and back[7] == 'q"x,y'
    assert back[8] == "y" * 10000

    # Sentinel convention: NULL/'' recovered, literal sentinel collides.
    df.write.mode("overwrite").option("header", True).option(
        "nullValue", "\\N"
    ).option("emptyValue", '""').csv(d + "/sent")
    back = {
        r.k: r.v
        for r in spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .option("nullValue", "\\N")
        .csv(d + "/sent")
        .collect()
    }
    assert back[1] is None and back[2] == "" and back[3] == "x"
    assert back[4] is None  # the collision: literal '\\N' became NULL


def test_events_ts_physical_form_invariance(spark, registry, tmp_path):
    """Regeneration resilience pinned: driver testdata has shipped
    events.ts in THREE parquet physical forms across generations —
    INT64 TIMESTAMP(NANOS) (Spark: bigint under nanosAsLong, loader
    DIV-1000 fixup), timestamp[us] isAdjustedToUTC=true (Spark: ltz,
    no fixup), and timestamp[us] isAdjustedToUTC=false (Spark: ntz,
    loader casts to ltz). loader.load_table normalizes all three to
    TIMESTAMP µs; a representative event-time query must produce
    BITWISE-identical results on identical logical content in each
    form, so the next regeneration cannot silently shift semantics
    (the sweep genre's verify-skill gotcha, now a gate)."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from oracle import _canon_rows, copy_sf_tables

    queries, _ = registry
    src_tab = pq.read_table(f"{SF_SMOKE}/events.parquet")
    i = src_tab.schema.get_field_index("ts")
    base_type = src_tab.schema.field(i).type
    variants = {
        "ns": pa.timestamp("ns"),
        "us_ltz": pa.timestamp("us", tz="UTC"),
        "us_ntz": pa.timestamp("us"),
    }
    hashes = {}
    for tag, ts_type in variants.items():
        d = str(tmp_path / tag)
        sf = copy_sf_tables(SF_SMOKE, d)
        col = src_tab.column("ts")
        cast = col.cast(ts_type) if ts_type != base_type else col
        tab = src_tab.set_column(
            i, pa.field("ts", ts_type), cast
        )
        pq.write_table(tab, os.path.join(sf, "events.parquet"))
        sdf = queries["q_win_tumble"](spark, sf)
        hashes[tag] = _canon_rows(
            list(sdf.columns), [tuple(r) for r in sdf.collect()]
        )[:3]
        shutil.rmtree(d, ignore_errors=True)
    assert hashes["ns"] == hashes["us_ltz"] == hashes["us_ntz"], hashes
    assert hashes["ns"][0] > 0  # non-vacuous


def test_encoding_variant_parity(spark, registry, monkeypatch):
    """Per-commit gate for the storage-encoding axis (SCALE.md r10):
    the full 3x167 sweep is the CLI run (tools/make_encoded_dir.py +
    preflight); this pins a fast representative slice — ALL THREE
    writer regimes (zstd+pagev2, no-dictionary plain encoding,
    1000-row row groups; r10 verdict task 5 closed the zstd gap)
    against consumers spanning the physical forms that matter: events
    (the ns/us timestamp variance), text aggregation, lineitem
    decimals-through-doubles, and embeddings (list<float> columns)."""
    import os

    # syspath_prepend auto-reverts at teardown — a bare sys.path.insert
    # here would let tools/ modules shadow later tests' imports.
    monkeypatch.syspath_prepend(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        )
    )
    from make_encoded_dir import VARIANTS, build

    from oracle import check_parity, make_duckdb

    queries, oracles = registry
    probes = ["q_win_tumble", "q_text_stats", "q_agg_q1", "q_emb_normalize"]
    assert set(VARIANTS) == {"zstd_v2", "gzip_nodict", "tiny_groups"}, (
        "a new writer regime must be added to this per-commit gate too"
    )
    for variant in sorted(VARIANTS):
        d = tempfile.mkdtemp(prefix=f"fsk_enc_{variant}_")
        try:
            build(SF_SMOKE, d, variant)
            con = make_duckdb(d)
            try:
                for name in probes:
                    r = check_parity(
                        spark, con, name, queries[name], oracles[name], d
                    )
                    assert r.ok, f"{variant}/{name}: {r.detail}"
            finally:
                con.close()
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_stage_time_batches_clamp_empty_and_invariants(spark, tmp_path, monkeypatch):
    """The r13 probe-job removal: stage_time_batches must derive the
    batch-count clamp and the empty-source guard from the staging
    write itself — (a) a table with fewer rows than the target stages
    exactly row-count files, a contiguous prefix batch-00000..; (b) an
    empty frame stages zero files and reports 0; (c) each batch is ONE
    parquet file with strictly monotone mtimes (the FileStreamSource
    ordering invariant); (d) the SPARK_GRAFT_STREAM_BATCHES sweep
    override is honored before the split, per the replay_batch_count
    contract."""
    import datetime as dt
    import os

    from flink_streaming_kmeans_spark.sources.replay import (
        stage_time_batches,
    )

    def frame(n):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 1, 0, i, 0), float(i))
                for i in range(n)
            ],
            "event_id bigint, ts timestamp, value double",
        )

    # (a) clamp: 2 rows, target 3 -> 2 contiguous batch files
    d2 = str(tmp_path / "two")
    in_dir, n = stage_time_batches(frame(2), d2, 3)
    files = sorted(f for f in os.listdir(in_dir) if f.endswith(".parquet"))
    assert n == 2 and files == ["batch-00000.parquet", "batch-00001.parquet"]
    mtimes = [os.path.getmtime(os.path.join(in_dir, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    # rows round-trip: union of batch files == the staged frame
    assert spark.read.parquet(in_dir).count() == 2

    # (b) empty source -> zero files, n=0 (the callers' typed-empty path)
    d0 = str(tmp_path / "zero")
    in_dir0, n0 = stage_time_batches(frame(0), d0, 3)
    assert n0 == 0
    assert not [f for f in os.listdir(in_dir0) if f.endswith(".parquet")]

    # (c) normal split: 9 rows, target 3 -> 3 files, one per batch,
    # contiguous TIME ranges (batch k's max ts <= batch k+1's min ts)
    d9 = str(tmp_path / "nine")
    in_dir9, n9 = stage_time_batches(frame(9), d9, 3)
    assert n9 == 3
    spans = []
    for k in range(3):
        p = os.path.join(in_dir9, f"batch-{k:05d}.parquet")
        rows = spark.read.parquet(p).agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        spans.append((rows.lo, rows.hi))
    assert all(spans[k][1] <= spans[k + 1][0] for k in range(2))

    # (d) sweep override routes through replay_batch_count
    monkeypatch.setenv("SPARK_GRAFT_STREAM_BATCHES", "2")
    dov = str(tmp_path / "override")
    _, nov = stage_time_batches(frame(9), dov, 3)
    assert nov == 2
