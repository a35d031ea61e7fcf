"""SURVEY §2.4/§2.8 test-tier behaviors: Datasketches HLL aggregation
(sketch build, union, estimate) and map columns derived from JSON.

These are test-tier because sketches are engine-specific binary blobs
(no DuckDB hash oracle is possible) and MapType round-trips aren't part
of the driver's hash comparison; correctness is asserted against exact
counts computed in the same session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _events(spark):
    from flink_streaming_kmeans_spark.sources.loader import load_table

    return load_table(spark, SF_SMOKE, "events")


def test_hll_sketch_estimate_close_to_exact(spark):
    """hll_sketch_agg + hll_sketch_estimate per event_type: the HLL
    estimate must sit within 5% of the exact distinct count (standard
    error for the default lgK=12 is ~0.8%)."""
    ev = _events(spark)
    est = (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert len(est) == 5
    for r in est:
        assert abs(r.est - r.exact) <= max(2, 0.05 * r.exact), r


def test_hll_sketch_union_matches_global(spark):
    """Sketches built per-group then unioned estimate the GLOBAL
    distinct count — the mergeability property that makes HLL the
    100 TB path (partial aggregation without a distinct shuffle)."""
    ev = _events(spark)
    per_group = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]
    exact = ev.select("user_id").distinct().count()
    assert abs(merged.est - exact) <= max(2, 0.05 * exact)


def test_from_json_map_column(spark):
    """props JSON → MapType column: map_keys / element_at semantics and
    agreement with get_json_object extraction."""
    ev = _events(spark)
    m = ev.select(
        "event_id",
        F.from_json("props", "map<string,bigint>").alias("pm"),
        F.get_json_object("props", "$.k").cast("long").alias("k_str"),
    )
    rows = m.select(
        "event_id",
        F.map_keys("pm").alias("keys"),
        F.element_at("pm", "k").alias("k_map"),
        "k_str",
    ).collect()
    assert rows, "no events loaded"
    for r in rows:
        assert r.keys == ["k"], r
        assert r.k_map == r.k_str, r


def test_map_entries_roundtrip(spark):
    """map → entries array → map again is identity (map_from_entries ∘
    map_entries == id) — the reshaping primitive for nested pipelines."""
    ev = _events(spark)
    chk = (
        ev.select(F.from_json("props", "map<string,bigint>").alias("pm"))
        .select(
            F.map_entries("pm").alias("e1"),
            F.map_entries(F.map_from_entries(F.map_entries("pm"))).alias("e2"),
        )
        # MapType has no ordering/equality in Spark; compare entry arrays
        .where(F.col("e1") != F.col("e2"))
        .count()
    )
    assert chk == 0
