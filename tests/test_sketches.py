"""Structural properties of the portable (hash-verifiable) sketches
in plans/sketches.py, beyond the DuckDB parity the driver checks:
the one-sided error guarantees each sketch type promises, and that
the HLL register file actually estimates the cardinality it claims
to summarize (the float estimate lives here, test-tier, because the
registry's determinism rules keep it out of hash queries).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import SF_SMOKE

import pytest

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini



def test_cms_estimate_never_undercounts(spark, registry):
    """Count-Min's guarantee is one-sided: est >= true for every key
    (a counter only ever absorbs OTHER keys' mass)."""
    queries, _ = registry
    rows = queries["q_sketch_cms"](spark, SF_SMOKE).collect()
    assert rows, "no event types in smoke data"
    assert all(r.est_n >= r.true_n for r in rows)


def test_bloom_no_false_negatives(spark, registry):
    """A Bloom filter may say yes wrongly, never no wrongly: every
    true member must have bloom_hit=1."""
    queries, _ = registry
    rows = queries["q_sketch_bloom"](spark, SF_SMOKE).collect()
    members = [r for r in rows if r.is_member == 1]
    assert members, "member set empty — threshold too high for smoke SF"
    assert all(r.bloom_hit == 1 for r in members)
    # And the filter must be informative, not saturated: at smoke SF
    # the bit occupancy is ~5%, so the vast majority of non-members
    # must get a definitive no.
    non = [r for r in rows if r.is_member == 0]
    rejected = sum(1 for r in non if r.bloom_hit == 0)
    assert rejected >= 0.9 * len(non)


def test_hll_registers_estimate_cardinality(spark, registry):
    """Recompute the HLL estimate from the register file on the
    driver (harmonic mean + small-range linear counting) and compare
    to the exact distinct user_id count: within 15% (m=256 gives
    ~6.5% standard error)."""
    queries, _ = registry
    regs = {r.bucket: r.max_rank for r in
            queries["q_sketch_hll"](spark, SF_SMOKE).collect()}
    assert all(0 <= b < 256 for b in regs)
    assert all(1 <= rk <= 53 for rk in regs.values())

    m = 256
    ranks = [regs.get(b, 0) for b in range(m)]
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / sum(2.0 ** (-r) for r in ranks)
    zeros = ranks.count(0)
    est = m * math.log(m / zeros) if (raw < 2.5 * m and zeros) else raw

    from flink_streaming_kmeans_spark.sources.loader import load_table

    exact = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    assert abs(est - exact) <= 0.15 * exact, (est, exact)


def test_agg_approx_cd_estimates_cardinality(spark, registry):
    """The hash-tier q_agg_approx_cd (portable integer-exact HLL
    estimate, r6) must actually estimate: per returnflag, within 15%
    of the exact distinct l_partkey count (m=256 -> ~6.5% sigma).
    And the NATIVE approx_count_distinct — the test-tier twin the
    hash row replaced (its sketch differs from DuckDB's, so it can
    never be a hash query) — must agree with the exact count within
    its own documented default error (rsd 5% -> allow 15%)."""
    from flink_streaming_kmeans_spark.sources.loader import load_table

    queries, _ = registry
    ours = {
        r.l_returnflag: r.approx_parts
        for r in queries["q_agg_approx_cd"](spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    native = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(ours) == set(exact)
    for flag, n in exact.items():
        assert abs(ours[flag] - n) <= 0.15 * n, (flag, ours[flag], n)
        assert abs(native[flag] - n) <= 0.15 * n, (flag, native[flag], n)


def test_agg_approx_cd_small_range_regime(spark, registry, tmp_path):
    """Degenerate regime for the portable HLL estimate: with ONE
    distinct key per group the raw estimator would answer ~184
    (alpha*m^2/S with 255 empty registers) — the linear-counting
    branch must fire and answer exactly round(256*ln(256/255)) = 1.
    A 10-distinct group must likewise land near 10 (LC error at this
    occupancy is sub-1%). This is exactly the regime clean driver
    data never enters (sf0.01 has 2000 distinct parts per flag)."""
    rows = [("A", 42, 1.0) for _ in range(50)] + [
        ("R", k, 1.0) for k in range(10) for _ in range(3)
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_partkey bigint, l_extendedprice double"
    )
    sf = str(tmp_path / "cd_sf")
    df.coalesce(1).write.parquet(f"{sf}/lineitem.parquet")

    queries, _ = registry
    got = {
        r.l_returnflag: r.approx_parts
        for r in queries["q_agg_approx_cd"](spark, sf).collect()
    }
    assert got["A"] == 1
    assert 8 <= got["R"] <= 12


def test_sketch_state_is_bounded(spark, registry):
    """The scale contract: sketch outputs are O(sketch), not O(N) —
    CMS cells <= depth*width cells behind <= |keys| output rows, the
    HLL register file <= 256 rows regardless of event count."""
    queries, _ = registry
    assert queries["q_sketch_hll"](spark, SF_SMOKE).count() <= 256


def test_quantile_sketch_brackets_exact_percentiles(spark, registry):
    """The histogram estimate's [lo, hi] bin bounds must bracket the
    exact (lower) percentile — the bin width IS the error bound, so
    an estimate outside its own bin would mean the cumulative logic
    is wrong, not just imprecise."""
    import math

    from flink_streaming_kmeans_spark.sources.loader import load_table

    queries, _ = registry
    rows = {r.p: (r.lo, r.hi) for r in
            queries["q_sketch_quantile"](spark, SF_SMOKE).collect()}
    vals = sorted(
        r.n_chars
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("n_chars")
        .collect()
    )
    assert set(rows) == {50, 90, 95, 99}
    for p, (lo, hi) in rows.items():
        exact = vals[math.ceil(p * len(vals) / 100) - 1]
        assert lo <= exact <= hi, (p, lo, exact, hi)


def test_streaming_sketch_state_is_split_invariant(spark, registry, tmp_path):
    """The algebraic claim behind q_stream_hll/q_stream_quantile:
    sketch state merges the same whatever the micro-batch split is.
    Replay the same rows split by HASH (not time) through the same
    complete-mode aggregate shape and compare to the batch sketch."""
    import os

    from flink_streaming_kmeans_spark.sources.loader import load_table
    from flink_streaming_kmeans_spark.sources.replay import (
        batch_input_dir,
        run_available_now,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events").select("user_id")
    hv = F.expr(
        "CAST(conv(substr(md5(cast(user_id as string)), 1, 15), 16, 10) AS BIGINT)"
    )

    def registers(df):
        br = df.select(hv.alias("hv")).select(
            (F.col("hv") % 256).cast("int").alias("bucket"),
            F.expr("hv div 256").alias("v"),
        )
        rank = F.when(F.col("v") == 0, F.lit(53)).otherwise(
            F.lit(53) - F.length(F.expr("bin(v)"))
        )
        return br.groupBy("bucket").agg(F.max(rank).cast("int").alias("max_rank"))

    batch = {r.bucket: r.max_rank for r in registers(ev).collect()}

    d = str(tmp_path / "hash_split")
    os.makedirs(d)
    in_dir = batch_input_dir(
        ev.withColumn("bno", (F.col("user_id") % 3).cast("int")), d, range(3)
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    run_available_now(
        registers(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hash_split_regs"),
        "split_invariance",
        spark,
    )
    streamed = {
        r.bucket: r.max_rank for r in spark.table("hash_split_regs").collect()
    }
    assert streamed == batch


def test_quantile_sketch_bracket_law_over_random_distributions(
    spark, registry, tmp_path
):
    """Property: for ANY integer distribution — constant (mx == mn,
    the width-1 edge), skewed, tiny, two-point bimodal — every
    percentile estimate's [lo, hi] bracket contains the exact lower
    percentile. Exercises the binning + cumulative + probe logic far
    from the smoke data's shape."""
    import math
    import random

    cases = []
    rng = random.Random(11)
    cases.append([7] * 23)  # constant: every bracket must be [7, 7]
    cases.append([1])  # single row
    cases.append([0, 10000])  # extreme two-point spread
    cases.append([rng.randint(0, 50) for _ in range(199)])  # small domain
    cases.append(
        [int(1.5 ** rng.randint(0, 20)) for _ in range(150)]
    )  # heavy right skew
    queries, _ = registry

    for ci, vals in enumerate(cases):
        df = spark.createDataFrame(
            [(i, "x", "en", "t", v) for i, v in enumerate(vals)],
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        )
        sf = str(tmp_path / f"qdist_{ci}")
        df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
        rows = {r.p: (r.lo, r.hi) for r in
                queries["q_sketch_quantile"](spark, sf).collect()}
        svals = sorted(vals)
        assert set(rows) == {50, 90, 95, 99}, (ci, rows)
        for p, (lo, hi) in rows.items():
            exact = svals[math.ceil(p * len(svals) / 100) - 1]
            assert lo <= exact <= hi, (ci, p, lo, exact, hi)


def test_cms_collisions_forced_by_wide_keyspace(spark, registry, tmp_path):
    """500 distinct keys through a 64-column CMS FORCES collisions:
    the one-sided law (est >= true) must survive them, and at least
    one key must actually show est > true — otherwise the sketch
    isn't being exercised past the injective regime the 5-type smoke
    data stays in."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
         i % 100, f"type_{i % 500}", 1.0, "{}")
        for i in range(3000)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    sf = str(tmp_path / "cms_wide")
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")
    queries, _ = registry
    out = queries["q_sketch_cms"](spark, sf).collect()
    assert len(out) == 500
    assert all(r.est_n >= r.true_n for r in out)
    assert any(r.est_n > r.true_n for r in out), "no collision exercised"


def test_hll_registers_ignore_multiplicity(spark, registry, tmp_path):
    """Cardinality sketch law: duplicating every row 3x must leave
    the register file bit-identical (max of identical hash ranks)."""
    from flink_streaming_kmeans_spark.sources.loader import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    tripled = ev.unionAll(ev).unionAll(ev)
    base_sf = str(tmp_path / "hll_base")
    trip_sf = str(tmp_path / "hll_trip")
    ev.coalesce(1).write.parquet(f"{base_sf}/events.parquet")
    tripled.coalesce(2).write.parquet(f"{trip_sf}/events.parquet")

    queries, _ = registry
    a = {r.bucket: r.max_rank for r in queries["q_sketch_hll"](spark, base_sf).collect()}
    b = {r.bucket: r.max_rank for r in queries["q_sketch_hll"](spark, trip_sf).collect()}
    assert a == b
