"""q_evt_funnel ordering semantics on hand-built histories — the
cases the random fixture can't prove intentional: stage N only counts
when strictly AFTER stage N-1's first occurrence.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _funnel_on(spark, rows):
    """Run the funnel pipeline (same composition as q_evt_funnel) on a
    synthetic events frame."""
    ev = spark.createDataFrame(
        [
            (i, ts, uid, et, 1.0, "{}")
            for i, (uid, et, ts) in enumerate(rows)
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t0")
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    out = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return {
        r.user_id: (r.t0 is not None, r.t1 is not None, r.t2 is not None)
        for r in out.collect()
    }


def T(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_ordering_rules(spark):
    rows = [
        # user 1: clean view -> click -> purchase
        (1, "view", T(0)), (1, "click", T(1)), (1, "purchase", T(2)),
        # user 2: purchase BEFORE first view — stage stops at view
        (2, "purchase", T(0)), (2, "view", T(1)),
        # user 3: click before view, click again after — second click counts
        (3, "click", T(0)), (3, "view", T(1)), (3, "click", T(2)),
        # user 4: click only, no view — not in the funnel at all
        (4, "click", T(0)),
        # user 5: view -> click, purchase BETWEEN view and click — purchase
        # precedes the first qualifying click, so stage stops at click
        (5, "view", T(0)), (5, "purchase", T(1)), (5, "click", T(2)),
        # user 6: simultaneous view and click (strict > excludes the tie)
        (6, "view", T(0)), (6, "click", T(0)),
    ]
    got = _funnel_on(spark, rows)
    assert got[1] == (True, True, True)
    assert got[2] == (True, False, False)
    assert got[3] == (True, True, False)
    assert 4 not in got
    assert got[5] == (True, True, False)
    assert got[6] == (True, False, False)
