"""As-of join — Spark has no native primitive; this is the scalable one.

Semantics: for every left row, attach the single right row with the
greatest ``right.on <= left.on`` within the same equi-key (the
"most recent prior" row), LEFT-join style (no match → nulls).

Implementation (union + running ``last(ignorenulls)`` window), NOT a
pairwise theta join:

- Pack the right payload columns into ONE struct, tag right rows 0 and
  left rows 1, union, and take ``last(struct, ignorenulls=True)`` over
  a window partitioned by key, ordered by (on, tag), rows
  unbounded-preceding..current. Right rows sort before left rows at
  equal ``on``, which yields the inclusive (<=) match. The struct is
  the fix for composite-row corruption: filling each payload column
  independently would back-fill a genuine NULL in one column from an
  OLDER right row; the struct keeps all payload columns from the same
  matched row, preserving its NULLs.
- Cost: ONE shuffle of |L|+|R| rows on the key + a per-key sort.
  A theta join is |L|×|R| per key — quadratic, dead at 100 TB. This
  shape is exactly a sort-merge join's partitioning, and AQE's skew
  splitting applies to the shuffle.

Ties on (key, on) among right rows must be resolved by the caller
(dedupe to one right row per (key, on)) or the matched row depends on
input order — q_join_asof in plans/joins.py dedupes explicitly.

NULL keys and NULL timestamps follow SQL JOIN semantics (r7 composed
NULL-key x extreme-ts sweep): a NULL never equals anything and a NULL
comparison is UNKNOWN, so a right row with a NULL key or NULL ``on``
matches NOTHING, and a left row with a NULL key or NULL ``on`` is
kept with NULL payload. The window formulation does NOT give this for
free — partitionBy groups NULL keys into a real partition (so NULL-key
purchases silently "matched" NULL-key clicks, diverging from DuckDB's
ASOF equi-join), and in the forward direction a NULL-``on`` left row
sorts NULLS-FIRST into a frame containing every right row. Stated
explicitly: right rows are pre-filtered, and the matched struct is
masked NULL unless the left row's key and ``on`` are both non-NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    on: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. ``payload`` = right columns to carry onto left
    rows. Left and right must both expose ``key`` and ``on`` columns;
    payload column names must not collide with left's columns.

    ``direction``: "backward" (default) matches the greatest
    ``right.on <= left.on``; "forward" matches the smallest
    ``right.on >= left.on`` (the "next scheduled event" lookup). The
    forward case is the mirror image: left rows sort BEFORE right
    rows at equal ``on`` (so an equal-timestamp right row is inside
    the frame) and the fill is ``first(ignorenulls)`` over
    current..unbounded-following. Cost is identical — the same ONE
    |L|+|R| shuffle on the key."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    # The union tagging claims _p/_tag as working columns; a left frame
    # that already has either would be silently overwritten by
    # withColumn (review r6) — fail as loudly as a bad direction.
    clash = {"_p", "_tag"} & set(left.columns)
    if clash:
        raise ValueError(
            f"left columns {sorted(clash)} collide with asof_join's "
            "internal working columns; rename them before joining"
        )
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)
    lcols = left.columns
    # SQL join semantics: a right row with a NULL key or NULL `on`
    # can match nothing — drop it before the union (see module
    # docstring; the window would otherwise hand it to the NULL-key
    # partition's left rows).
    right = right.where(F.col(key).isNotNull() & F.col(on).isNotNull())
    r_packed = right.select(key, on, F.struct(*payload).alias("_p"))
    p_type = r_packed.schema["_p"].dataType

    l_tagged = (
        left.withColumn("_p", F.lit(None).cast(p_type))
        .withColumn("_tag", F.lit(l_tag))
    )
    r_tagged = r_packed.select(
        key,
        on,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (key, on)
        ],
        "_p",
    ).withColumn("_tag", F.lit(r_tag))

    unioned = l_tagged.unionByName(r_tagged)
    base = W.partitionBy(key).orderBy(F.col(on).asc(), F.col("_tag").asc())
    if direction == "backward":
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        fill = F.last("_p", ignorenulls=True)
    else:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        fill = F.first("_p", ignorenulls=True)
    filled = unioned.select(
        *lcols,
        "_tag",
        # A left row with a NULL key or NULL `on` matches nothing
        # (comparison UNKNOWN): mask the fill. Without this, a forward
        # NULL-`on` left row sorts NULLS-FIRST into a frame containing
        # every right row of its key and "matches" the earliest one.
        F.when(
            F.col(key).isNotNull() & F.col(on).isNotNull(),
            fill.over(w),
        ).alias("_p"),
    )
    matched = filled.where(F.col("_tag") == l_tag)
    return matched.select(
        *lcols, *[F.col(f"_p.{p}").alias(p) for p in payload]
    )


def clicks_and_purchases(ev, with_click_ts: bool = False):
    """Shared prep for the as-of evidence family (q_join_asof /
    q_join_asof_fwd / q_join_asof_tol — this block was once
    copy-pasted per query, review r6): click rows deduped to ONE per
    (user_id, ts) with the HIGHEST event_id winning (the asof_join
    tie contract), plus the purchase probe side. ``with_click_ts``
    adds the matched right timestamp to the payload (the tolerance
    variant's window test needs it)."""
    sel = [F.col("user_id"), F.col("ts")]
    if with_click_ts:
        sel.append(F.col("ts").alias("click_ts"))
    sel += [
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    ]
    clicks = ev.where(F.col("event_type") == "click").select(*sel)
    dedup_w = W.partitionBy("user_id", "ts").orderBy(F.desc("click_id"))
    clicks1 = (
        clicks.withColumn("rn", F.row_number().over(dedup_w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return clicks1, purchases
