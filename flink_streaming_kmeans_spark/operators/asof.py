"""As-of join — Spark has no native primitive; this is the scalable one.

Semantics: for every left row, attach the single right row with the
greatest ``right.on <= left.on`` within the same equi-key (the
"most recent prior" row), LEFT-join style (no match → nulls).

Implementation (union + running ``last(ignorenulls)`` window), NOT a
pairwise theta join:

- Tag right rows 0 and left rows 1, union them, and compute
  ``last(<right payload>, ignorenulls=True)`` over a window partitioned
  by key, ordered by (on, tag), rows unbounded-preceding..current.
  Right rows sort before left rows at equal ``on``, which yields the
  inclusive (<=) match.
- Cost: ONE shuffle of |L|+|R| rows on the key + a per-key sort.
  A theta join is |L|×|R| per key — quadratic, dead at 100 TB. This
  shape survives: it is exactly a sort-merge join's partitioning, and
  AQE's skew splitting applies to the shuffle.

Ties on (key, on) among right rows must be resolved by the caller
(dedupe to one right row per (key, on)) or the result depends on input
order — callers in plans/events.py do this explicitly.
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
) -> DataFrame:
    """Left as-of join. ``payload`` = right columns to carry onto left rows.

    Left and right must both expose ``key`` and ``on`` columns; payload
    column names must not collide with left's columns.
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols, *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload]
    ).withColumn("_tag", F.lit(1))
    r_tagged = (
        right.select(
            key,
            on,
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key, on)],
            *payload,
        )
        .select(*lcols, *payload)
        .withColumn("_tag", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(key)
        .orderBy(F.col(on).asc(), F.col("_tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "_tag",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return filled.where(F.col("_tag") == 1).drop("_tag")
