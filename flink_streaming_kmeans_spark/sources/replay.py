"""Micro-batch replay scaffolding for the streaming evidence drives.

Every streaming drive (plans/streams.py, plans/ml.py q_kmeans_stream,
plans/training.py q_stream_tumble, tool.py --stream) replays a bounded
table as a sequence of parquet files consumed by a FileStreamSource
with maxFilesPerTrigger=1. Two invariants make that a faithful drive:

- one FILE per logical batch, so each trigger is exactly one batch;
- monotone mtimes in delivery order, which pins the FileStreamSource
  processing order (it sorts by modification time).

This module is the single implementation of that scaffolding (it was
once copy-pasted per drive) plus the shared availableNow runner with
the fail-loudly timeout (r4 ADVICE: an ignored awaitTermination
boolean silently returns partial state) and the scoped state-partition
sizing (session.scoped_shuffle_partitions).
"""

from __future__ import annotations

import os
import shutil
import threading
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..session import scoped_shuffle_partitions

# Serializes the conf-scoped streaming-drive region across threads on
# one session — see run_available_now's CONCURRENCY note (r13 close).
_DRIVE_LOCK = threading.RLock()


def replay_batch_count(n: int) -> int:
    """The drive's micro-batch count, overridable by the
    ``SPARK_GRAFT_STREAM_BATCHES`` env var (sweep scaffolding).

    Every registered streaming drive's OUTPUT is contractually
    invariant to how the bounded input is split into micro-batches —
    that's what makes the hash oracle a batch-semantics statement
    rather than a replay transcript. This knob lets a sweep re-run the
    drives at 1/2/5/7 batches and assert exactly that (the
    batch-boundary analogue of the 5-vs-32 reducer sweep).

    Call sites MUST route the count through this helper BEFORE both
    the split and any ``append_batch`` sentinel index — a hidden
    override inside the split would leave the caller appending its
    sentinel at the UN-overridden index, silently overwriting a real
    batch file. Callers still clamp to their row count afterward
    (ntile leaves empty trailing batches the replay prep rejects).
    Unset (the default, incl. driver/bench runs) this is the identity.
    """
    v = os.environ.get("SPARK_GRAFT_STREAM_BATCHES")
    return n if not v else max(1, int(v))


def time_batch_col(
    df: DataFrame, n_batches: int, order_cols: Sequence[str] = ("ts", "event_id")
) -> DataFrame:
    """Add a ``bno`` column splitting df into n_batches CONTIGUOUS
    ranges of order_cols order — so event-time watermarks advance
    monotonically across batches and never late-drop (the
    q_stream_tumble lesson, r4 ADVICE). Drive-side scaffolding: the
    single-partition ntile sort is over the bounded evidence table,
    not a production path.

    NULLS LAST (not Spark's ASC default of NULLS FIRST): batch-fold
    order must concatenate to the GLOBAL sequence order the batch
    oracles use, and both engines' sequence aggregates put NULL sort
    keys last — a NULL-ts event split into batch 0 replayed q_stream_
    cep's NFA out of oracle order (NULL-events sweep, r6). Windowed
    drives drop NULL event times either way, so this pin only affects
    sequence-order consumers."""
    return df.withColumn(
        "bno",
        F.ntile(n_batches).over(
            W.orderBy(*[F.asc_nulls_last(F.col(c)) for c in order_cols])
        )
        - 1,
    )


def batch_input_dir(
    df: DataFrame, d: str, sequence: Sequence[int], bno_col: str = "bno"
) -> str:
    """Write one parquet file per entry of ``sequence`` under d/in.

    ``df`` carries an integer batch-number column ``bno_col``; each
    sequence entry names the batch whose rows that file holds, and a
    REPEATED entry re-delivers the same batch (the at-least-once
    replay the reassignment drive exercises). The write is a single
    partitionBy pass (the per-batch filter-and-write loop this
    replaces re-sorted the input once per batch); partitionBy drops
    bno_col from the data files, so the file schema equals
    df-minus-bno. Batch order is pinned by monotone mtimes. A batch
    named in ``sequence`` but holding no rows is an error — silently
    skipping a file would shift every later trigger.

    The stage is hash-repartitioned on bno_col (r13, guide §2.6): each
    bno value lands in exactly ONE shuffle partition, so every batch
    dir still gets exactly one parquet file (the replay invariant),
    but the n batch files compress and write in PARALLEL instead of
    through the old coalesce(1) single task — measured 1.06 → 0.74 s
    warm on the 200k-row events stage. Hash-by-column is
    deterministic under task retry (guide §2.5; no round-robin).
    """
    staged = os.path.join(d, "staged")
    n_batches = max(1, len(set(sequence)))
    df.repartition(n_batches, bno_col).write.mode("overwrite").partitionBy(
        bno_col
    ).parquet(staged)
    in_dir = os.path.join(d, "in")
    os.makedirs(in_dir, exist_ok=True)
    for k, b in enumerate(sequence):
        pdir = os.path.join(staged, f"{bno_col}={b}")
        if not os.path.isdir(pdir):
            raise ValueError(f"batch {b} of {bno_col} produced no rows")
        src = next(
            f for f in sorted(os.listdir(pdir)) if f.endswith(".parquet")
        )
        dst = os.path.join(in_dir, f"batch-{k:05d}.parquet")
        shutil.copy(os.path.join(pdir, src), dst)
        os.utime(dst, (1_000_000_000 + k, 1_000_000_000 + k))
    return in_dir


def stage_time_batches(
    df: DataFrame,
    d: str,
    target: int,
    order_cols: Sequence[str] = ("ts", "event_id"),
    bno_col: str = "bno",
) -> tuple[str, int]:
    """Stage up to ``target`` contiguous-order micro-batch files under
    d/in and return ``(in_dir, n_actual)``.

    Replaces the pre-staging ``limit(b).count()`` probe job (r13,
    guide §1.5 — one driver job per drive, and for q_stream_upsert a
    partial evaluation of the whole merge-source join+agg): the clamp
    the probe computed falls out of the staging write itself.
    ``ntile(b)`` over r < b rows fills buckets 1..r with one row each
    and leaves the rest EMPTY, so the staged partition dirs are
    exactly the contiguous prefix 0..min(b,r)-1 and ``n_actual`` is
    their count; an empty ``df`` stages zero dirs → ``(in_dir, 0)``
    and the caller returns its typed empty frame exactly as it did on
    a zero probe count. Anything non-contiguous would mean the ntile
    invariant broke — fail loudly, never renumber (a silently shifted
    batch file re-orders every later trigger).

    Only for plain ``range(n)`` replays: sentinel-appending drives
    (session / slide / left-outer join) need the row count BEFORE the
    append index and keep their stats-job path; re-delivery sequences
    (the reassignment drive) name batches explicitly via
    :func:`batch_input_dir`. The sweep override
    (``SPARK_GRAFT_STREAM_BATCHES``) is honored here, before the
    split, per the replay_batch_count contract."""
    b = replay_batch_count(target)
    staged = os.path.join(d, "staged")
    # TIMESTAMP_MICROS for the staged files, scoped to this write:
    # Spark's default parquet timestamp output is deprecated INT96,
    # which carries NO footer min/max — staged_footer_stats would
    # always fall back to the agg job it exists to remove. INT64 µs
    # round-trips bit-identically through the replay read (explicit
    # schema either way) and is the modern format every lake writer
    # uses; scoping keeps the rest of the engine's writes untouched.
    spark = df.sparkSession
    _ts_key = "spark.sql.parquet.outputTimestampType"
    _saved_ts = spark.conf.get(_ts_key, "INT96")
    spark.conf.set(_ts_key, "TIMESTAMP_MICROS")
    try:
        time_batch_col(df, b, order_cols).repartition(b, bno_col).write.mode(
            "overwrite"
        ).partitionBy(bno_col).parquet(staged)
    finally:
        spark.conf.set(_ts_key, _saved_ts)
    present = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(staged)
        if name.startswith(f"{bno_col}=")
    )
    if present != list(range(len(present))):
        raise ValueError(
            f"staged batches are not a contiguous prefix: {present}"
        )
    in_dir = os.path.join(d, "in")
    os.makedirs(in_dir, exist_ok=True)
    for k in present:
        pdir = os.path.join(staged, f"{bno_col}={k}")
        src = next(
            f for f in sorted(os.listdir(pdir)) if f.endswith(".parquet")
        )
        dst = os.path.join(in_dir, f"batch-{k:05d}.parquet")
        shutil.copy(os.path.join(pdir, src), dst)
        os.utime(dst, (1_000_000_000 + k, 1_000_000_000 + k))
    return in_dir, len(present)


def staged_footer_stats(in_dir: str, col: str):
    """``(total_rows, col_min, col_max)`` straight from the staged
    batch files' parquet FOOTERS — zero Spark jobs (r13, guide §6/§1.5;
    the same footer-stats surface the lakehouse manifest records via
    operators/lakehouse._file_stats). Replaces the pre-drive
    ``agg(max, count).collect()`` stats job for the sentinel-appending
    drives: the staged files are Spark-written from the already
    loaded/filtered frame, so a timestamp column is physical
    timestamp(us) (tz-aware on read-back here — the loader's
    ns-vs-us variance never reaches staged files) and integer stats
    are exact. Statistics exclude NULLs, matching MIN/MAX semantics;
    the callers stage NULL-free columns anyway (ts_valid /
    isNotNull-gated frames). Returns ``(rows, None, None)`` when any
    file lacks exact min/max for ``col`` — callers must fall back to
    the agg job, never guess."""
    import pyarrow.parquet as pq

    total = 0
    lo = hi = None
    ok = True
    for f in sorted(os.listdir(in_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(in_dir, f)).metadata
        total += md.num_rows
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col not in idx:
            ok = False
            continue
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx[col]).statistics
            if s is None or not s.has_min_max:
                ok = False
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
    if not ok:
        return total, None, None
    return total, lo, hi


def run_available_now(
    writer,
    name: str,
    spark=None,
    partitions: int = 4,
    timeout: int = 300,
    final_no_data_batch: bool = True,
    ensure_eviction: bool = False,
):
    """Start an availableNow streaming query and fail loudly on
    timeout instead of returning partial state.

    ``partitions``: every state-store commit writes one delta file
    PER STORE PER PARTITION per trigger (a stream-stream join keeps 4
    stores per partition), so drives whose triggers are state-commit-
    dominated (the r13 per-trigger decomposition: q_stream_join
    620-1200 ms commit of a 600-770 ms addBatch) pass 2; drives whose
    triggers carry real per-batch compute keep 4 — the r13 interleaved
    A/B measured parts=2 WORSE for those (q_stream_session 3.0→3.5 s,
    q_stream_hll 1.7→1.9 s: halving task parallelism cost more than
    the saved commits). Load-sized, not code-sized — see
    session.scoped_shuffle_partitions; output is partition-count
    invariant (the 5-vs-32 reducer sweep + SPARK_GRAFT_STREAM_BATCHES
    sweeps assert exactly that).

    ``final_no_data_batch=False`` scopes
    ``spark.sql.streaming.noDataMicroBatches.enabled=false`` around
    the run (restored after). The final no-data micro-batch exists to
    run watermark-driven state eviction/emission after the last data
    batch; drives whose sink output is already complete by then (an
    inner interval join and first-sight dedup emit eagerly on match;
    an update-mode foreachBatch emits every state change on its data
    batch) pay a full trigger — plan + state commit + offset/commit
    log writes, 0.4-0.7 s measured — for a batch that provably emits
    nothing. APPEND-mode finalization drives (session / slide /
    left-outer join) MUST keep the default: their tail rows emit only
    on that final eviction.

    SPARK_GRAFT_STREAM_TIMEOUT overrides the cap for fixtures whose
    OUTPUT is legitimately huge (the adversarial-skew rung's hot-user
    interval join emits quadratically many pairs in per-key density —
    correct semantics, more wall time); the default stays 300 s so
    drive hangs still fail loudly everywhere else.

    When ``spark`` is given, the query starts (creating its
    state-store layout) under a scoped shuffle-partition count sized
    for these bounded drives — see session.scoped_shuffle_partitions
    for the measurement and the production-sizing note.

    ``ensure_eviction=True`` (the APPEND-finalization drives: session /
    slide / left-outer join, whose tail rows emit ONLY in the final
    watermark-eviction no-data batch): after a successful termination,
    verify from ``recentProgress`` that a zero-input batch actually
    ran; if the engine concluded the availableNow run straight after
    the last data batch (observed once in ~10⁴ full-suite drives —
    the r13 close's [1-q_stream_session] flake, 943/946 rows with
    exactly the last-2.5h session tail missing, unreproducible in 30
    isolated runs), RESTART the writer once from the same checkpoint:
    the restarted query sees no new files and runs precisely the
    pending eviction batch — the engine's own checkpoint-resume path
    (pinned by tests/test_streaming.py::
    test_filesink_checkpoint_resume_equals_single_run), so the
    append-sink contents equal the single-run answer exactly. Free in
    the normal case (one progress-list read); never valid together
    with ``final_no_data_batch=False``. The probe is sound for these
    drives because their replay NEVER delivers an empty data batch
    (stage_time_batches raises on one; sentinel batches carry rows),
    so last-progress ``numInputRows == 0`` ⟺ the eviction batch ran.

    CONCURRENCY (r13 close, found by the round-close full suite via
    the multi-tenant contract test's q_stream_tumble self-pair): the
    shuffle-partition scope and the no-data-batch scope are SESSION-
    GLOBAL conf flips with save/restore. Two drives on one session
    from two threads race them — T1 saves "true"/32 and sets
    "false"/2, T2 then SAVES T1's scoped value as its own baseline,
    and whichever restores last can leave the scoped value stuck
    session-wide. The shuffle-partition variant of this race is as
    old as the scoping (r5) but output-invisible (every drive is
    partition-count invariant); the r13 no-data scope made it
    output-VISIBLE — a leaked ``false`` deterministically drops the
    append-finalization drives' tail (session 943/946 rows, exactly
    the eviction set; reproduced by forcing the conf). Fix: one
    module-level RLock serializes the conf-scoped region (flip →
    start → awaitTermination → restore). Concurrent streaming drives
    on one session serialize; batch work is untouched; a same-thread
    re-entry cannot deadlock (RLock). That is the honest multi-tenant
    posture: session-global knobs demand session-level mutual
    exclusion, and the drives' correctness must never depend on a
    racy conf window — ``ensure_eviction`` below stays as the
    independent belt for engine-side termination races.

    Returns the TERMINATED StreamingQuery so callers (the single-scan
    plan pin in tests/test_streaming.py, r9 verdict task 4) can read
    executed-run evidence — ``recentProgress[*].sources`` is one entry
    per physical streaming source the run actually scanned, which is
    stronger than any pre-start plan inspection."""
    import contextlib

    if ensure_eviction and not final_no_data_batch:
        raise ValueError(
            f"{name}: ensure_eviction requires the final no-data batch"
        )
    scope = (
        scoped_shuffle_partitions(spark, partitions)
        if spark is not None
        else contextlib.nullcontext()
    )
    t_env = os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT")
    if t_env:
        timeout = max(1, int(t_env))
    ndb_key = "spark.sql.streaming.noDataMicroBatches.enabled"

    def _await(query):
        if not query.awaitTermination(timeout):
            query.stop()
            raise RuntimeError(
                f"{name}: streaming query exceeded {timeout} s"
            )

    def _eviction_ran(query) -> bool:
        try:
            progress = query.recentProgress
        except Exception:
            return True  # cannot inspect — do not loop on a guess
        if not progress:
            return True  # zero triggers: empty replay, nothing to evict
        last = progress[-1]
        return int(last.get("numInputRows", 0)) == 0

    # The whole conf-scoped region — flip, start, await, restore —
    # runs under the module lock (docstring CONCURRENCY note).
    with _DRIVE_LOCK:
        saved_ndb = None
        if spark is not None and not final_no_data_batch:
            saved_ndb = spark.conf.get(ndb_key, "true")
            spark.conf.set(ndb_key, "false")
        try:
            with scope:
                q = writer.trigger(availableNow=True).start()
                _await(q)
                if ensure_eviction and not _eviction_ran(q):
                    q = writer.trigger(availableNow=True).start()
                    _await(q)
                return q
        finally:
            if saved_ndb is not None:
                spark.conf.set(ndb_key, saved_ndb)


def append_batch(df: DataFrame, in_dir: str, k: int) -> str:
    """Append one more micro-batch file AFTER a batch_input_dir
    sequence — the sentinel watermark-driver batches the session/
    outer-join drives need. Writes ``df`` as one parquet file named
    batch-{k:05d} with the next monotone mtime.

    Exists because the obvious alternative — unioning the sentinel
    rows into the main frame before the partitionBy write — was
    measured 8x slower (100k-row staged write 1.1 s -> 8.2 s at
    sf0.1): the union of a local-relation frame into the windowed
    branch defeats the single-pass plan. Writing the 2-row sentinel
    frames separately costs milliseconds."""
    stage = os.path.join(in_dir, f"_sent_stage_{k}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    f = next(x for x in sorted(os.listdir(stage)) if x.endswith(".parquet"))
    dst = os.path.join(in_dir, f"batch-{k:05d}.parquet")
    shutil.move(os.path.join(stage, f), dst)
    shutil.rmtree(stage, ignore_errors=True)
    os.utime(dst, (1_000_000_000 + k, 1_000_000_000 + k))
    return dst


def memory_sink_name(prefix: str, d: str) -> str:
    """A valid single-part memory-sink queryName derived from a tmp
    dir (dots/dashes in sf-suffixed paths are not identifier chars)."""
    return prefix + "".join(
        ch if ch.isalnum() else "_" for ch in os.path.basename(d)
    )
