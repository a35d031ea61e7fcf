"""Edge cases for operators/asof.asof_join (the hand-built primitive
behind q_join_asof — SURVEY §7 hard-part 3)."""

from __future__ import annotations

import datetime as dt

from flink_streaming_kmeans_spark.operators.asof import asof_join

import pytest

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini



def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_basic_most_recent_prior(spark):
    left = _mk(spark, [(1, _ts(10), "L1"), (1, _ts(30), "L2")], "k int, ts timestamp, lv string")
    right = _mk(
        spark,
        [(1, _ts(5), 100.0), (1, _ts(20), 200.0), (1, _ts(40), 300.0)],
        "k int, ts timestamp, rv double",
    )
    out = {
        r.lv: r.rv
        for r in asof_join(left, right, "k", "ts", ["rv"]).collect()
    }
    assert out == {"L1": 100.0, "L2": 200.0}


def test_no_prior_row_gives_nulls(spark):
    left = _mk(spark, [(1, _ts(1), "early")], "k int, ts timestamp, lv string")
    right = _mk(spark, [(1, _ts(5), 1.0)], "k int, ts timestamp, rv double")
    [row] = asof_join(left, right, "k", "ts", ["rv"]).collect()
    assert row.rv is None


def test_equal_timestamp_is_inclusive(spark):
    left = _mk(spark, [(1, _ts(10), "L")], "k int, ts timestamp, lv string")
    right = _mk(spark, [(1, _ts(10), 7.0)], "k int, ts timestamp, rv double")
    [row] = asof_join(left, right, "k", "ts", ["rv"]).collect()
    assert row.rv == 7.0


def test_keys_do_not_leak(spark):
    left = _mk(spark, [(1, _ts(10), "a"), (2, _ts(10), "b")], "k int, ts timestamp, lv string")
    right = _mk(spark, [(1, _ts(5), 1.0)], "k int, ts timestamp, rv double")
    out = {r.lv: r.rv for r in asof_join(left, right, "k", "ts", ["rv"]).collect()}
    assert out == {"a": 1.0, "b": None}


def test_null_key_and_null_ts_follow_join_semantics(spark):
    """SQL join semantics for NULLs (r7 composed sweep; operators/
    asof.py docstring): a NULL-key or NULL-ts right row matches
    NOTHING, and a NULL-key or NULL-ts left row is kept with NULL
    payload — in BOTH directions. The window formulation would
    otherwise group NULL keys into a real partition (backward) or
    let a NULLS-FIRST NULL-ts probe see every right row (forward)."""
    left = _mk(
        spark,
        [
            (None, _ts(10), "null-key"),
            (1, None, "null-ts"),
            (None, None, "null-both"),
            (1, _ts(10), "ok"),
        ],
        "k int, ts timestamp, lv string",
    )
    right = _mk(
        spark,
        [
            (None, _ts(5), 111.0),   # NULL key: matches nothing
            (1, None, 222.0),        # NULL ts: matches nothing
            (1, _ts(5), 333.0),      # the only matchable row
        ],
        "k int, ts timestamp, rv double",
    )
    for direction, want_ok in (("backward", 333.0), ("forward", None)):
        out = {
            r.lv: r.rv
            for r in asof_join(
                left, right, "k", "ts", ["rv"], direction=direction
            ).collect()
        }
        assert out["null-key"] is None, (direction, out)
        assert out["null-ts"] is None, (direction, out)
        assert out["null-both"] is None, (direction, out)
        assert out["ok"] == want_ok, (direction, out)
    # forward sanity: the probe at ts=5 DOES match the ts=5 right row
    fwd = asof_join(
        _mk(spark, [(1, _ts(5), "p")], "k int, ts timestamp, lv string"),
        right, "k", "ts", ["rv"], direction="forward",
    ).collect()
    assert fwd[0].rv == 333.0


def test_null_payload_not_backfilled(spark):
    """The struct-packing fix: a matched right row with a genuine NULL
    in one payload column must NOT have that column filled from an
    older right row."""
    left = _mk(spark, [(1, _ts(30), "L")], "k int, ts timestamp, lv string")
    right = _mk(
        spark,
        [(1, _ts(10), 1.0, "old"), (1, _ts(20), None, "new")],
        "k int, ts timestamp, rv double, tag string",
    )
    [row] = asof_join(left, right, "k", "ts", ["rv", "tag"]).collect()
    assert row.tag == "new"
    assert row.rv is None, "rv was back-filled from the older right row"


def test_randomized_against_bruteforce(spark):
    """Property-style check: asof_join == per-row brute-force argmax
    over random keyed data (fixed seed, 3 trials)."""
    import random

    for seed in (7, 13, 99):
        rng = random.Random(seed)
        left = [
            (rng.randint(1, 5), _ts(rng.randint(0, 50)), f"L{i}")
            for i in range(40)
        ]
        # unique (key, ts) right rows — the asof tie contract
        seen = set()
        right = []
        for i in range(40):
            k, s = rng.randint(1, 5), rng.randint(0, 50)
            if (k, s) not in seen:
                seen.add((k, s))
                right.append((k, _ts(s), float(i)))
        ldf = _mk(spark, left, "k int, ts timestamp, lv string")
        rdf = _mk(spark, right, "k int, ts timestamp, rv double")
        got = {
            r.lv: r.rv
            for r in asof_join(ldf, rdf, "k", "ts", ["rv"]).collect()
        }
        for k, ts, lv in left:
            cands = [(rts, rv) for rk, rts, rv in right if rk == k and rts <= ts]
            want = max(cands)[1] if cands else None
            assert got[lv] == want, (seed, lv, got[lv], want)


def test_randomized_with_nulls_against_bruteforce(spark):
    """The randomized brute-force pin EXTENDED with NULL keys and NULL
    timestamps on both sides (r7 composed-sweep contract): SQL join
    semantics — a NULL never equals and never compares, so NULL-key/
    NULL-ts right rows match nothing and NULL-key/NULL-ts left rows
    carry NULL payload, in both directions."""
    import random

    for seed in (21, 34):
        rng = random.Random(seed)

        def nk():
            return None if rng.random() < 0.2 else rng.randint(1, 4)

        def nt():
            return None if rng.random() < 0.2 else rng.randint(0, 40)

        left = [(nk(), (lambda s: None if s is None else _ts(s))(nt()), f"L{i}")
                for i in range(40)]
        seen = set()
        right = []
        for i in range(40):
            k, s = nk(), nt()
            if (k, s) not in seen:
                seen.add((k, s))
                right.append((k, None if s is None else _ts(s), float(i)))
        ldf = _mk(spark, left, "k int, ts timestamp, lv string")
        rdf = _mk(spark, right, "k int, ts timestamp, rv double")
        for direction in ("backward", "forward"):
            got = {
                r.lv: r.rv
                for r in asof_join(
                    ldf, rdf, "k", "ts", ["rv"], direction=direction
                ).collect()
            }
            for k, ts, lv in left:
                if k is None or ts is None:
                    want = None
                else:
                    cands = [
                        (rts, rv)
                        for rk, rts, rv in right
                        if rk == k and rts is not None
                        and (rts <= ts if direction == "backward" else rts >= ts)
                    ]
                    if not cands:
                        want = None
                    elif direction == "backward":
                        want = max(cands)[1]
                    else:
                        want = min(cands)[1]
                assert got[lv] == want, (seed, direction, lv, got[lv], want)


def test_forward_basic_next_at_or_after(spark):
    left = _mk(spark, [(1, _ts(10), "L1"), (1, _ts(30), "L2")], "k int, ts timestamp, lv string")
    right = _mk(
        spark,
        [(1, _ts(5), 100.0), (1, _ts(20), 200.0), (1, _ts(40), 300.0)],
        "k int, ts timestamp, rv double",
    )
    out = {
        r.lv: r.rv
        for r in asof_join(left, right, "k", "ts", ["rv"], direction="forward").collect()
    }
    assert out == {"L1": 200.0, "L2": 300.0}


def test_forward_equal_timestamp_is_inclusive(spark):
    left = _mk(spark, [(1, _ts(10), "L")], "k int, ts timestamp, lv string")
    right = _mk(spark, [(1, _ts(10), 7.0)], "k int, ts timestamp, rv double")
    [row] = asof_join(left, right, "k", "ts", ["rv"], direction="forward").collect()
    assert row.rv == 7.0


def test_forward_no_later_row_gives_nulls(spark):
    left = _mk(spark, [(1, _ts(50), "late")], "k int, ts timestamp, lv string")
    right = _mk(spark, [(1, _ts(5), 1.0)], "k int, ts timestamp, rv double")
    [row] = asof_join(left, right, "k", "ts", ["rv"], direction="forward").collect()
    assert row.rv is None


def test_forward_randomized_against_bruteforce(spark):
    """forward asof_join == per-row brute-force argmin over ts >= l.ts."""
    import random

    for seed in (7, 13, 99):
        rng = random.Random(seed)
        left = [
            (rng.randint(1, 5), _ts(rng.randint(0, 50)), f"L{i}")
            for i in range(40)
        ]
        seen = set()
        right = []
        for i in range(40):
            k, s = rng.randint(1, 5), rng.randint(0, 50)
            if (k, s) not in seen:
                seen.add((k, s))
                right.append((k, _ts(s), float(i)))
        ldf = _mk(spark, left, "k int, ts timestamp, lv string")
        rdf = _mk(spark, right, "k int, ts timestamp, rv double")
        got = {
            r.lv: r.rv
            for r in asof_join(
                ldf, rdf, "k", "ts", ["rv"], direction="forward"
            ).collect()
        }
        for k, ts, lv in left:
            cands = [(rts, rv) for rk, rts, rv in right if rk == k and rts >= ts]
            want = min(cands)[1] if cands else None
            assert got[lv] == want, (seed, lv, got[lv], want)


def test_asof_tol_randomized_against_bruteforce(spark, registry, tmp_path):
    """q_join_asof_tol only had oracle parity; brute-force it: the
    nearest prior click within the 3-day window, else NULLs — over
    random events spanning ~10 days so many nearest-priors fall
    OUTSIDE the window (the discard-not-replace semantics)."""
    import random

    rng = random.Random(5)
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    events = []
    for uid in range(1, 16):
        for _ in range(rng.randint(0, 14)):
            t = base + dt.timedelta(minutes=rng.randint(0, 14400))  # 10 days
            typ = rng.choice(["click", "purchase", "view"])
            events.append((eid, t, uid, typ))
            eid += 1
    df = spark.createDataFrame(
        [(e, t, u, ty, 1.5, "{}") for e, t, u, ty in events],
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    sf = str(tmp_path / "asof_tol_rand")
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")

    queries, _ = registry
    got = {
        r.event_id: r.click_id
        for r in queries["q_join_asof_tol"](spark, sf).collect()
    }

    tol = dt.timedelta(days=3)
    clicks = [(e, t, u) for e, t, u, ty in events if ty == "click"]
    want = {}
    for e, t, u, ty in events:
        if ty != "purchase":
            continue
        cands = [(ct, ce) for ce, ct, cu in clicks if cu == u and ct <= t]
        if cands:
            best_t, _ = max(cands)
            # the asof tie contract: among equal-ts clicks, max click_id
            best_e = max(ce for ct, ce in cands if ct == best_t)
            want[e] = best_e if t - best_t <= tol else None
        else:
            want[e] = None
    assert got == want
