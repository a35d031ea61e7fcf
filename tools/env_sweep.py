"""Driver-environment invariance sweep: full-registry hash stability
under perturbed host timezone and JVM locale.

The config sweep perturbs Spark's EXECUTION machinery; this perturbs
the machinery UNDER the machinery — the process environment both
engines inherit from whatever box the driver happens to run on:

- ``tz_newyork`` / ``tz_tokyo`` — JVM default timezone (via
  ``java.util.TimeZone.setDefault`` over py4j, which in local mode
  covers driver AND executor code), Python ``TZ`` + ``tzset()``, and
  the DuckDB session ``TimeZone``, set to a west-of-UTC and an
  east-of-UTC zone. The engine pins ``spark.sql.session.timeZone=UTC``
  (session.py) and the oracles never use timestamptz — this sweep is
  the empirical proof those pins actually reach every operator
  (parquet timestamp rebase, CSV/JSON timestamp parsing, window
  bucketing, date_trunc, Arrow exchange all consult SOME timezone).
- ``locale_turkish`` — JVM default locale tr-TR: the classic dotted/
  dotless-i trap (``"i".toUpperCase()`` → ``"İ"`` under tr-TR for any
  code path that forgets ``Locale.ROOT``), plus locale-sensitive
  number formatting in anything that stringifies doubles.
- ``tz_locale_cross`` — both at once.

Anchor: the canonical DuckDB hashes computed ONCE under the default
(UTC) environment. Under each regime BOTH engines re-run and BOTH
must still hash to the canonical value — so a drift in either engine
(or an agreeing-but-shifted drift in both) fails loudly.

Why it matters at 100 TB: a fleet's driver and executors run wherever
the scheduler puts them; ops do not re-image boxes to UTC for one
job. A result that depends on the host zone or locale is a
nondeterministic production bug of the worst kind (it reproduces only
in one region's datacenter).

Usage: python tools/env_sweep.py [sf_dir] [regime ...] [--queries q1,q2]
Defaults: sf_dir=/root/testdata/sf0.001, all regimes, all hash
queries. Exits nonzero on any failure.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from oracle import _canon_rows, make_duckdb  # noqa: E402

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402

REGIMES: dict[str, dict] = {
    "tz_newyork": {"tz": "America/New_York", "locale": None},
    "tz_tokyo": {"tz": "Asia/Tokyo", "locale": None},
    # Fractional offsets: +5:30 and +12:45 — any code path assuming
    # whole-hour zone offsets (window alignment, hour bucketing)
    # survives the whole-hour regimes above but not these.
    "tz_kolkata": {"tz": "Asia/Kolkata", "locale": None},
    "tz_chatham": {"tz": "Pacific/Chatham", "locale": None},
    "locale_turkish": {"tz": None, "locale": ("tr", "TR")},
    "tz_locale_cross": {"tz": "America/New_York", "locale": ("tr", "TR")},
}


class perturb_env:
    """Install a (timezone, locale) pair into the live JVM and the
    Python process; restore both on exit. ``TimeZone.setDefault`` is
    process-wide, so in local mode this perturbs executor threads too
    — exactly the blast radius a mis-imaged cluster box would have."""

    def __init__(self, spark, tz: str | None, locale: tuple[str, str] | None):
        self.spark = spark
        self.tz = tz
        self.locale = locale

    def __enter__(self):
        jvm = self.spark._jvm
        self._old_jtz = jvm.java.util.TimeZone.getDefault()
        self._old_jloc = jvm.java.util.Locale.getDefault()
        self._old_py_tz = os.environ.get("TZ")
        if self.tz:
            jvm.java.util.TimeZone.setDefault(
                jvm.java.util.TimeZone.getTimeZone(self.tz)
            )
            os.environ["TZ"] = self.tz
            time.tzset()
        if self.locale:
            jvm.java.util.Locale.setDefault(jvm.java.util.Locale(*self.locale))
        return self

    def __exit__(self, *exc):
        jvm = self.spark._jvm
        jvm.java.util.TimeZone.setDefault(self._old_jtz)
        jvm.java.util.Locale.setDefault(self._old_jloc)
        if self._old_py_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = self._old_py_tz
        time.tzset()
        return False


def duck_hash(con, sql: str) -> tuple:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    n, cols_sorted, h, _ = _canon_rows(cols, res.fetchall())
    return n, cols_sorted, h


def regime_duckdb(sf_dir: str, tz: str | None):
    """Fresh oracle connection with its session TimeZone set to the
    regime zone (falls back with a warning if the ICU extension is
    unavailable — the JVM/Python perturbation still runs)."""
    con = make_duckdb(sf_dir)
    if tz:
        try:
            con.execute(f"SET TimeZone='{tz}'")
        except Exception as e:
            print(f"  note: DuckDB TimeZone set failed ({e}); oracle stays UTC")
    return con


def main() -> int:
    args = sys.argv[1:]
    only: list[str] | None = None
    if "--queries" in args:
        i = args.index("--queries")
        only = args[i + 1].split(",")
        del args[i : i + 2]
    dirs = [a for a in args if os.sep in a or os.path.isdir(a)]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.001"
    picked = [a for a in args if a not in dirs]
    unknown_regimes = [r for r in picked if r not in REGIMES]
    if unknown_regimes:
        print(f"ERROR: unknown regimes: {unknown_regimes}", file=sys.stderr)
        return 2
    regimes = picked or list(REGIMES)

    queries, oracles = collect()
    todo = only if only else sorted(oracles)  # hash tier only: the anchor is a hash
    unknown = [q for q in todo if q not in oracles]
    if unknown:
        print(f"ERROR: unknown/rows-tier queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("env_sweep")

    # Canonical anchors under the default (UTC) environment.
    con0 = make_duckdb(sf_dir)
    canon: dict[str, tuple] = {}
    t0 = time.time()
    for name in todo:
        canon[name] = duck_hash(con0, oracles[name])
    con0.close()
    print(f"canonical oracle hashes: {len(canon)} queries ({time.time()-t0:.1f}s)")

    failed: list[str] = []
    for regime in regimes:
        spec = REGIMES[regime]
        print(f"\n== regime {regime} (tz={spec['tz']} locale={spec['locale']}) ==")
        bad = 0
        t0 = time.time()
        with perturb_env(spark, spec["tz"], spec["locale"]):
            con = regime_duckdb(sf_dir, spec["tz"])
            for name in todo:
                c_n, c_cols, c_h = canon[name]
                probs = []
                try:
                    sdf = queries[name](spark, sf_dir)
                    s_n, s_cols, s_h, _ = _canon_rows(
                        list(sdf.columns), [tuple(r) for r in sdf.collect()]
                    )
                    if (s_n, s_cols, s_h) != (c_n, c_cols, c_h):
                        probs.append(
                            f"spark rows {s_n}/{c_n} cols_eq={s_cols == c_cols}"
                            f" hash_eq={s_h == c_h}"
                        )
                except Exception as e:
                    probs.append(f"spark ERROR {type(e).__name__}: {e}")
                try:
                    if duck_hash(con, oracles[name]) != canon[name]:
                        probs.append("duckdb hash drifted from its own UTC run")
                except Exception as e:
                    probs.append(f"duckdb ERROR {type(e).__name__}: {e}")
                if probs:
                    bad += 1
                    failed.append(f"{regime}:{name}")
                    print(f"{name}: FAIL  " + "; ".join(probs))
            con.close()
        print(
            f"regime {regime}: {len(todo)-bad}/{len(todo)} invariant"
            f" ({time.time()-t0:.1f}s)"
        )

    print(f"\n{'CLEAN' if not failed else 'FAILURES: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
