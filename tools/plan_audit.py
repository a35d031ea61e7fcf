"""Physical-plan audit across the whole registry (r7 evidence pass).

For every registered query, builds the DataFrame at the given sf dir
and summarizes the physical plan the way the 100 TB review questions
are phrased: how many Exchanges (shuffles / broadcasts), any
BroadcastNestedLoopJoin / CartesianProduct (quadratic joins), any
row-at-a-time Python (BatchEvalPython — the slow path; Arrow-batched
MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython are the
sanctioned Python surfaces), and the widest parquet ReadSchema (is
column pruning reaching the scan?).

    python tools/plan_audit.py /root/testdata/sf0.01 [query ...]

Prints one line per query plus an EXCEPTIONS section. Documented
exceptions (test_plans.py pins the intent):
- q_join_theta: non-equi self-join on a 25-row dim — BNLJ is the
  right plan at any scale (broadcast side is a dimension).
- q_join_range: the DELIBERATE unbinned range join kept as the
  contrast to q_join_range_binned (its docstring documents the BNLJ
  cost; the binned rewrite is the scale path).
- q_udf_python: the row-at-a-time Python UDF SHOWCASE row (§2.11) —
  exists to prove the surface, not to be a hot path.
- q_join_cross: a 5x5 region cross join (CartesianProduct of two
  broadcastable dims).

Queries that RUN work at build time (streaming drives, lakehouse
seeds) execute it here — the audit reads the FINAL returned frame's
plan, which for sink read-backs is a plain parquet scan by design
(the streaming work happened inside the drive).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_kmeans_spark.plans.registry import collect  # noqa: E402
from flink_streaming_kmeans_spark.session import get_spark  # noqa: E402

# A BroadcastNestedLoopJoin is LINEAR, not quadratic, when the build
# side is bounded by construction — the "attach a scalar/probe frame"
# pattern (crossJoin(F.broadcast(<1-row stats / k centroids / constant
# table>))). Every entry below was verified against its query's source
# (r7 audit); a flag from any (query, flag) pair NOT listed fails the
# audit, so a quadratic join can't slip in silently. Keyed on
# (name, flag) — not name alone — so a query documented for one
# exception class (say a bounded-broadcast BNLJ) still FAILS the gate
# if it later grows a different flag (CARTESIAN / ROW_PYTHON); the r7
# advice pass flagged the name-only table as a laundering hole.
DOCUMENTED = {
    # genuinely non-equi / all-pairs, documented as such
    ("q_join_theta", "BNLJ"): "non-equi dim self-join: BNLJ over a broadcast dim",
    ("q_join_range", "BNLJ"): "deliberate unbinned contrast to q_join_range_binned",
    # The declared 5x5 dim cross join — Spark picks BNLJ when a side
    # is broadcastable (the usual plan here) and CartesianProduct only
    # if broadcast is disabled; both physical strategies are the same
    # documented contract shape, so both pairs are listed. (The
    # (name, flag) re-keying surfaced this: the old name-only table
    # hid that the live plan is BNLJ, not CartesianProduct.)
    ("q_join_cross", "CARTESIAN"): "5x5 dim cross join",
    ("q_join_cross", "BNLJ"): "5x5 dim cross join (broadcastable side)",
    ("q_dedup_embed", "BNLJ"): "declared brute-force baseline twin of the ANN paths",
    # Structural sentinel exclusion (r8 streaming fuzz fix): the sink
    # read-back attaches a broadcast 1-row max(ts) frame and keeps
    # rows at or before it — bounded broadcast, not a data join.
    ("q_stream_session", "BNLJ"): "broadcast 1-row max-ts sentinel bound",
    ("q_stream_join_left", "BNLJ"): "broadcast 1-row max-ts sentinel bound",
    ("q_stream_slide", "BNLJ"): "broadcast 1-row max-ts sentinel bound",
    ("q_udf_python", "ROW_PYTHON"): "row-at-a-time Python UDF showcase (§2.11)",
    # bounded-broadcast scalar/probe attaches (linear)
    ("q_cte_reuse", "BNLJ"): "scalar aggregate attach (1-row broadcast)",
    ("q_dedup_lsh", "BNLJ"): "broadcast minhash coefficient frame (constants)",
    ("q_evt_basket", "BNLJ"): "broadcast per-type counts + 1-row total",
    ("q_join_salted", "BNLJ"): "broadcast salt-range / dim frame",
    ("q_ml_kmeans_assign", "BNLJ"): "broadcast k-row centroid frame",
    ("q_ml_kmeans_iter2", "BNLJ"): "broadcast k-row centroid frame",
    ("q_ml_kmeans_update", "BNLJ"): "broadcast k-row centroid frame",
    ("q_neg_sample", "BNLJ"): "broadcast bounded positives frame",
    ("q_sample_mixture", "BNLJ"): "broadcast per-source weight frame",
    ("q_sim_ann", "BNLJ"): "broadcast probe set (vec_id < 10)",
    ("q_sim_ann_multi", "BNLJ"): "broadcast probe set (vec_id < 10)",
    ("q_sim_ivf", "BNLJ"): "broadcast probe + centroid frames",
    ("q_sim_knn", "BNLJ"): "broadcast probe set",
    ("q_sketch_bloom", "BNLJ"): "broadcast k/bit constant frames",
    ("q_sketch_cms", "BNLJ"): "broadcast depth-constant frame",
    ("q_sketch_quantile", "BNLJ"): "broadcast 1-row (min,max) stats frame",
    ("q_stream_quantile", "BNLJ"): "broadcast 1-row stats frame (batch finisher)",
    ("q_text_surprisal", "BNLJ"): "broadcast 1-row corpus total",
    ("q_text_tfidf", "BNLJ"): "broadcast 1-row doc-count total",
    ("q_ts_gapfill", "BNLJ"): "broadcast 1-row (min,max) grid bounds",
}


# r13 (r12 verdict task 5): session.py sets
# spark.sql.requireAllClusterKeysForCoPartition=false GLOBALLY, justified
# by the explicit fan_out(by=) sites whose keys are high-cardinality by
# construction. Nothing pinned that invariant for FUTURE queries: a new
# join on (k, extra) could silently ride a subset hashpartitioning(k)
# left behind by an unrelated low-cardinality aggregation — exactly the
# skew hazard the conf's default guards against. This rule fails any
# plan where a sort-merge / shuffled-hash join consumes subset
# co-partitioning that is NOT (a) keyed on a documented fan_out key and
# (b) downstream of an explicit fan_out(by=) exchange
# (REPARTITION_BY_NUM hashpartitioning on exactly those keys).
FAN_OUT_JOIN_KEYS = {"doc_id", "vec_id", "custkey"}


def _attr_tokens(s: str) -> set[str]:
    """Attribute tokens (name#exprId) in an expression/partitioning
    string."""
    return set(re.findall(r"\w+#\d+", s))


def _attr_names(tokens: set[str]) -> set[str]:
    return {t.split("#", 1)[0] for t in tokens}


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def _has_fanout_exchange(node, key_names: set[str]) -> bool:
    """True iff the subtree holds an explicit-repartition exchange
    (fan_out(by=): REPARTITION_BY_NUM) hash-partitioned on exactly
    ``key_names``."""
    for n in _walk(node):
        if n.nodeName() != "Exchange":
            continue
        part = n.outputPartitioning().toString()
        if not part.startswith("hashpartitioning"):
            continue
        try:
            origin = n.shuffleOrigin().toString()
        except Exception:
            continue
        if origin == "REPARTITION_BY_NUM" and (
            _attr_names(_attr_tokens(part)) == key_names
        ):
            return True
    return False


def subset_copartition_violations(df) -> list[str]:
    """Flag every SMJ/SHJ side that consumes SUBSET co-partitioning
    without sitting downstream of a documented explicit fan_out(by=)
    site. Inspects the pre-AQE initial plan: partitioning consumption
    is decided by EnsureRequirements there (AQE only coalesces)."""
    ep = df._jdf.queryExecution().executedPlan()
    try:
        root = ep.initialPlan()
    except Exception:
        root = ep
    out = []
    for n in _walk(root):
        nm = n.nodeName()
        if not (nm.startswith("SortMergeJoin") or nm.startswith("ShuffledHashJoin")):
            continue
        for keys, i in ((n.leftKeys(), 0), (n.rightKeys(), 1)):
            key_toks = _attr_tokens(keys.toString())
            ch = n.children().apply(i)
            part = ch.outputPartitioning().toString()
            if not part.startswith("hashpartitioning"):
                continue
            part_toks = _attr_tokens(part)
            if not part_toks or not (part_toks < key_toks):
                continue  # full co-partition (or unrelated): fine
            pn = _attr_names(part_toks)
            problems = []
            if not pn <= FAN_OUT_JOIN_KEYS:
                problems.append(
                    "key not in the documented high-cardinality fan_out set"
                )
            if not _has_fanout_exchange(ch, pn):
                problems.append(
                    "no explicit fan_out REPARTITION_BY_NUM site upstream"
                )
            if problems:
                out.append(
                    f"{nm} side{i}: partitioned on {sorted(pn)} ⊂ join keys "
                    f"{sorted(_attr_names(key_toks))} — " + "; ".join(problems)
                )
    return out


def audit_one(name, df):
    # NB: df may be UN-executed here — for an AdaptiveSparkPlan this
    # string is then the initial plan (isFinalPlan=false). That is
    # fine for every flag below (BNLJ/CARTESIAN/ROW_PYTHON/ReadSchema
    # are static-plan properties), but DO NOT add checks for runtime
    # AQE markers (skew=true, coalesced, demoted joins) without first
    # executing the df's own queryExecution (toRdd().count(); a noop
    # write or .count() finalizes a DIFFERENT queryExecution — see
    # skew_probe.q18_skew_curve and the r10 SCALE.md trap note).
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_bcast = len(re.findall(r"BroadcastExchange", plan))
    flags = []
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BNLJ")
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if re.search(r"\bBatchEvalPython\b", plan):
        flags.append("ROW_PYTHON")
    widths = [len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)]
    copart = subset_copartition_violations(df)
    if copart:
        # Never documentable by design: fix the plan (add the fan_out
        # site / key) instead of allowlisting the violation.
        flags.append("COPART")
    return {
        "exchanges": n_exchange,
        "broadcasts": n_bcast,
        "flags": flags,
        "max_scan_cols": max(widths, default=0),
        "copart": copart,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries, _ = collect()
    unknown = only - set(queries)
    if unknown:
        # A typo'd name must not read as a clean audit (r7 advice): the
        # name filter would silently skip everything and print "clean".
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark("plan_audit")
    rows, errors = {}, {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            rows[name] = audit_one(name, queries[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — report, keep going
            errors[name] = repr(exc)[:120]
    for name, r in rows.items():
        flag = ",".join(r["flags"]) or "-"
        print(
            f"{name:28s} exch={r['exchanges']:2d} bcast={r['broadcasts']:2d} "
            f"scan_cols={r['max_scan_cols']:2d} {flag}"
        )
    print("\n== EXCEPTIONS ==")
    clean = True
    for name, r in rows.items():
        for f in r["flags"]:
            note = DOCUMENTED.get((name, f))
            status = f"documented: {note}" if note else "UNDOCUMENTED"
            if not note:
                clean = False
            print(f"  {name}: {f} ({status})")
            if f == "COPART":
                for msg in r["copart"]:
                    print(f"      {msg}")
    for name, e in errors.items():
        clean = False
        print(f"  {name}: ERROR {e}")
    print("clean" if clean else "UNDOCUMENTED EXCEPTIONS PRESENT")
    return 0 if clean else 1


if __name__ == "__main__":
    raise SystemExit(main())
