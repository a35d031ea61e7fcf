"""Property-based tests (SURVEY §5.2.4): algebraic invariants that
must hold for ANY input, checked over generated data.

Each property runs a bounded number of hypothesis examples against a
shared Spark session (deadline disabled — JVM latency is not the
code's fault). Data volumes are tiny by design; the properties, not
the scale, are the point.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_streaming_kmeans_spark.functions.vector import mround, sql_mround


SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=8
)

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini


def _dedup(df):
    """The q_dedup_exact core: one row per normalized-content digest."""
    return (
        df.select(F.md5(F.lower(F.trim("text"))).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"))
    )


@SET
@given(texts)
def test_dedup_idempotent(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    once = _dedup(df)
    twice = _dedup(
        once.select(F.col("fp").alias("text"), F.col("keep_doc_id").alias("doc_id"))
    )
    # dedup of an already-deduped relation changes nothing: same count,
    # and one row per distinct input fingerprint
    n_distinct = df.select(F.md5(F.lower(F.trim("text")))).distinct().count()
    assert once.count() == n_distinct
    assert twice.count() == once.count()


@SET
@given(texts, texts)
def test_union_all_count_additive(spark, a, b):
    da = spark.createDataFrame([(t,) for t in a], "text string")
    db = spark.createDataFrame([(t,) for t in b], "text string")
    assert da.unionAll(db).count() == len(a) + len(b)


scored_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # cluster_id
        st.integers(min_value=0, max_value=30),  # doc_id
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),  # n_chars
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[1],  # doc_id unique, as in the real pipeline
)


@SET
@given(scored_rows)
def test_canonical_argmax_equals_window_top1(spark, rows):
    """The q_dedup_canonical r12 rewrite: max(struct(n_chars, -doc_id,
    doc_id)) must pick exactly the row a (n_chars DESC, doc_id ASC)
    row_number window ranks first — including NULL n_chars (loses to
    any non-null, exactly like DESC NULLS LAST), all-NULL clusters,
    and n_chars ties broken by the lower doc_id."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        rows, "cluster_id int, doc_id long, n_chars long"
    )
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = df.withColumn("rn", F.row_number().over(w))
    old = ranked.groupBy("cluster_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc"),
        F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
        .cast("bigint")
        .alias("kept_chars"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dropped"),
    )
    best = F.max(
        F.struct(
            F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"), F.col("doc_id")
        )
    )
    new = (
        df.groupBy("cluster_id")
        .agg(best.alias("best"), (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dropped"))
        .select(
            "cluster_id",
            F.col("best.doc_id").alias("kept_doc"),
            F.col("best.n_chars").cast("bigint").alias("kept_chars"),
            "n_dropped",
        )
    )
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
    assert old.schema == new.schema


tok_sets = st.sets(st.sampled_from("abcdefgh"), min_size=1, max_size=8)


@SET
@given(tok_sets, tok_sets)
def test_jaccard_symmetric_bounded(spark, sa, sb):
    """Jaccard via the group-count/union-count join formulation (the
    q_dedup_near core) is symmetric, bounded to [0,1], and 1 iff the
    sets are equal."""

    def jac(x, y):
        ex = spark.createDataFrame(
            [(1, t) for t in x] + [(2, t) for t in y], "doc_id long, s string"
        )
        ns = ex.groupBy("doc_id").agg(F.count("*").alias("ns"))
        a = ex.join(ns, "doc_id").where(F.col("doc_id") == 1).alias("a")
        b = ex.join(ns, "doc_id").where(F.col("doc_id") == 2).alias("b")
        row = (
            a.join(b, F.col("a.s") == F.col("b.s"))
            .groupBy()
            .agg(
                F.count("*").alias("common"),
                F.first("a.ns").alias("na"),
                F.first("b.ns").alias("nb"),
            )
            .collect()
        )
        # disjoint sets: the global agg over the empty join yields one
        # row with count=0 and NULL firsts
        if not row or not row[0].common:
            return 0.0
        r = row[0]
        return r.common / (r.na + r.nb - r.common)

    jab, jba = jac(sa, sb), jac(sb, sa)
    assert abs(jab - jba) < 1e-12
    assert 0.0 <= jab <= 1.0
    if sa == sb:
        assert jab == 1.0


doubles = st.floats(
    min_value=-1e8, max_value=1e8, allow_nan=False, allow_infinity=False
)


@SET
@given(st.lists(doubles, min_size=1, max_size=20))
def test_mround_matches_duckdb_exactly(spark, xs):
    """The matched-round primitive must produce the bit-identical
    double on Spark and DuckDB for arbitrary inputs INCLUDING decimal
    midpoints — this one property is what every hash oracle rests on."""
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got = {
        r.i: r.v for r in df.select("i", mround("x").alias("v")).collect()
    }
    con = duckdb.connect()
    for i, x in enumerate(xs):
        # bind once through a subquery alias: the guarded sql_mround
        # repeats its argument expression several times
        [(want,)] = con.execute(
            f"SELECT {sql_mround('x')} FROM (SELECT CAST(? AS DOUBLE) AS x)",
            [x],
        ).fetchall()
        assert got[i] == pytest.approx(want, abs=0.0), (x, got[i], want)


edge_lists = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=20,
)


@given(edges=edge_lists)
@SET
def test_connected_components_matches_union_find(spark, edges):
    """The distributed min-label propagation must agree with a plain
    union-find on ANY undirected graph over 15 nodes."""
    from flink_streaming_kmeans_spark.operators.graph import connected_components

    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}
    # union-find roots are not necessarily component minima; normalize
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    want = {i: min(comp[find(i)]) for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edf = spark.createDataFrame(
        edges or [(0, 0)], "src bigint, dst bigint"
    )
    if not edges:
        edf = edf.where(F.lit(False))
    got = {r.id: r.label for r in connected_components(nodes, edf).collect()}
    assert got == want


@given(edges=edge_lists)
@SET
def test_star_contraction_matches_union_find(spark, edges):
    """The large-star/small-star contraction must agree with union-find
    on ANY undirected graph over 15 nodes — same contract as the
    propagation variant, different round complexity."""
    from flink_streaming_kmeans_spark.operators.graph import (
        connected_components_star,
    )

    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    want = {i: min(comp[find(i)]) for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edf = spark.createDataFrame(edges or [(0, 0)], "src bigint, dst bigint")
    if not edges:
        edf = edf.where(F.lit(False))
    got = {
        r.id: r.label
        for r in connected_components_star(nodes, edf).collect()
    }
    assert got == want


def test_star_contraction_high_diameter_chain(spark):
    """The reason the star variant exists: a 256-hop path collapses in
    O(log² n) rounds (min-label propagation would need ~256). The
    round cap of 10 is the assertion — propagation could not converge
    a diameter-256 graph in 10 rounds."""
    from flink_streaming_kmeans_spark.operators.graph import (
        connected_components_star,
    )

    n = 257
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    got = connected_components_star(nodes, edf, max_rounds=10).collect()
    assert len(got) == n
    assert all(r.label == 0 for r in got)


def test_label_prop_autoswitches_to_star_on_long_chain(spark):
    """The registered dedup path (q_dedup_cluster → connected_components
    with DEFAULT params) must survive a pathological high-diameter
    graph: a 1000-hop chain. Label propagation alone would need ~1000
    rounds (and previously raised at 50); the auto-switch hands off to
    star contraction after star_after rounds, so this converges — and
    max_rounds=12 proves propagation could not have done it alone."""
    from flink_streaming_kmeans_spark.operators.graph import connected_components

    n = 1001
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    got = connected_components(nodes, edf, max_rounds=12, star_after=4).collect()
    assert len(got) == n
    assert all(r.label == 0 for r in got)


def test_pagerank_mass_and_degree_monotonicity(spark, registry):
    """Two invariants of PageRank on the symmetrized trade graph:
    (1) rank mass is (approximately) conserved — at the damped
    stationary point sum(pr) == N exactly, and two iterations from
    the uniform init stay within a few percent of N; (2) rank follows
    degree on average — the mean rank of top-decile-degree nodes must
    exceed the mean rank of bottom-decile nodes (that is what the
    random-surfer model pays hubs for)."""
    queries, _ = registry
    rows = (
        queries["q_graph_pagerank"](spark, "/root/testdata/sf0.001")
        .select("node", "degree", "pr_2")
        .collect()
    )
    n = len(rows)
    total = sum(r.pr_2 for r in rows)
    assert abs(total - n) / n < 0.05, (total, n)
    by_deg = sorted(rows, key=lambda r: r.degree)
    k = max(1, n // 10)
    lo = sum(r.pr_2 for r in by_deg[:k]) / k
    hi = sum(r.pr_2 for r in by_deg[-k:]) / k
    assert hi > lo, (hi, lo)
