"""q_dedup_prefix (prefix-filtering set-similarity join): brute-force
parity on crafted corpora, including the boundary cases where the
pigeonhole bound is tight — a missed candidate would silently drop a
pair, which small random corpora (not just the driver's fixed data)
must be unable to hide.
"""

from __future__ import annotations

import itertools
import random

import pytest

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini



def _brute(docs, t_num=19, t_den=20):
    out = set()
    for (ida, ta), (idb, tb) in itertools.combinations(docs, 2):
        a, b = set(ta.split(" ")), set(tb.split(" "))
        inter = len(a & b)
        uni = len(a | b)
        if t_den * inter >= t_num * uni:
            out.add((min(ida, idb), max(ida, idb)))
    return out


def _run(spark, registry, docs, tmp_path, tag):
    # doc ids are %4-aligned: the registered query scopes its input
    # to doc_id % 4 == 0 (see q_dedup_prefix's INPUT SCOPE note)
    df = spark.createDataFrame(
        [(i * 4, t, "en", "test", len(t)) for i, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = str(tmp_path / f"pfx_{tag}")
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    queries, _ = registry
    rows = queries["q_dedup_prefix"](spark, sf).collect()
    got = {(r.doc_a // 4, r.doc_b // 4) for r in rows}
    assert got == _brute(docs), (got, _brute(docs))
    # And the integer Jaccard columns must be self-consistent.
    for r in rows:
        assert r.j_e4 == (10000 * r.inter) // r.uni
        assert 20 * r.inter >= 19 * r.uni


def test_boundary_and_degenerate_pairs(spark, registry, tmp_path):
    """J = 39/41 is the smallest ratio passing t=0.95 for ~40-token
    docs (20*39 >= 19*41 by exactly 1); identical docs (J=1),
    single-token docs, and fully disjoint docs ride along."""
    base = [f"w{i}" for i in range(40)]
    docs = [
        (1, " ".join(base)),
        (2, " ".join(base[:-1] + ["zz"])),  # J = 39/41: boundary pass
        (3, " ".join(base)),  # identical to doc 1
        (4, "solo"),
        (5, "solo"),  # identical single-token pair
        (6, " ".join(f"x{i}" for i in range(40))),  # disjoint
    ]
    _run(spark, registry, docs, tmp_path, "edge")


@pytest.mark.parametrize("seed", [3, 17])
def test_randomized_against_bruteforce(spark, registry, tmp_path, seed):
    """Random corpora over a small vocabulary (so overlaps are dense
    and candidate pruning is actually exercised), mutated copies
    planted at varying distances around the threshold."""
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(60)]
    docs = []
    did = 0
    for _ in range(12):
        n = rng.randint(1, 30)
        toks = rng.sample(vocab, n)
        docs.append((did, " ".join(toks)))
        did += 1
        if rng.random() < 0.6:  # plant a near-copy: drop/add ≤2 tokens
            mut = [t for t in toks if rng.random() > 0.05]
            if rng.random() < 0.5:
                mut.append(rng.choice(vocab))
            docs.append((did, " ".join(mut) if mut else "empty"))
            did += 1
    _run(spark, registry, docs, tmp_path, f"rand{seed}")
