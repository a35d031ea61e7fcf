"""Degenerate-regime parity for doctored documents (r6 sweep #10):
duplicate doc_ids, lying n_chars metadata, punctuation-only /
single-char / single-token-repeated / huge-varied text.

The sweep's find: the shared shingle-oracle CTE (plans/llm.py
_SHINGLES_CTE) built DISTINCT shingle sets PER ROW (list_distinct +
unnest) where the Spark canonical construction
(operators/minhash.shingle_rows) dedups per DOC
(dropDuplicates([doc_id, s])) — identical while doc_id is a primary
key, forked the moment a doc_id appeared on two rows: the oracle
fanned doc 1's shingles and doubled q_text_decontaminate's hit
counts. The contract is now stated: a document is identified by
doc_id, and its shingle set is the distinct UNION over its rows.

The rest of the regime (lying/negative/zero n_chars, '!!! ??? ,,,',
digits-only, 'a', 2000x one repeated token — a shingle set of size
ONE, a 5000-distinct-token giant) passed 167/167 with zero
divergences: text operators derive everything from text itself, and
metadata columns are reported, never trusted as lengths.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest
from oracle import check_parity, make_duckdb

from conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # slow lane — see pytest.ini


TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def docs_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen_docs"))
    for t in TABLES:
        shutil.copy(os.path.join(SF_SMOKE, f"{t}.parquet"),
                    os.path.join(sf, f"{t}.parquet"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    con.sql(f"""COPY (SELECT * FROM '{sf}/documents.parquet' UNION ALL BY NAME
     SELECT * FROM (VALUES
       (1::BIGINT, 'duplicate id different text entirely', 'en',
        'degen-docs', 35::BIGINT),
       (1, 'duplicate id different text entirely', 'en', 'degen-docs', 35),
       (960001, 'the cat sat on the mat and then the cat sat again', 'en',
        'degen-docs', 50),
       (960002, 'the cat sat on the mat and then the cat sat again', 'en',
        'degen-docs', 50),
       (960003, 'short', 'en', 'degen-docs', 999999),
       (960004, 'negative meta', 'en', 'degen-docs', -5),
       (960005, 'zero meta', 'en', 'degen-docs', 0),
       (960006, '!!! ??? ,,, ...', 'xx', 'degen-docs', 15),
       (960007, '1234567890 0987654321', 'xx', 'degen-docs', 21),
       (960008, 'a', 'en', 'degen-docs', 1),
       (960009, repeat('word ', 2000), 'en', 'degen-docs', 10000),
       (960010, (SELECT string_agg('tok' || r.range::VARCHAR, ' ')
                 FROM range(5000) r), 'en', 'degen-docs', 30000)
     ) v(doc_id, text, lang, source, n_chars))
     TO '{sf}/_d.parquet' (FORMAT PARQUET)""")
    os.replace(f"{sf}/_d.parquet", f"{sf}/documents.parquet")
    con.close()
    yield sf


@pytest.fixture(scope="module")
def docs_duck(docs_sf):
    con = make_duckdb(docs_sf)
    yield con
    con.close()


# The find plus the full shingle-consumer family and the heaviest
# text operators on this data.
DOCS_CHECKED = [
    "q_text_decontaminate",
    "q_dedup_near",
    "q_dedup_cluster",
    "q_dedup_lsh",
    "q_dedup_exact",
    "q_text_tfidf",
    "q_text_bpe_tokens",
    "q_text_quality",
    "q_shard_assign",
    "q_curriculum_order",
]


@pytest.mark.parametrize("name", DOCS_CHECKED)
def test_degenerate_docs_parity(spark, docs_duck, registry, docs_sf, name):
    queries, oracles = registry
    r = check_parity(
        spark, docs_duck, name, queries[name], oracles[name], docs_sf
    )
    assert r.ok, (
        f"{name} diverges on doctored documents: rows={r.rows_match} "
        f"schema={r.schema_match} hash={r.hash_match}\n{r.detail}"
    )


def test_exact_dup_pair_detected(spark, registry, docs_sf):
    """The planted identical-text pair collapses to one fingerprint
    with n_copies=2 and keep_doc_id = the smaller id."""
    import pyspark.sql.functions as F

    queries, _ = registry
    row = (
        queries["q_dedup_exact"](spark, docs_sf)
        .where(F.col("n_copies") >= 2)
        .where(F.col("keep_doc_id") == 960001)
        .collect()
    )
    assert len(row) == 1 and row[0]["n_copies"] == 2
