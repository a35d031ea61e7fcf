"""Local replica of the driver's DuckDB oracle-parity check.

For a registered query: run the Spark callable and the DuckDB oracle
SQL on the same parquet tables, then compare row count, schema (column
names, sorted) and an order-insensitive value hash. Any mismatch here
means CORRECTNESS_r{N}.json would go red for that query — this is the
pre-flight that SURVEY.md §5.2.1 prescribes.

Normalization before hashing (both sides identically):
- columns sorted by name;
- every cell rendered to a canonical string (floats via repr of the
  double, timestamps/dates via isoformat, None → "");
- rows sorted lexicographically, then sha256 over the concatenation.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb

from flink_streaming_kmeans_spark.sources.loader import TABLES


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the 10 test tables registered as views."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def copy_sf_tables(src: str, dest: str) -> str:
    """Copy all SF tables from ``src`` into ``dest`` (the shared
    doctored-fixture scaffold — the empty/composed/fuzz degenerate
    modules all start from a byte-copy of a real SF dir; hoisted here
    so the table list has ONE home, loader.TABLES, and a new table in
    the layout propagates everywhere — r8 review pass)."""
    import os
    import shutil

    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), os.path.join(dest, f"{t}.parquet")
        )
    return dest


def _canon_cell(v) -> str:
    if v is None:
        # A reserved byte no str() of a real value can produce — NULL
        # collapsing to "" made NULL vs empty-string divergences hash
        # identically, i.e. a masked engine disagreement (review r6).
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if hasattr(v, "isoformat"):  # datetime / date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon_rows(
    cols: list[str], rows: list[tuple]
) -> tuple[int, list[str], str, list[str]]:
    # Duplicate output column names make the name-sort tie-break fall
    # back to each engine's physical column order — a spurious
    # mismatch (or masked swap) on semantically identical results.
    # Fail loudly: a registered query must alias every column uniquely
    # (review r6).
    if len(set(cols)) != len(cols):
        dupes = sorted({c for c in cols if cols.count(c) > 1})
        raise ValueError(f"duplicate output column names: {dupes}")
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\x1e".join(lines).encode()).hexdigest()
    return len(rows), sorted(cols), h, lines


@dataclass
class ParityResult:
    name: str
    rows_match: bool
    schema_match: bool
    hash_match: bool
    spark_rows: int
    duck_rows: int
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.rows_match and self.schema_match and self.hash_match


def check_parity(spark, con, name: str, query_fn, sql: str, sf_dir: str) -> ParityResult:
    sdf = query_fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_n, s_cols, s_hash, s_lines = _canon_rows(list(sdf.columns), s_rows)

    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    d_n, d_cols_sorted, d_hash, d_lines = _canon_rows(d_cols, d_rows)

    detail = ""
    if s_hash != d_hash and s_n == d_n and s_cols == d_cols_sorted:
        detail = _first_diff(s_lines, d_lines)
    return ParityResult(
        name=name,
        rows_match=s_n == d_n,
        schema_match=s_cols == d_cols_sorted,
        hash_match=s_hash == d_hash,
        spark_rows=s_n,
        duck_rows=d_n,
        detail=detail or f"spark_cols={s_cols} duck_cols={d_cols_sorted}",
    )


def _first_diff(s_lines: list[str], d_lines: list[str]) -> str:
    # Consumes _canon_rows' own canonical lines — re-deriving them
    # here duplicated the recipe and could silently disagree with the
    # hash verdict it explains (review r6).
    for i, (a, b) in enumerate(zip(s_lines, d_lines)):
        if a != b:
            return f"first diff at sorted row {i}:\n  spark={a!r}\n  duck ={b!r}"
    return f"length diff: spark {len(s_lines)} vs duck {len(d_lines)}"
