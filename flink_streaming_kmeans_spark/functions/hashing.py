"""The cross-engine deterministic hash primitive.

SPARK_H60 / DUCK_H60 render the SAME 60-bit integer from any string
expression on both engines: the first 15 hex digits of md5(x), parsed
as an unsigned integer (15 hex digits = 60 bits, always inside a
signed BIGINT, so neither engine's parse can overflow or sign-flip).
Every md5-keyed construction in the repo — sharding, curriculum
shuffle, sketches (CMS/Bloom/HLL), fingerprinting, LSH band hashes —
builds on this pair.

One definition, three former copies: plans/textops.py, sketches.py and
training.py each hand-maintained the identical strings with "same
primitive as textops" comments (review r6) — the same drift hazard the
ASSIGN_CTE hoist to operators/kmeans.py fixed for the Lloyd oracle.
This module is NON-registering, so plans modules can import it without
firing any @register call mid-import (registry.py rotation invariant).

Usage: ``SPARK_H60.format(x="text")`` / ``DUCK_H60.format(x='text')``
— the placeholder is substituted with a SQL expression, not a value.
"""

from __future__ import annotations

SPARK_H60 = "CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
DUCK_H60 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"

# Portable text normalization for HASH-relevant paths (r6 unicode
# probe): native lower()/upper() follow each engine's unicode tables
# and DIVERGE off-ASCII (Spark/Java lower('İ') = 'i'+U+0307 vs
# utf8proc 'i'; upper('ß') = 'SS' vs 'ẞ'), and DuckDB's one-arg TRIM
# strips unicode whitespace (U+00A0) where Spark's strips only ASCII
# space. Any fingerprint/group key built on those diverges on the
# first non-ASCII document. ASCII_FOLD case-folds [A-Z] ONLY via
# translate (probe-verified identical both engines, all samples);
# PORTABLE_TRIM pins space-only trimming on both (NOTE the reversed
# two-arg orders: Spark trim(trimStr, str) vs DuckDB trim(str,
# chars) — Spark side just uses the one-arg form). Showcase queries
# that exist to exercise the NATIVE case functions (q_str_funcs)
# keep them, with the ASCII-input caveat documented.
_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LO = "abcdefghijklmnopqrstuvwxyz"
SPARK_ASCII_FOLD = f"translate({{x}}, '{_UP}', '{_LO}')"
DUCK_ASCII_FOLD = f"translate({{x}}, '{_UP}', '{_LO}')"
SPARK_TRIM = "trim({x})"
DUCK_TRIM = "trim({x}, ' ')"


def spark_ascii_fold(col):
    """DataFrame twin of SPARK_ASCII_FOLD (keep in lockstep)."""
    from pyspark.sql import functions as F

    col = F.col(col) if isinstance(col, str) else col
    return F.translate(col, _UP, _LO)
