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
