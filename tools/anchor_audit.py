"""SURVEY §5.8 anchor-drift audit (r10 verdict task 6).

§5.8 maps every test-tier behavior (the semantics no row-hash oracle
can see) to its pytest anchor. A renamed or deleted test silently
un-anchors a behavior — the table keeps claiming coverage that no
longer collects. This script re-derives the truth each round:

    python tools/anchor_audit.py          # exit 0 = every anchor resolves

It extracts every ``test_file.py`` / ``test_file.py::test_name`` token
from the §5.8 table, runs ``pytest --collect-only -q`` (collection
only — no Spark session, a few seconds), and fails listing:

- ``::``-qualified anchors that no collected test id matches
  (parametrized variants of the anchor count as a match), and
- file-only anchors whose file collects zero tests.

Run it in the standing per-round runbook right after the pytest lane.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def survey_anchors() -> list[str]:
    """All pytest anchors named in the §5.8 table, in table order."""
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    m = re.search(r"^### 5\.8 .*?(?=^### |^## )", text, re.M | re.S)
    if not m:
        raise SystemExit("SURVEY.md has no §5.8 section")
    anchors: list[str] = []
    for row in m.group(0).splitlines():
        if not row.startswith("|") or "pytest anchor" in row:
            continue
        # Parse the ANCHOR COLUMN only (last table cell) — a stray
        # "::word" in the behavior-description prose must not be
        # fabricated into an anchor (r11 close advice). The cell may
        # carry several anchors joined by " / "; a bare "::name" token
        # continues the preceding file's anchor. Both-optional regex
        # groups matched empty everywhere; this grammar is explicit.
        cells = [c.strip() for c in row.strip().strip("|").split("|")]
        if len(cells) < 2 or cells[0].startswith("---"):
            continue
        current_file = None
        for tok in re.findall(r"test_\w+\.py(?:::\w+)?|::\w+", cells[-1]):
            if tok.startswith("::"):
                if current_file:
                    anchors.append(current_file + tok)
            else:
                current_file = tok.split("::", 1)[0]
                anchors.append(tok)
    if not anchors:
        # The audit must not pass vacuously: a §5.8 format drift that
        # breaks extraction would otherwise print "all anchors resolve"
        # over zero anchors — the exact failure the tool exists to catch.
        raise SystemExit("§5.8 parsed but zero anchors extracted — format drift?")
    return anchors


def collected_ids() -> set[str]:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    # Exit code 0 = clean collection. Anything else (a single test
    # file failing to import is rc=2) means the id set is PARTIAL —
    # auditing against it would report success over uncollected files.
    if out.returncode != 0:
        raise SystemExit(
            f"pytest collection failed (rc={out.returncode}) — audit would "
            f"run over a partial suite:\n{(out.stdout + out.stderr)[-2000:]}"
        )
    ids = {
        line.strip()
        for line in out.stdout.splitlines()
        if "::" in line and not line.startswith(("=", "<"))
    }
    if not ids:
        raise SystemExit(f"pytest collection produced no ids:\n{out.stdout[-2000:]}")
    return ids


def main() -> int:
    anchors = survey_anchors()
    ids = collected_ids()
    files_with_tests = {i.split("::", 1)[0].rsplit("/", 1)[-1] for i in ids}
    bare = {i.split("[", 1)[0] for i in ids}  # strip parametrize suffixes

    unresolved = []
    for a in anchors:
        if "::" in a:
            f, name = a.split("::", 1)
            if f"tests/{f}::{name}" not in bare:
                unresolved.append(a)
        elif a not in files_with_tests:
            unresolved.append(a)

    qualified = sum("::" in a for a in anchors)
    print(
        f"§5.8 anchors: {len(anchors)} total "
        f"({qualified} test-qualified, {len(anchors) - qualified} file-level); "
        f"collected ids: {len(ids)}"
    )
    if unresolved:
        print("UNRESOLVED anchors (renamed/deleted tests — fix §5.8 or the test):")
        for a in unresolved:
            print(f"  {a}")
        return 1
    print("all anchors resolve")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
