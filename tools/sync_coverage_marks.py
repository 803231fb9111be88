#!/usr/bin/env python
"""Rewrite COVERAGE.md's per-query tier marks from the registry.

Every registry query name appearing in a COVERAGE.md TABLE ROW gets
the mark the registry assigns it: ``(ext)`` suffix for extended-tier
queries, bare for gate queries.  Prose lines are untouched (they make
no tier claim).  Run after any gate rotation; the contract is pinned
by tests/test_plans.py::test_coverage_md_tier_marks_match_registry.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from diabetes_etl_spark.plans import all_queries  # noqa: E402


def main() -> None:
    reg = all_queries(include_extended=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COVERAGE.md",
    )
    with open(path, encoding="utf-8") as f:
        lines = f.read().split("\n")
    fixed = 0

    def sub(m: re.Match) -> str:
        nonlocal fixed
        name, mark = m.group(1), m.group(2)
        if name not in reg:
            return m.group(0)
        ext = reg[name].extended
        if ext == bool(mark):
            return m.group(0)
        fixed += 1
        if ext:
            return f"`{name}` (ext)"
        # drop a stale mark; a prose-form "(ext," / "(ext;" keeps its
        # opening paren so the parenthetical's tail still reads
        return f"`{name}`" + (
            "" if mark.endswith(")") else " ("
        )

    # a mark is "(ext)" or the prose form "(ext, ...)" / "(ext; ...)"
    out = [
        re.sub(r"`([a-z0-9_]+)`( \(ext[,;)])?", sub, ln)
        if ln.lstrip().startswith("|")
        else ln
        for ln in lines
    ]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out))
    print(f"rewrote {fixed} tier mark(s)")


if __name__ == "__main__":
    main()
