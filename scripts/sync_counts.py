#!/usr/bin/env python3
"""Derive the query/spec counts from the source of truth and patch the
docs, so README/COVERAGE numbers can never drift from the code again
(the round-6 review flagged four hand-sync "bump spec count" commits).

- query count  = entries in SparkEntry.queries (the driver contract)
- spec count   = test("...") occurrences across src/test (matches what
  `sbt test` reports; every suite uses plain ScalaTest test registration)

Usage: python3 scripts/sync_counts.py [--check]
  --check: exit 1 if the docs are out of date instead of rewriting them.
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def query_count() -> int:
    # Post-split (round 9), the query bindings live in the per-family
    # registries under graft/entry; SparkEntry.scala only merges the maps.
    n = 0
    for f in (ROOT / "src/main/scala/graft/entry").glob("*Queries.scala"):
        n += len(re.findall(r'^\s*"[A-Za-z0-9_]+" -> \(\(s, d\)', f.read_text(), re.M))
    assert n > 0, "no queries entries matched — pattern drift?"
    return n


def spec_count() -> int:
    n = 0
    for f in (ROOT / "src/test/scala/graft").glob("*.scala"):
        n += len(re.findall(r'^\s*test\("', f.read_text(), re.M))
    assert n > 0, "no test(...) registrations matched — pattern drift?"
    return n


def patch(path: Path, subs, check: bool) -> bool:
    text = orig = path.read_text()
    for pattern, repl in subs:
        text, n = re.subn(pattern, repl, text)
        assert n > 0, f"{path.name}: pattern not found: {pattern}"
    if text == orig:
        return False
    if not check:
        path.write_text(text)
    return True


def main() -> int:
    check = "--check" in sys.argv
    q, s = query_count(), spec_count()
    changed = [
        p.name
        for p, subs in [
            (ROOT / "README.md", [
                (r"# \d+ specs", f"# {s} specs"),
                (r"# DuckDB compare \(\d+/\d+\)", f"# DuckDB compare ({q}/{q})"),
            ]),
            # Only the marker line this script owns — COVERAGE.md's
            # historical round narratives also say "N/N hash-match" and
            # must never be rewritten.
            (ROOT / "COVERAGE.md", [
                (r"Current driver surface: \d+/\d+ hash-match",
                 f"Current driver surface: {q}/{q} hash-match"),
            ]),
        ]
        if patch(p, subs, check)
    ]
    print(f"queries={q} specs={s} "
          + (f"stale: {', '.join(changed)}" if changed else "docs in sync"))
    return 1 if (check and changed) else 0


if __name__ == "__main__":
    sys.exit(main())
