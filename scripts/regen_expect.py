#!/usr/bin/env python3
"""Regenerate bench_ref/build_expect.json from a round's BENCH_LOCAL files.

Encodes the hand rule DRIFT.md documented in round 16: per (sf, entry) the
expectation is the MIN across the supplied bench files (a committed fast
reading is the honest floor the re-timer should trigger against), with
wedge-adjudicated entries overridable via an explicit pins file so the
re-timer triggers ON the wedge instead of normalizing it.

Since round 17 the table carries QUERY names alongside the _build_* names
(flat per-sf blocks, same format Bench.scala already parses): the bench's
self-adjudicating re-timer covers both phases, keyed by name prefix.

Usage:
  python3 scripts/regen_expect.py -o bench_ref/build_expect.json \
      [--pins bench_ref/expect_pins.json] BENCH_LOCAL_*.json ...

Each input is one Bench JSON line (optionally inside a file with other
lines — the first line holding a "queries" object wins). The sf tag is
taken from the basename of the line's "sf" field (e.g. ".../sf0.1" ->
"sf0.1", ".../testdata_sf10" -> "sf10"). Pins format:
  {"sf10": {"_build_linked": 29.685}, ...}
"""
import argparse
import json
import re
import sys


def load_line(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            # bench lines may be captured with a leading "[info] " prefix
            m = re.search(
                r'\{"(?:errors|retimed|still_over_expect|spread|queries)".*',
                line)
            if not m:
                continue
            try:
                d = json.loads(m.group(0))
            except json.JSONDecodeError:
                continue
            if "queries" in d and "sf" in d:
                return d
    return None


def sf_tag(sf_path):
    m = re.search(r"sf\d+(\.\d+)?", sf_path.rsplit("/", 1)[-1])
    return m.group(0) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--pins", help="JSON of {sfTag: {name: sec}} overrides")
    ap.add_argument("files", nargs="+")
    args = ap.parse_args()

    table = {}
    for path in args.files:
        d = load_line(path)
        if d is None:
            print(f"WARN: no bench line in {path}, skipped", file=sys.stderr)
            continue
        tag = sf_tag(d["sf"])
        if tag is None:
            print(f"WARN: no sf tag in {d['sf']} ({path}), skipped",
                  file=sys.stderr)
            continue
        blk = table.setdefault(tag, {})
        for name, sec in d["queries"].items():
            if name in blk:
                blk[name] = min(blk[name], float(sec))
            else:
                blk[name] = float(sec)

    if args.pins:
        with open(args.pins) as f:
            pins = json.load(f)
        for tag, entries in pins.items():
            for name, sec in entries.items():
                table.setdefault(tag, {})[name] = float(sec)
                print(f"pinned {tag}/{name} = {sec}", file=sys.stderr)

    # stable key order: sf tags by numeric value, names alphabetically
    def sf_key(t):
        return float(t[2:])
    out = {t: dict(sorted(table[t].items()))
           for t in sorted(table, key=sf_key)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    for t in out:
        n_build = sum(1 for k in out[t] if k.startswith("_build_"))
        print(f"{t}: {n_build} builds, {len(out[t]) - n_build} queries")


if __name__ == "__main__":
    main()
