#!/usr/bin/env python3
"""Per-query bench drift gate.

Classifies every query in a bench run as WITHIN-BAND or OUTLIER against a
reference run, then distinguishes *query-specific regressions* (a plan or
code change made one query slow) from *time-local environment windows* (a
contended stretch of wall clock made whatever happened to be running slow).

The distinction matters because the two look identical in a sorted ratio
table but have opposite remediations: a regression needs a named code fix;
an environment window needs nothing (and re-timing the same queries
back-to-back on a quiet box confirms it).

Method
------
1. ratio(q) = cur[q] / ref[q] for every query present in both runs.
2. The machine-wide band is [p25, p75] of all ratios, i.e. the flat
   environment-wide slowdown between the two runs plus normal jitter.
   A query is an OUTLIER if ratio > p75 * TOL (TOL=2.0: twice the upper
   quartile — far beyond jitter).
3. Outliers are then tested for *execution adjacency*. graft.Bench prints
   queries in execution order, so consecutive JSON positions = consecutive
   wall clock. An outlier whose neighbors (±WINDOW positions) contain >=2
   other elevated entries (ratio > ELEV) is tagged TRANSIENT-WINDOW; an
   isolated outlier with in-band neighbors is tagged QUERY-REGRESSION and
   fails the gate.

Inputs: bench JSON in either format —
  * driver artifact (BENCH_r*.json): {"tail": "<last 2000 chars of stdout>"}
    — parsed positionally from the tail (partial coverage is fine; the tail
    keeps the END of the line, which is the medians map).
  * local artifact (BENCH_LOCAL_*.json) or a raw Bench stdout line:
    {"queries": {...}} in execution order (Python dicts preserve it).

Usage:
  python3 scripts/drift_gate.py REF.json CUR.json [--report out.md]
Exit 0: all outliers adjudicated as transient windows (or none).
Exit 1: at least one isolated QUERY-REGRESSION -> needs a named fix.
"""
import json
import re
import statistics
import sys

FOOTER = {"value", "repeat", "n_queries", "n_builds", "n_errors",
          "build_total", "query_total"}
TOL = 2.0     # outlier = ratio beyond TOL * p75 of the machine-wide band
ELEV = 2.5    # "elevated" neighbor threshold for window detection
WINDOW = 3    # positions on each side scanned for elevated neighbors


def load(path):
    """Return [(name, seconds)] in execution order from either format."""
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = {"tail": text}  # raw Bench stdout
    src = d.get("tail") if isinstance(d, dict) and "tail" in d else None
    if src is None and isinstance(d, dict) and "queries" in d:
        return [(k, float(v)) for k, v in d["queries"].items()]
    out = []
    for m in re.finditer(r'"([A-Za-z0-9_]+)":([0-9.]+)', src or ""):
        if m.group(1) not in FOOTER and not m.group(1).startswith("_build_"):
            out.append((m.group(1), float(m.group(2))))
    return out


def totals(path):
    """(build_total, query_total) from a bench artifact's footer, if the
    run published them (graft.Bench emits both since round 10). Build
    drift (one-time index materializations) and query drift mean
    different things; the report separates them when both runs carry the
    split."""
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = {"tail": text}
    src = d.get("tail") if isinstance(d, dict) and "tail" in d else text
    if isinstance(d, dict) and "build_total" in d and "query_total" in d:
        return float(d["build_total"]), float(d["query_total"])
    bt = re.search(r'"build_total":([0-9.]+)', src or "")
    qt = re.search(r'"query_total":([0-9.]+)', src or "")
    if bt and qt:
        return float(bt.group(1)), float(qt.group(1))
    return None


def classify(ref_pairs, cur_pairs):
    ref = dict(ref_pairs)
    ratios = []  # (pos_in_cur, name, cur_s, ref_s, ratio)
    for pos, (name, cur_s) in enumerate(cur_pairs):
        if name in ref and ref[name] > 0:
            ratios.append((pos, name, cur_s, ref[name], cur_s / ref[name]))
    if len(ratios) < 8:
        raise SystemExit(f"only {len(ratios)} comparable queries — need >= 8")
    rs = sorted(r for _, _, _, _, r in ratios)
    med = statistics.median(rs)
    p25, p75 = rs[len(rs) // 4], rs[3 * len(rs) // 4]
    cut = p75 * TOL
    by_pos = {p: r for p, _, _, _, r in ratios}
    rows = []
    for pos, name, cur_s, ref_s, r in ratios:
        if r <= cut:
            verdict = "within-band"
        else:
            neighbors = [by_pos[p] for p in range(pos - WINDOW, pos + WINDOW + 1)
                         if p != pos and p in by_pos]
            elevated = sum(1 for n in neighbors if n > ELEV)
            verdict = ("transient-window" if elevated >= 2
                       else "QUERY-REGRESSION")
        rows.append((pos, name, cur_s, ref_s, r, verdict))
    return {"n": len(ratios), "median": med, "p25": p25, "p75": p75,
            "cut": cut, "rows": rows}


def main():
    argv = sys.argv[1:]
    report = None
    if "--report" in argv:
        i = argv.index("--report")
        report = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = argv
    if len(args) != 2:
        raise SystemExit(__doc__)
    res = classify(load(args[0]), load(args[1]))
    lines = [
        f"# Drift gate: {args[1]} vs {args[0]}",
        "",
        f"Comparable queries: {res['n']}; machine-wide ratio median "
        f"{res['median']:.2f}x (p25 {res['p25']:.2f} / p75 {res['p75']:.2f}); "
        f"outlier cut {res['cut']:.2f}x (= {TOL:.0f} * p75).",
        "",
        "| pos | query | ref s | cur s | ratio | verdict |",
        "|---|---|---|---|---|---|",
    ]
    flagged = [r for r in res["rows"] if r[5] != "within-band"]
    for pos, name, cur_s, ref_s, r, verdict in sorted(
            flagged, key=lambda x: x[0]):
        lines.append(f"| {pos} | {name} | {ref_s:.3f} | {cur_s:.3f} "
                     f"| {r:.2f}x | {verdict} |")
    if not flagged:
        lines.append("| - | (none flagged) | | | | |")
    regressions = [r for r in flagged if r[5] == "QUERY-REGRESSION"]
    lines += ["",
              f"Flagged {len(flagged)} of {res['n']}; "
              f"{len(regressions)} isolated query regression(s)."]
    tr, tc = totals(args[0]), totals(args[1])
    if tr and tc:
        # A zero reference total (e.g. a truncated tail that matched only
        # one side's footer) must degrade to "n/a", not abort the gate
        # with a ZeroDivisionError after the per-query verdicts are done.
        def x(cur, ref):
            return f"{cur / ref:.2f}x" if ref > 0 else "n/a"
        lines += ["",
                  f"Builds-vs-queries split: builds {tr[0]:.1f}s -> "
                  f"{tc[0]:.1f}s ({x(tc[0], tr[0])}), queries "
                  f"{tr[1]:.1f}s -> {tc[1]:.1f}s ({x(tc[1], tr[1])})."]
    text = "\n".join(lines) + "\n"
    if report:
        with open(report, "w") as f:
            f.write(text)
    print(text)
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
