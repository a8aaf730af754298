#!/usr/bin/env python3
"""Fit per-entry and per-family scaling exponents from three Bench runs
(sf0.001 / sf0.01 / sf0.1) and emit SCALING_CURVE.json — the empirical
check of SCALING.md's O-shape claims: the fitted exponent is the slope of
ln(seconds) vs ln(sf), so ~1.0 means linear in corpus size, ~0 means
fixed-overhead-dominated (fine), and >> 1 is a super-linear finding to
fix.

Caveats the numbers carry by construction: at sf0.001 almost every entry
is dominated by constant per-query overhead (plan + a handful of tasks,
tens of ms), which BIASES exponents DOWN — so the flag threshold applies
only to entries that are non-trivial at sf0.1. Medians-of-3 warm runs
(Bench default) keep sandbox noise out of the fit.

TWO flags per entry, because one fitted exponent over all decades SMOOTHS
a super-linear tail into invisibility (round 12: q_lsh_cosine's last
decade was 18.2x for 10x data — local slope 1.26 — while the five-point
fit read 0.68, dragged down by the overhead-dominated early decades):
 * `exponent`  — the least-squares fit over every decade (shape summary);
 * `last_slope` — the LOCAL slope of the final decade pair, ln(t_n/t_{n-1})
   / ln(sf_n/sf_{n-1}) — the direction the curve is actually heading at
   the largest measured scale. `flagged_tail` lists entries whose
   last_slope exceeds the same 1.15 bar at a non-trivial terminal time.

Usage: python3 scripts/scaling_curve.py /tmp/bench_sf0.001.json \
         /tmp/bench_sf0.01.json /tmp/bench_sf0.1.json [-o SCALING_CURVE.json]
"""
import json
import math
import sys
from pathlib import Path

FLAG_EXPONENT = 1.15  # super-linear beyond fit noise
FLAG_MIN_SEC = 0.5    # only flag entries that matter at sf0.1

FAMILIES = [
    ("builds", lambda n: n.startswith("_build_")),
    ("dedup", lambda n: n.startswith("dedup_") or n in (
        "q_incremental_dedup", "q_containment", "q_prefix_dups",
        "q_minhash_acc", "q_dedup_clusters")),
    ("ann-pq", lambda n: n.startswith(
        ("ann_", "q_pq_", "q_ann_", "q_sq_", "q_mrl_")) or n in (
        "q_vector_quantize", "q_ivf_stats", "q_ivf_purity",
        "q_centroid_drift", "q_kmeans_step", "q_lsh_cosine",
        "q_incremental_ivf", "q_embed_stats")),
    ("text", lambda n: n in (
        "text_stats", "lang_id", "token_count", "doc_fingerprint") or
        n.startswith(("q_chunk", "q_bpe", "q_zipf", "q_pmi", "q_quality",
                      "q_fluency", "q_boilerplate", "q_ngram", "q_gopher",
                      "q_stopword", "q_token"))),
    ("corpus", lambda n: n.startswith(
        ("q_source_", "q_pack_", "q_novelty", "q_decontaminate", "q_funnel",
         "q_sample", "q_weighted", "q_temperature", "q_media", "media_",
         "q_train_order", "q_mixture_budget"))),
    ("linking", lambda n: n in (
        "chain_link", "expand_roles", "expand_updates", "link_pairs",
        "parse_events", "watermark_emitted", "eviction_survivors",
        "degree_histogram") or n.startswith(("q_trace", "q_grandparent"))),
]


def family_of(name: str) -> str:
    for fam, pred in FAMILIES:
        if pred(name):
            return fam
    return "relational-analytics"


def slope(points):
    """Least-squares slope of ln(sec) on ln(sf)."""
    xs = [math.log(sf) for sf, _ in points]
    ys = [math.log(max(t, 1e-4)) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "-o"]
    out = Path("SCALING_CURVE.json")
    if "-o" in sys.argv:
        out = Path(sys.argv[sys.argv.index("-o") + 1])
        args.remove(str(out))
    runs = []
    for path in args:
        j = json.loads(Path(path).read_text())
        # Bench emits "sf" as the data dir (".../sf0.01"); accept a bare
        # number too.
        sf = float(str(j["sf"]).rstrip("/").rsplit("sf", 1)[-1])
        runs.append((sf, j["queries"]))
    runs.sort()
    assert len(runs) >= 2, "need at least two bench JSONs"

    names = set.intersection(*[set(q) for _, q in runs])
    per_entry = {}
    for name in sorted(names):
        pts = [(sf, q[name]) for sf, q in runs]
        per_entry[name] = {
            "sec": {str(sf): q[name] for sf, q in runs},
            "exponent": round(slope(pts), 3),
            "last_slope": round(slope(pts[-2:]), 3),
        }
    flagged = sorted(
        n for n, e in per_entry.items()
        if e["exponent"] > FLAG_EXPONENT
        and e["sec"][str(runs[-1][0])] > FLAG_MIN_SEC)
    flagged_tail = sorted(
        n for n, e in per_entry.items()
        if e["last_slope"] > FLAG_EXPONENT
        and e["sec"][str(runs[-1][0])] > FLAG_MIN_SEC)

    fams = {}
    for name, e in per_entry.items():
        fams.setdefault(family_of(name), []).append(name)
    per_family = {}
    for fam, members in sorted(fams.items()):
        sums = [(sf, sum(q[m] for m in members)) for sf, q in runs]
        per_family[fam] = {
            "n_entries": len(members),
            "sec": {str(sf): round(t, 3) for sf, t in sums},
            "exponent": round(slope(sums), 3),
            "last_slope": round(slope(sums[-2:]), 3),
        }

    result = {
        "sfs": [sf for sf, _ in runs],
        "flag_exponent": FLAG_EXPONENT,
        "flag_min_sec": FLAG_MIN_SEC,
        "per_family": per_family,
        "flagged": flagged,
        "flagged_tail": flagged_tail,
        "per_entry": per_entry,
    }
    out.write_text(json.dumps(result, indent=1) + "\n")

    print(f"{'family':24s} {'n':>3s} "
          + " ".join(f"sf{sf:<7g}" for sf, _ in runs) + " exponent  tail")
    for fam, e in per_family.items():
        print(f"{fam:24s} {e['n_entries']:3d} "
              + " ".join(f"{e['sec'][str(sf)]:9.3f}" for sf, _ in runs)
              + f" {e['exponent']:8.2f} {e['last_slope']:5.2f}")
    print(f"\nflagged super-linear fit (> {FLAG_EXPONENT}, > {FLAG_MIN_SEC}s "
          f"at sf{runs[-1][0]:g}): {flagged or 'none'}")
    print(f"flagged super-linear tail (last-decade slope > {FLAG_EXPONENT}): "
          f"{flagged_tail or 'none'}")
    return 1 if (flagged or flagged_tail) else 0


if __name__ == "__main__":
    sys.exit(main())
