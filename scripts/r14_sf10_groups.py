#!/usr/bin/env python3
"""Partition the SparkEntry query surface into family-sized JVM groups for
the sf10 full-surface probe (scripts/r14_sf10_full.sh).

Groups are prefix/registry families so session memos amortize within a
JVM (all dedup_* queries share the shingle index; all ann/pq/sq share the
normed + centroid builds). The build set runs as its own group with the
full _build_* list, matching the r13 full-set attribution.

Usage: r14_sf10_groups.py <oracle_sql.json> <outdir>
Writes group_builds.txt + group_q<NN>_<name>.txt (comma-joined ONLY lists).
"""
import json
import sys
from pathlib import Path

BUILDS = ",".join([
    "_build_msgs", "_build_links", "_build_linked", "_build_shingle_index",
    "_build_shingle_inter", "_build_simhash", "_build_normed",
    "_build_exact_pairs", "_build_ivf_pairs", "_build_ivf1_pairs", "_build_kmeans_cents",
    "_build_ivf_assign", "_build_ivf2_assign", "_build_km_pairs",
    "_build_km_assign", "_build_doc_bigrams", "_build_unigrams",
    "_build_bpe_vocab", "_build_ann_topk", "_build_pq_codes",
    "_build_pq_dtab", "_build_pq_top", "_build_pq_ivf_top",
    "_build_pq_member", "_build_pq_cb_train", "_build_pq_trained_codes",
    "_build_pq_trained_dtab", "_build_pq_trained_top",
    "_build_pq_ivf_trained_top", "_build_pq_res_top", "_build_strict_links",
    "_build_trace_depth", "_build_shingle_sizes", "_build_shingle_all",
    "_build_co_edges", "_build_media_meta", "_build_sq_codes",
    "_build_sq_top", "_build_sq_member", "_build_sq_ivf_top",
    "_build_knn_edges", "_build_cc_labels", "_build_knn_cc",
    "_build_bm25_stats",
])

FAMILIES = [
    ("chain", lambda n: n in (
        "chain_link", "link_pairs", "expand_roles", "expand_updates",
        "parse_events", "degree_histogram", "watermark_emitted",
        "eviction_survivors") or "trace" in n or "grandparent" in n or
        "depth" in n or n.startswith("q_link") or n.startswith("q_chain")),
    ("dedup", lambda n: n.startswith("dedup_") or "dedup" in n or
        n in ("q_containment", "q_prefix_dups", "q_para_dedup",
              "q_minhash_acc", "q_capped_pairs", "q_dup_spans",
              "q_cluster_canon", "q_boilerplate_grams", "q_source_overlap",
              "q_ngram_novelty", "q_dup_ngrams", "q_dup_rate_by_source")),
    ("ann", lambda n: n.startswith("ann_") or n.startswith("q_pq") or
        n.startswith("q_sq") or n.startswith("q_ivf") or
        n.startswith("q_ann") or n.startswith("q_mrl") or
        n.startswith("q_rerank") or n in (
            "q_vector_quantize", "q_kmeans_step", "q_lsh_cosine",
            "q_hard_negatives", "q_pca_power", "q_whiten_check")),
    ("graph", lambda n: n.startswith("q_knn") or n.startswith("q_cc") or
        "cluster" in n or "triangle" in n or "label_prop" in n or
        n.startswith("q_co_")),
    ("text", lambda n: n.startswith("q_bpe") or n.startswith("q_bm25") or
        "token" in n or "lang" in n or "quality" in n or "tfidf" in n or
        n.startswith("q_text") or n in ("text_stats", "token_count",
            "q_fingerprint", "q_top_ngrams", "q_chunk_embed",
            "q_stopword_ratio")),
    ("curation", lambda n: "curation" in n or "mixture" in n or
        "pack" in n or "dsir" in n or "curriculum" in n or "scrub" in n or
        "pii" in n or n.startswith("q_decontaminate") or
        n.startswith("q_shard")),
    ("media", lambda n: n.startswith("q_media") or n.startswith("q_frame")
        or "modal" in n),
]


def main(oracle_json: str, outdir: str) -> None:
    names = sorted(json.load(open(oracle_json)).keys())
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "group_builds.txt").write_text(BUILDS)
    assigned = set()
    groups = []
    for fam, pred in FAMILIES:
        g = [n for n in names if n not in assigned and pred(n)]
        assigned.update(g)
        groups.append((fam, g))
    rest = [n for n in names if n not in assigned]
    # split the relational/streaming remainder into ~28-query chunks
    for i in range(0, len(rest), 28):
        groups.append((f"rest{i // 28}", rest[i:i + 28]))
    for i, (fam, members) in enumerate(gr for gr in groups if gr[1]):
        (out / f"group_q{i:02d}_{fam}.txt").write_text(",".join(members))
        print(f"group_q{i:02d}_{fam}: {len(members)}")
    total = sum(len(g) for _, g in groups)
    print(f"total {total} of {len(names)}")
    assert total == len(names)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
