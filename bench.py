"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with a noop write (full plan execution, no
driver-side collect) — what a cluster job would do.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


shared_r7 = [
    "doc_incremental_dedup", "doc_dup_clusters", "emb_dup_pairs",
    "doc_vocab_top", "seq_chrom_rle", "seq_geno_gt", "doc_domain_mix",
    "seq_row_ranges", "seq_col_data", "doc_repetition",
    "doc_pack_batches", "doc_stratified_sample", "doc_contamination",
    "doc_pii_scrub", "doc_lm_score", "mm_media_meta",
    "mm_feature_extract", "mm_real_decode", "seq_af_at_allele",
    "seq_per_allele_counts", "seq_af_ac_missing", "seq_num_allele",
    "seq_summary_chrom", "seq_qual_quantiles", "seq_filter_chrom_range",
    "seq_filter_cond", "seq_filter_pos", "seq_filter_ranges",
    "seq_chrom_pos2", "seq_dosage_alt", "seq_allele_string",
    "seq_dosage_sparse", "seq_dosage_sparse2", "seq_block_apply",
    "seq_sliding_windows", "seq_window_dosage", "seq_merge_variant_af",
    "seq_merge_sample_af", "seq_digest_chrom", "seq_dosage_af",
    "seq_pack_genotypes", "gds_read_af", "ev_hourly_by_type",
    "ev_sessionize", "ev_asof_join", "seq_interval_annotate",
    "doc_token_count", "dedup_exact", "doc_quality", "doc_lang_guess",
    "doc_minhash_dups", "doc_ngram_dups", "doc_simhash",
    "doc_fingerprint", "emb_cosine_topk", "emb_ivf_topk",
    "emb_ivf_topk_full", "doc_normalize", "q1_pricing_summary",
    "q3_top_revenue", "q5_region_volume", "q_topk_per_group",
    "seq_allele_freq_ref", "seq_allele_count_minor",
    "seq_missing_variant", "seq_missing_sample",
]
# r8 additions on top of r7 (BENCH_r08.json's 70-name set = r7 + these):
shared_r8 = shared_r7 + [
    "doc_incremental_exact", "seq_header_catalogs", "doc_boilerplate",
    "emb_kmeans_cells",
]
# r9 additions on top of r8 (BENCH_r09.json's 73-name set = r8 + these):
shared_r9 = shared_r8 + [
    "emb_semantic_dedup", "emb_pq_codes", "emb_pq_adc_topk",
]
# r10 additions on top of r9 (the 89-name set = r9 + these; the
# full round-10 registry as the driver records BENCH_r10.json —
# keep in lockstep with _queries() or the subtotal silently
# under-covers the registry while claiming it):
shared_r10 = shared_r9 + [
    "emb_incremental_dedup", "emb_ivf_pq_topk",
    "emb_ivf_pq_residual_topk", "emb_knn_join", "emb_ivf_pq_rerank",
    "emb_knn_join_pq", "doc_chunk_windows",
    "doc_bm25_topk", "doc_dsir_weights", "doc_window_dups",
    "seq_ld_pairs", "seq_ld_prune", "seq_grm_pairs",
    "seq_ld_pairs_packed", "seq_ibs_pairs", "seq_king_kinship",
]
# r11 additions on top of r10 (keep in lockstep with _queries()):
shared_r11 = shared_r10 + [
    "seq_ld_prune_greedy", "seq_grm_sketch", "emb_pq_drift_probe",
    "seq_pca_loadings", "seq_pca_project", "seq_ibd_mom",
    "seq_inbreeding", "seq_hwe",
]
# r12 additions on top of r11 (keep in lockstep with _queries()):
shared_r12 = shared_r11 + [
    "seq_fst", "seq_fst_genome", "seq_fst_windows",
    "seq_ld_composite", "seq_ld_em", "seq_pca_corr",
    "seq_inbreeding_weir", "seq_unrelated",
]
# r13 additions on top of r12 (keep in lockstep with _queries()):
shared_r13 = shared_r12 + [
    "seq_ibd_mle", "seq_pi_windows", "seq_tajima_d",
    "seq_eigmix", "seq_admix_prop", "doc_hybrid_topk",
    "seq_tstv", "seq_dist_ibs", "seq_grm_beta", "seq_roh",
    "seq_singletons", "seq_allele_switch",
    "seq_assoc_allelic", "seq_assoc_trend", "seq_assoc_linear",
    "seq_mendel", "seq_dup_discord", "seq_ld_score",
    "seq_assoc_model", "seq_froh", "seq_snp_density", "seq_ld_decay",
    "seq_inbreeding_mle", "seq_diff_site", "seq_diff_indv",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry_mod
    from seqarray_spark.session import get_spark

    spark = get_spark("seqarray-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/shuffle-service warmup for EVERY query family at the
    # smallest SF, so per-query numbers measure the plan, not first-run
    # compilation (a cold first touch once inflated doc_quality ~9x).
    for name, fn in entry_mod.queries().items():
        try:
            materialize(fn(spark, "/root/testdata/sf0.001"))
        except Exception:
            pass

    # best-of-3 per query: a single sample is vulnerable to GC pauses /
    # background load, and two samples still let one pause set the
    # number; the min of three runs is a stable plan-cost proxy
    # (cross-session shared-query subtotals previously drifted ~12% with
    # zero code change — round-5 verdict — purely from session state).
    # Between queries, reset to a fresh-state scope deterministically:
    # Python gc runs the release_on_gc unpersists, clearCache sweeps the
    # rest, and an explicit JVM System.gc() compacts the executor heap so
    # earlier queries' allocation debris can't tax later queries'
    # measurements (otherwise per-query numbers depend on when the JVM
    # decides to collect — observed 3-5x swings on persist-using ops).
    import gc

    timings: dict[str, float] = {}
    # per-query raw samples (sorted asc): the r11 verdict measured a
    # 1.68x same-code host variance band, making single-number
    # round-over-round deltas unreadable — the spread lets the next
    # verdict separate code movement from host noise per query.
    spreads: dict[str, list[float]] = {}
    for name, fn in entry_mod.queries().items():
        gc.collect()
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        samples: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                materialize(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            except Exception as e:
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                break
        timings[name] = round(min(samples), 3) if samples else -1.0
        spreads[name] = [round(s, 3) for s in sorted(samples)]

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Pinned cross-round subtotals (VERDICT r8 item 5): the registry grows
    # every round, so the headline total is not comparable round-over-round
    # — fixed per-query session costs dilute it (the r8 +13% decomposition).
    # These subtotals are computed over FROZEN query sets so the next
    # verdict can read like-for-like deltas straight off the BENCH file.
    # BENCH_r07.json's query set (66 names), recorded verbatim:

    def subtotal(names: list[str]) -> float | None:
        vals = [timings[n] for n in names if n in timings and timings[n] >= 0]
        return round(sum(vals), 3) if len(vals) == len(names) else None

    payload = {
        "metric": "total_headline_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # protocol: per-query best-of-3 after a full-registry sf0.001
        # warmup pass, gc+clearCache+System.gc() between queries;
        # "queries"/subtotals are the per-query min, "spreads" the raw
        # sorted samples
        "protocol": "best-of-3",
        "spreads": spreads,
        "shared_r7_subtotal": subtotal(shared_r7),
        "shared_r8_subtotal": subtotal(shared_r8),
        "shared_r9_subtotal": subtotal(shared_r9),
        "shared_r10_subtotal": subtotal(shared_r10),
        "shared_r11_subtotal": subtotal(shared_r11),
        "shared_r12_subtotal": subtotal(shared_r12),
        "shared_r13_subtotal": subtotal(shared_r13),
    }
    print(json.dumps(payload))
    # self-archive (VERDICT r10 item 3): the driver's BENCH_r{N}.json
    # capture truncates long lines, losing exactly the newest queries'
    # numbers two rounds running — so the full dict is also written
    # into the repo where it survives verbatim (committed each round)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_local.json"), "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as e:
        print(f"bench: BENCH_local.json not written: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
