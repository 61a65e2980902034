"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is one compact JSON object:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
kept small (the driver captures only the output tail — r4's single giant
line overflowed it and recorded ``parsed: null``; r5's slope line printed
before the headline was cut mid-JSON). r6 contract: the COMPLETE record
(all per-query timings, scale slope, time ratios, DuckDB timings when
measured) is written to ``BENCH_FULL.json`` and ``SLOPE.json`` next to
this script — committed files, never size-capped. The stdout tail keeps
only the headline line, whose ``queries`` map is packed slowest-first
under a hard byte budget so it ALWAYS parses regardless of roster size
(``n`` = full roster count; ``queries_inline`` < ``n`` means the rest is
in BENCH_FULL.json).

``value`` is the total wall-clock of the headline suite. Each query is
forced with a count() (no driver-side collect of the payload — the point is
plan execution time, not Arrow transfer). Set BENCH_DUCKDB=1 to also time
the DuckDB oracle for each query (recorded under "duckdb" in the JSON, used
to maintain BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # Two cheap queries lead the suite so the FIRST heavyweight entry
    # doesn't absorb the JVM's global warmup (shuffle machinery, codegen
    # infra, C2 tiering) into its recorded time — per the steady-state
    # methodology below, that cost is a JVM property, not plan cost.
    # Each query is still warmed once and timed min-of-2 regardless of
    # position (measured: the flagship records 5.3s when first on a cold
    # JVM vs 3.7s mid-suite, identical plan).
    "g5_window_funcs",
    "g10_json",
    "xbrl_fact_pipeline",
    "xbrl_shredder_roundtrip",
    "xbrl_extract_e2e",
    "xbrl_dedup_exact",
    "xbrl_dedup_bucketed",
    "xbrl_fuzzy_dedup",
    "g1_dedup_keep",
    "g2_jaccard",
    "g82_containment",
    "g84_ppjoin",
    "g90_containment_dedup",
    "g2_cluster_dedup",
    "g2_minhash_lsh",
    "g2_simhash",
    "g2_recall_report",
    "g94_crossdup",
    "g101_winnow_pairs",
    "g106_corpus_sim",
    "g97_cdc_chunks",
    "g97_cdc_report",
    "g69_image_dhash",
    "g69_image_dedup",
    "g96_image_phash",
    "g96_phash_dedup",
    "g70_audio_fp",
    "g70_audio_dedup",
    "g71_video_hashes",
    "g71_video_dedup",
    "g3_cosine_topk",
    "g3_lsh_topk",
    "g3_ivf_topk",
    "g77_knn_join",
    "g80_rrf_fuse",
    "g102_margin_mine",
    "g3_recall",
    "g44_ranking_report",
    "g50_hard_negatives",
    "g42_semantic_decon",
    "g27_semantic_dedup",
    "g4_text_stats",
    "g91_script_profile",
    "g28_quality_classifier",
    "g93_calibration",
    "g95_kappa",
    "g95b_fleiss",
    "g98_bt_scores",
    "g100_bfs_hops",
    "g104_communities",
    "g110_hits",
    "g108_kmv_distinct",
    "g108_kmv_intersect",
    "g108b_kmv_merge",
    "g32_corpus_report",
    "g32_stratum_report",
    "g33_strip_lines",
    "g34_gopher_rules",
    "g35_paragraph_dedup",
    "g4_bm25",
    "g4_surprisal",
    "g4_chunk",
    "g57_html_text",
    "g112_links",
    "g113_host_edges",
    "g60_md_text",
    "g64_url_dedup",
    "g66_domain_report",
    "g67_skew_report",
    "g88_salted_join",
    "g89_collocations",
    "g72_cms_topk",
    "g73_mixture_alloc",
    "g74_stream_topk",
    "g26_dup_spans",
    "g29_vocab",
    "g29_encode",
    "g29_coverage",
    "g26_trim_spans",
    "g14_sample_stratified",
    "g30_temperature_mix",
    "g14_split",
    "g59_cap_per_group",
    "g17_pack_sequences",
    "g18_quantize_int8",
    "g18_quantized_topk",
    "g78_random_projection",
    "g15_decontaminate",
    "g107_multi_decon",
    "g86_bloom_join",
    "g16_curate_e2e",
    "g36_curate_funnel",
    "g20_quality_suite",
    "g20_merge_latest",
    "g21_unpivot",
    "g22_fuzzy_join",
    "g23_incremental_dedup",
    "g24_incremental_neardup",
    "g45_corpus_diff",
    "g46_split_leakage",
    "g47_leakage_safe_split",
    "g48_budget_select",
    "g49_dsir_weights",
    "g5_moving_agg",
    "g6_rollup",
    "g6_grouping_sets",
    "g7_exact_quantiles",
    "g8_tumbling",
    "g8_session",
    "g103_dialogues",
    "g75_funnel",
    "g92_decayed_counts",
    "g81_label_agg",
    "g79_stream_funnel",
    "g76_hist_quantile",
    "g58_stream_quality",
    "g9_asof_join",
    "g111_lpm_join",
    "g83_scd2",
    "g9_asof_forward",
    "g37_kmeans",
    "g38_bigram_lm",
    "g105_kn_surprisal",
    "g39_shuffle_order",
    "g40_repeat_mix",
    "g41_epoch",
    "g65_pagerank",
    "g87_ppr",
    "g85_triangles",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from ferc_xbrl_extractor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # bench times the FINE-GRAINED operators (stable per-op names across
    # rounds); queries() folds them into <=50 gate suites for the driver.
    qs = entrymod.fine_queries()

    # Steady-state measurement: run each query once to warm JIT/codegen
    # (first execution pays one-time class compilation, tens of seconds
    # across the suite), then time the second execution. Cold-start cost
    # is a JVM property, not a property of the plans being graded.
    # Run-to-run variance on a busy 32-thread JVM is ±3× (GC pauses,
    # compaction); report min-of-2 warm runs as the steady-state number.
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        qs[name](spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        # Multi-stage plans (10+ jobs per run) keep warming past the
        # second execution — measured on the curation funnel: reps of a
        # fresh build descend 4.1 -> 3.4 -> 2.9 as codegen'd stages
        # finish JIT'ing. Two extra reps on the slow rows only (>2s)
        # bound the added bench wall-clock while reporting the actual
        # steady state the cheap rows already reach in two.
        if best > 2.0:
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                best = min(best, time.time() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    full_record = {
        "metric": "headline suite wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()),
        "queries": timings,
    }

    # Scale slope: re-time the suite at a second (smaller) scale factor so
    # every bench record carries two scale points per query — the
    # 100×-scale argument needs d(time)/d(data), not one sample. Skipped
    # only if the alternate dir is missing or BENCH_SLOPE=0.
    slope_dir = os.environ.get("BENCH_SLOPE_SF_DIR", "/root/testdata/sf0.01")
    if os.environ.get("BENCH_SLOPE", "1") != "0" and os.path.isdir(slope_dir) and \
            os.path.abspath(slope_dir) != os.path.abspath(sf_dir):
        small: dict[str, float] = {}
        for name in HEADLINE:
            qs[name](spark, slope_dir).count()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, slope_dir).count()
                best = min(best, time.time() - t0)
            small[name] = round(best, 3)
        # Slope goes to a COMMITTED FILE, not stdout: the driver keeps
        # only the final ~2 KB of output, and r5's slope line was cut
        # mid-JSON in the recorded tail. A file is never size-capped.
        slope_record = {
            "record": "slope",
            "sf": float(slope_dir.rstrip("/").rsplit("sf", 1)[-1]),
            "main_sf": sf,
            "queries": small,
            # per-query wall-clock ratio main/small; data ratio is
            # sf/slope.sf (10× by default). Flat ratios (≈1) mean the
            # query is overhead-dominated at this size; the interesting
            # signal is ratios well below the data ratio.
            "time_ratio": {
                n: round(timings[n] / small[n], 2) if small[n] > 0 else None
                for n in HEADLINE
            },
        }
        with open(os.path.join(repo_dir, "SLOPE.json"), "w") as f:
            json.dump(slope_record, f, indent=1)
        full_record["slope"] = slope_record

    if os.environ.get("BENCH_DUCKDB"):
        import duckdb

        con = duckdb.connect()
        for t in entrymod.TABLES:
            con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')")
        oracles = entrymod.fine_oracle_sql()
        duck: dict[str, float] = {}
        for name in HEADLINE:
            if name not in oracles:
                continue
            t0 = time.time()
            con.sql(f"SELECT count(*) FROM ({oracles[name]})").fetchall()
            duck[name] = round(time.time() - t0, 3)
        full_record["duckdb"] = duck
        # r9 verdict item 6: the caveat rides IN the record, not only
        # in BASELINE.md — a naive reader of this map must see it.
        full_record["duckdb_caveat"] = (
            "count(*)-wrapped oracle timings: DuckDB prunes the final "
            "projection under the count, so projection-heavy queries "
            "are UNDERSTATED here. For honest same-work rows use "
            "tools/samework.py (full materialization on both engines); "
            "BASELINE.md's per-row table is measured that way."
        )

    # Drift control (r10 verdict item 1): before overwriting, compare this
    # sitting against the previous BENCH_FULL.json on common queries. The
    # box shows 4-10x sitting-level degradation episodes; a median ratio
    # far from 1.0 flags that cross-record comparisons measure the box,
    # not the code. (Cross-round the ratio also folds in code changes —
    # per-change evidence lives in same-sitting A/Bs, see OPTIMIZATION_*.md.)
    try:
        with open(os.path.join(repo_dir, "BENCH_FULL.json")) as f:
            prev_q = (json.load(f) or {}).get("queries") or {}
        ratios = sorted(
            timings[n] / prev_q[n]
            for n in timings
            if n in prev_q and prev_q[n] > 0
        )
        if ratios:
            full_record["drift_control"] = {
                "vs": "previous BENCH_FULL.json on disk",
                "n_common": len(ratios),
                "median_ratio": round(ratios[len(ratios) // 2], 3),
                "p90_ratio": round(ratios[int(len(ratios) * 0.9)], 3),
            }
    except Exception:
        pass

    # Complete record to a committed file — never size-capped.
    with open(os.path.join(repo_dir, "BENCH_FULL.json"), "w") as f:
        json.dump(full_record, f, indent=1)

    # Headline record LAST and compact, so the driver's tail capture always
    # holds one complete parseable JSON line. The queries map is PACKED
    # under a hard byte budget: whatever the roster size, the line parses;
    # anything shed inline is in BENCH_FULL.json. r11 measurement-reporting
    # fix (timing loop untouched): (a) the tail capture is exactly 2000
    # bytes in every driver record, so the budget rises 1800 -> 1950;
    # (b) inline times carry 1 decimal (full 3-decimal precision stays in
    # BENCH_FULL.json); (c) queries inline in the LATEST committed bench
    # record pack FIRST, then the rest slowest-first — a query reported
    # inline once must never vanish from the stdout map just because the
    # suite got faster around it (r10's PERF marked 13 live queries
    # "dropped" from exactly that reshuffle).
    budget = int(os.environ.get("BENCH_TAIL_BYTES", "1950"))
    prior_inline: set[str] = set()
    try:
        import glob
        import re

        by_round: dict[int, list[str]] = {}
        for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
            m = re.match(r"BENCH_r(\d+)", os.path.basename(p))
            if m:
                by_round.setdefault(int(m.group(1)), []).append(p)
        for p in by_round.get(max(by_round, default=0), []):
            with open(p) as f:
                rec = json.load(f) or {}
            prior_inline |= set(((rec.get("parsed") or {}).get("queries") or {}))
    except Exception:
        prior_inline = set()
    out = {
        "metric": full_record["metric"],
        "value": full_record["value"],
        "unit": "sec",
        "sf": sf,
        "cpus": full_record["cpus"],
        "n": len(timings),
        "full": "BENCH_FULL.json",
        "queries": {},
    }
    by_cost = sorted(
        timings.items(),
        key=lambda kv: (kv[0] not in prior_inline, -kv[1]),
    )
    for name, t in by_cost:
        out["queries"][name] = round(t, 1)
        if len(json.dumps(out, separators=(",", ":"))) > budget:
            del out["queries"][name]
    out["queries_inline"] = len(out["queries"])
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > budget + 32:
        # a BENCH_TAIL_BYTES below the fixed headline overhead must not
        # lose the stdout record after the whole suite already ran
        print("WARN headline line exceeds tail budget", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
