#!/usr/bin/env python3
"""Scale soak gate: judge a graft.Bench run against per-query budgets.

Usage: python3 tools/soak_gate.py <bench.json> <bench.stderr> [sf3]

Default budgets are the sf1 set; pass "sf3" as the third argument to
judge the stateful-tier scale rung (30x sf0.1) against SF3_BUDGETS.

Fails (exit 1) when:
  - any expected soak query is missing from the artifact (crash/OOM);
  - the artifact's "failed" list is non-empty, or any stderr run line
    is marked FAILED (graft.Bench records per-query Throwables both
    ways — a crashed query otherwise looks like a deceptively fast
    wall time);
  - any query exceeds its wall-clock ceiling (seconds);
  - any run line reports disk spill above SPILL_MB (default 1 MB).

Ceilings are 5x the quiet steady-state (min-of-2) sf1 measurements of
SOAK_SF1_r19.json — see the BUDGETS header for the round-19 whole-table
recalibration rationale. Recalibrate deliberately — a ceiling bump must
cite a measurement, not silence a failure.
"""
import json
import re
import sys

# query -> (ceiling_sec, calibration_sec). Recalibrated WHOLE-TABLE in
# round 19 from SOAK_SF1_r19.json — a min-of-2, per-run-probe,
# every-query-quiet-bracketed clean-tree run — after the x117
# adjudication showed the r15-era single-shot calibrations carried the
# first-run JVM transient (X117_TRANSIENT_r19.json: first runs 2-13x
# their steady state; e.g. x115's old 30.79 vs 8.00 steady, x131's
# 57.54 vs 14.24, and x117's 103.27 was additionally CONTENDED — 26.4s
# solo that same r15 round). One rule, one provenance: calibration =
# the artifact's min-of-2, ceiling = max(15, 5 x calibration) — wide
# enough for quiet-run variance and the residual transient risk on
# both runs, tight enough that a quadratic blowup (the x74 178x / x115
# 60x class this gate exists for) cannot pass. The gate refuses any
# query with no quiet-bracketed run, so a degraded-phase number can
# neither pass nor become a future calibration. Recalibrate
# deliberately — a ceiling bump must cite a measurement, not silence a
# failure.
BUDGETS = {
    "x100_rangejoin_rewrite": (51, 10.08),
    "x103_rangejoin_time": (64, 12.60),
    "x109_quantile_profile": (93, 18.58),
    "x115_prefix_filter_pairs": (41, 8.00),
    "x117_dedup_sweep": (46, 9.14),
    "x118_rangejoin_decimal": (15, 0.73),
    "x119_rangejoin_semi": (15, 1.93),
    "x120_rangejoin_anti": (15, 2.01),
    "x121_reconcile_examples": (16, 3.05),
    "x122_grouped_quantiles": (15, 1.01),
    "x123_block_profile": (15, 0.34),
    "x124_cross_prefix_pairs": (41, 8.15),
    "x125_rangejoin_anti_overlap": (90, 17.91),
    "x126_embedding_checksums": (15, 0.16),
    "x127_guarded_fuzzy": (15, 1.17),
    "x128_guard_accounting": (15, 0.86),
    "x130_rangejoin_overlap_router": (15, 0.23),
    "x131_semdedup_lsh": (72, 14.24),
    "x29_quality_classifier": (29, 5.72),
    "x42_incremental_dedup": (16, 3.10),
    "x43_corpus_funnel": (26, 5.00),
    "x44_merge_upsert": (15, 1.25),
    "x48_packing": (19, 3.79),
    "x49_stats_skipping": (19, 3.73),
    "x53_partitioned_skipping": (15, 2.00),
    "x63_cross_neardup": (42, 8.29),
    "x65_cosine_pairs": (15, 1.87),
    "x69_bpe_train": (15, 1.68),
    "x70_bpe_encode": (15, 1.42),
    "x74_fuzzy_match": (46, 9.20),
    "x75_textrank": (28, 5.40),
    "x88_change_feed": (16, 3.13),
    "x89_bloom_skipping": (15, 2.68),
    "x91_concurrent_sessions": (72, 14.30),
    "x94_dedup_best_quality": (44, 8.64),
}

# The sf3 scale rung (tools/gen_sf1.py <dir> 30 = 30x sf0.1): the
# guarded stateful dedup/ER/ANN subset plus the superlinear-risk tiers
# the round-17 verdict listed (overlap join, profiles, rangejoin
# rewrites, textrank) and the production LSH semdedup arm (x36's exact
# verification arm left the rung in round 19). Every calibration below
# is the quiet-bracketed min of the round-18 rung artifact
# (SOAK_SF3_r18.json, per-run probes; one number per query, quoted
# verbatim in the tuple), and every ceiling is ~4x its calibration
# (two stated exceptions: sub-5s queries keep a 10s-class floor since
# fixed costs dominate their variance, and x115's ceiling also covers
# r17's noisier 53.4s measurement) — one rule, no narrative/table
# drift. The sf1 -> sf3 growth of each
# calibration is EXPLAINED, not just observed — the gate exists to
# catch a growth whose explanation is missing:
#   x42   3.9s  (vs 4.3 sf1: near-linear — state-commit is
#                metadata-only, one history scan per fold)
#   x74  53.9s  (vs 21.5 sf1, 2.5x: block sizes grow with the copy
#                count K; the budget guard bounds within-block pairs)
#   x115 28.7s  (vs 30.8 sf1: the TRUE pair output grows ~K^2 = 9x
#                from sf1's K=10 — real answer rows — but the guarded
#                prefix filter absorbs it; r17 measured 53.4s on a
#                noisier host, the ceiling covers both)
#   x127  1.8s  (guard-bounded by the pair budget: flat)
#   x63  16.8s  (vs 9.2 sf1, 1.8x: bucketed cross-corpus join,
#                sublinear in the candidate cap)
#   x36  66.8s  (the EXACT O(n^2) verification arm by design — n grows
#                3x, comparisons 9x; the production LSH path is x131)
#   x131 80.5s  (first gated measurement of the production LSH arm:
#                8.2GB shuffle, zero spill. The cost IS the corpus's
#                true near-dup mass — 2000 clusters of 90 near-copies
#                = ~8M real pairs to cosine-verify + CC, the same K^2
#                answer-row law as x115. The 813s/57GB-spill collapse
#                this rung caught (fixed nPlanes=8) is what
#                recommendedPlanes sizing now prevents)
#   x26  20.6s  (distributed-CC regime: 30-copy clusters push edges
#                past the driver union-find bound; pointer-doubled
#                label propagation)
#   x94  84.2s  (best-quality representative over the same
#                K^2-growing candidate stream as x115; spans 54.6-84.2
#                across quiet-bracketed runs — min-of-2 variance on a
#                CC-iteration query, the 220s ceiling covers the span)
#   x100 37.7s  (vs 14.9 sf1, 2.5x for 3x data: the rewrite keeps the
#                bucketed band join — linear)
#   x103 38.6s  (vs 15.4 sf1, 2.5x: linear, same rewrite family)
#   x109 44.8s  (vs 17.3 sf1, 2.6x: linear — quantile value-map state
#                is bounded by distinct counts, proven at 30x)
#   x122  5.9s  (vs 1.1 sf1, 5.3x: grouped-quantile state grows with
#                group count x distinct values per group; bounded)
#   x75  10.6s  (vs 6.1 sf1, 1.7x: vocab-bounded PageRank state,
#                edges grow linearly with the corpus)
#   x91   3.9s  (interval-overlap join: the time axis grows with the
#                copy count, so per-bucket session density is
#                SF-invariant and cost is ~linear in session count)
SF3_BUDGETS = {
    "x100_rangejoin_rewrite": (160, 37.7),
    "x103_rangejoin_time": (190, 38.6),
    "x109_quantile_profile": (210, 44.8),
    "x115_prefix_filter_pairs": (200, 28.7),
    "x122_grouped_quantiles": (20, 5.9),
    "x127_guarded_fuzzy": (10, 1.8),
    "x131_semdedup_lsh": (380, 80.5),
    "x26_minhash_dedup_cc": (107, 20.6),
    # x36 left the rung in round 19 (its 66.8s exact arm is a
    # verification-only plan; parity vs the LSH arm is asserted by
    # graft.tools.SemDedupParitySf1 once per round instead)
    "x42_incremental_dedup": (20, 3.9),
    "x63_cross_neardup": (75, 16.8),
    "x74_fuzzy_match": (210, 53.9),
    "x75_textrank": (56, 10.6),
    "x91_concurrent_sessions": (16, 3.9),
    "x94_dedup_best_quality": (220, 84.2),
}


# Quiet-host median of the bench's fixed synthetic calibration probe
# (20M-row hash + shuffle agg at 32 threads) — measured r17. Ceilings
# scale by the artifact's own calibration ratio against this, so a
# uniformly slow host no longer needs post-hoc "host phase" narratives;
# past 2x the artifact is refused outright (no factor can certify it).
REF_CALIBRATION_SEC = 0.55


def main(json_path, err_path, budgets=None):
    budgets = BUDGETS if budgets is None else budgets
    with open(json_path) as f:
        art = json.load(f)
    qs = art.get("queries", {})
    # per-query bracketing probes (SPARK_GRAFT_CALIBRATE_EACH=1): each
    # query run has its own probe, so certification is PER RUN — a
    # query's number is its min over runs whose probe was quiet, and a
    # query with no quiet-bracketed run at all is refused individually.
    # Without them (legacy per-pass probes), a whole-run max/min spread
    # refusal is the only defense against potholes between probes.
    run_times = art.get("runs", {})
    run_probes = art.get("calibration_runs", {})
    per_run = bool(run_times) and bool(run_probes)
    quiet_probe = 2.0 * REF_CALIBRATION_SEC
    failures = []
    calib = sorted(art.get("calibration_sec", []) +
                   [p for ps in run_probes.values() for p in ps])
    host_factor = 1.0
    if calib:
        median = calib[len(calib) // 2]
        spread = max(calib) / max(min(calib), 1e-9)
        ratio = median / REF_CALIBRATION_SEC
        print(f"host calibration: median {median:.2f}s "
              f"(ref {REF_CALIBRATION_SEC}s, ratio {ratio:.2f}x, "
              f"in-run spread {spread:.2f}x, "
              f"{'per-run probes' if per_run else 'per-pass probes'}), "
              f"head={art.get('head_commit', '?')[:12]}"
              f"{' DIRTY' if art.get('git_dirty') else ''}")
        # With per-run probes the global health rules are redundant and
        # point the wrong way: certification happens per query (a number
        # counts only when its own bracketing probe was quiet, and a
        # quiet-bracketed run is at most ~quiet_probe/REF inflated —
        # margin the ceilings already carry), while scaling ceilings UP
        # by a degraded-host ratio is exactly how a false pass could
        # slip in. Per-run mode therefore uses UNSCALED ceilings and no
        # whole-run refusal; only the legacy per-pass mode keeps them.
        if not per_run:
            if spread > 1.5:
                print("SOAK GATE FAIL: host speed changed "
                      f"{spread:.2f}x DURING the run — not certifiable "
                      "(re-run with SPARK_GRAFT_CALIBRATE_EACH=1 for "
                      "per-run certification)")
                sys.exit(1)
            if ratio > 2.0:
                print(f"SOAK GATE FAIL: host {ratio:.2f}x slower than "
                      "the quiet reference — too degraded to certify")
                sys.exit(1)
            host_factor = max(1.0, ratio)
            if host_factor > 1.0:
                print(f"ceilings scaled {host_factor:.2f}x for host speed")
    print(f"{'query':32s} {'sec':>8s} {'ceiling':>8s}  verdict")
    for name, (raw_ceil, cal) in sorted(budgets.items()):
        ceil = raw_ceil * host_factor
        if name not in qs:
            failures.append(f"{name}: MISSING from artifact (crash/OOM?)")
            print(f"{name:32s} {'--':>8s} {ceil:8.1f}  MISSING")
            continue
        t = qs[name]
        note = ""
        # Certify-or-refuse, PER QUERY (the live-proven bench-gate rule,
        # adopted for the soaks after SOAK_SF3_r18b recorded x115
        # swinging 187.9 -> 59.0s between runs with max_spread 2.39
        # unenforced): a query whose EVERY bracketing probe was degraded
        # is uncertifiable regardless of its ceiling verdict — a
        # within-ceiling pass on an all-degraded phase would launder a
        # contended reading into the artifact (and the rung artifacts
        # are where future calibrations/ceilings are quoted from; x117's
        # contended-provenance 516s ceiling is how a 10x regression
        # could have passed silently). With at least one quiet run:
        # host inflation can only make a min SLOWER, never faster, so a
        # within-ceiling min is trustworthy, and an OVER stands
        # certified on the quiet run's own probe. The adjudication is
        # binary, not a re-min: qs[name] is already the min over ALL
        # runs, so a min over any quiet SUBSET can never come in lower
        # and flip the verdict.
        if per_run and name in run_times and name in run_probes:
            pairs = list(zip(run_times[name], run_probes[name]))
            quiet = [tt for tt, p in pairs if p <= quiet_probe]
            if not quiet:
                failures.append(
                    f"{name}: {t:.1f}s (ceiling {ceil:.1f}s) has NO "
                    f"quiet-bracketed run (probes "
                    f"{[round(p, 2) for _, p in pairs]} all > "
                    f"{quiet_probe:.2f}s) — uncertifiable, re-run")
                print(f"{name:32s} {t:8.2f} {ceil:8.1f}  NO-QUIET-RUN")
                continue
            if t > ceil:
                note = (f" (certified: best quiet run {min(quiet):.2f}s "
                        f"over {len(quiet)}/{len(pairs)} quiet runs)")
        verdict = "ok" if t <= ceil else "OVER"
        # in-window stall (r19+ artifacts): starvation seconds of the
        # exact run whose wall time the artifact records. On an OVER it
        # is the first adjudication to read — a stall near the excess is
        # the probe-invisible environment class (re-run), a ~0 stall
        # points at the code.
        stall = art.get("stall", {}).get(name)
        if t > ceil:
            stall_note = (f"; min-run stall {stall:.1f}s"
                          if stall is not None else "")
            failures.append(
                f"{name}: {t:.1f}s exceeds ceiling {ceil:.1f}s "
                f"(calibration {cal:.1f}s{stall_note})")
        elif stall is not None and stall > 1.0:
            note += f" (stall {stall:.1f}s in recorded run)"
        print(f"{name:32s} {t:8.2f} {ceil:8.1f}  {verdict}{note}")
    for q in art.get("failed", []):
        failures.append(f"{q}: query FAILED during the bench run "
                        f"(artifact 'failed' list)")
    spill_mb_limit = 1.0
    spill_re = re.compile(r"\[bench\] (\S+)\s+run\d+.*spill=\s*([0-9.]+)MB")
    fail_re = re.compile(r"\[bench\] (\S+) run\d+ FAILED: (.*)")
    with open(err_path) as f:
        for line in f:
            m = spill_re.search(line)
            if m and float(m.group(2)) > spill_mb_limit:
                failures.append(
                    f"{m.group(1)}: disk spill {m.group(2)}MB > "
                    f"{spill_mb_limit}MB")
            mf = fail_re.search(line)
            if mf:
                failures.append(
                    f"{mf.group(1)}: FAILED — {mf.group(2)[:200]}")
    extras = [q for q in qs if q not in budgets]
    if extras:
        print(f"note: unbudgeted queries in artifact (add ceilings): "
              f"{', '.join(sorted(extras))}")
    if failures:
        print("\nSOAK GATE FAIL:")
        for f_ in failures:
            print(f"  - {f_}")
        sys.exit(1)
    print(f"\nSOAK GATE PASS: {len(budgets)} queries within budget, "
          f"zero spill")


if __name__ == "__main__":
    if len(sys.argv) not in (3, 4):
        print(__doc__)
        sys.exit(2)
    table = None
    if len(sys.argv) == 4:
        if sys.argv[3] != "sf3":
            print(__doc__)
            sys.exit(2)
        table = SF3_BUDGETS
    main(sys.argv[1], sys.argv[2], table)
