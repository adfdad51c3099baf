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
# the artifact's min-of-2 (printed here rounded to 2dp for the table;
# the RULE applies to the UNROUNDED artifact value), ceiling =
# max(15, ceil(5 x unrounded calibration)) with ceil always rounding
# UP — which is why a few printed pairs look one second off the
# rounded column (e.g. x103: artifact min 12.603398 -> 63.02 ->
# ceiling 64, not 5 x 12.60 = 63). Any future recalibration must
# apply the rule to the artifact's raw minima, never to the rounded
# calibration column, or ceilings silently shift. Ceilings are wide
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
# verification arm left the rung in round 19). Recalibrated to the
# SAME rule as the sf1 table in round 19: calibration = the MIN over
# the committed quiet min-of-2 rung artifacts (SOAK_SF3_r18.json and
# the stall-instrumented SOAK_SF3_r19b.json, host ratio 0.77x — the
# min-of-k estimator the query timings themselves use, across runs we
# can certify), ceiling = max(15, 5 x calibration). The r19b run
# materially LOWERED several calibrations the r18-era numbers had
# carried inflated (x94 84.2 -> 34.3, x131 80.5 -> 58.1, x122 5.9 ->
# 2.8 — the first-run-transient/stall class the round adjudicated),
# and its per-query stall annotations mark what residue remains
# (x109's recorded run carried 7.3s of sampled stall). The sf1 -> sf3
# growth story per query is unchanged from the r18 analysis: state
# commits are metadata-only (x42 flat), guarded tiers are
# budget-bounded (x127/x74), true-pair output grows ~K^2 as real
# answer rows absorbed by the prefix filter (x115) and the LSH
# near-dup mass (x131), CC is pointer-doubled past the driver bound
# (x26), profiles are distinct-count-bounded (x109/x122), PageRank is
# vocab-bounded (x75), and the overlap join's per-bucket density is
# SF-invariant (x91).
SF3_BUDGETS = {
    "x100_rangejoin_rewrite": (189, 37.70),
    "x103_rangejoin_time": (193, 38.60),
    "x109_quantile_profile": (213, 42.53),
    "x115_prefix_filter_pairs": (144, 28.70),
    "x122_grouped_quantiles": (15, 2.80),
    "x127_guarded_fuzzy": (15, 1.62),
    "x131_semdedup_lsh": (291, 58.09),
    "x26_minhash_dedup_cc": (103, 20.60),
    # x36 left the rung in round 19 (its exact arm is a
    # verification-only plan; parity vs the LSH arm is asserted by
    # graft.tools.SemDedupParitySf1 once per round instead)
    "x42_incremental_dedup": (20, 3.90),
    "x63_cross_neardup": (84, 16.80),
    "x74_fuzzy_match": (254, 50.73),
    "x75_textrank": (53, 10.60),
    "x91_concurrent_sessions": (19, 3.76),
    "x94_dedup_best_quality": (172, 34.31),
}


# Quiet-host reference of the bench's fixed synthetic calibration probe
# (50M-row hash + shuffle agg at 32 threads), measured with the SAME
# estimator the artifacts record (r19 ADVICE fix: the r17-era 0.55 was
# a single-sample figure, systematically above the min-of-k points the
# artifacts now carry — a silent bias toward stricter gating).
# Re-measured r20 via graft.tools.ProbeRef on two quiet sessions:
# min-of-3 medians 0.463 / 0.433, min-of-2 medians 0.479 / 0.455, raw
# spreads 1.28 / 1.38. Reference = 0.45 (between the two min-of-3
# medians; the min-of-2 per-run probes sit ~5% above it, well inside
# the 2.0x quiet threshold). Ceilings scale by the artifact's own
# calibration ratio against this, so a uniformly slow host no longer
# needs post-hoc "host phase" narratives; past 2x the artifact is
# refused outright (no factor can certify it).
REF_CALIBRATION_SEC = 0.45
REF_CALIBRATION_ESTIMATOR = "min3"


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
    est = art.get("calibration_estimator")
    if est is not None and est != REF_CALIBRATION_ESTIMATOR:
        print(f"WARNING: artifact calibration_estimator '{est}' != "
              f"reference '{REF_CALIBRATION_ESTIMATOR}' — host-ratio and "
              f"quiet-probe comparisons are estimator-mismatched")
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
        # points at the code. CAVEAT: the sampler's oversleep meter
        # counts the benched JVM's OWN GC/safepoint pauses as stall, so
        # a positive stall must be cross-checked against the run line's
        # gc= seconds in stderr before being attributed to the host — a
        # code change that introduces heavy GC would otherwise read as
        # an environment problem. The failure line carries the recorded
        # run's gc when the artifact has it, for exactly that check.
        stall = art.get("stall", {}).get(name)
        gc = art.get("gc", {}).get(name)
        if t > ceil:
            stall_note = (f"; min-run stall {stall:.1f}s"
                          if stall is not None else "")
            if stall is not None and gc is not None:
                stall_note += (f", gc {gc:.1f}s — attribute stall to the "
                               f"host only net of gc")
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
