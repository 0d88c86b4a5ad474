#!/usr/bin/env python3
"""Same-session stock-Spark baseline at round close (VERDICT r7 task 1).

BASELINE.md's numbers were measured once, on 2026-08-12; the r7 verdict's
re-runs showed the host drifts +-30% BETWEEN rounds (pure-function control
queries moved 1.26-1.45x with zero code change), so a fixed bar lets drift
masquerade as regression — or hide one — and pollutes the 2x gate in both
directions. This tool re-measures the stock 15-shape battery in the SAME
session state as the graft bench it is compared against: same host, same
hour, and the same cpus/sf config read from bench_detail.json. It emits
BASELINE_r<N>.json with per-shape and aggregate ratios computed against
those same-run stock numbers. Performance adjudication should read THESE
ratios; BASELINE.md stays as the protocol document and twin-mapping record.

Usage: python3 tools/baseline_close.py <round> [bench_detail.json]
Driver-side tooling only (pyspark via tools/baseline_bench.py).
"""
import json
import os
import subprocess
import sys
import time

# Baseline shape -> graft twin, the head-to-head mapping BASELINE.md fixed
# in round 2 (the twins obey the oracle determinism rules, so ratios are a
# conservative upper bound on engine overhead).
TWINS = {
    "B1_scan_agg": "d1_agg_basic",
    "B2_filtered_agg": "b2_filter_pred",
    "B3_join3": "c1_join_inner",
    "B4_join_bcast": "c2_join_broadcast",
    "B5_win_topk": "e9_win_topk_group",
    "B6_global_topk": "f2_topk",
    "B7_distinct": "d3_agg_distinct",
    "B8_rollup": "d6_agg_rollup",
    "B9_except": "g4_except",
    "B10_json": "h9_fn_json",
    "B11_timebucket": "i2_window_tumbling_batch",
    "B12_lag_sessionize": "i4_window_session_batch",
    "B13_exact_dedup": "j1_dedup_exact",
    "B14_cosine_topk": "j8_sim_topk",
    "B15_anti_join": "c7_join_anti",
}


def main():
    rnd = int(sys.argv[1])
    detail_path = sys.argv[2] if len(sys.argv) > 2 else "bench_detail.json"
    detail = json.load(open(detail_path))
    sf = detail.get("sf", "/root/testdata/sf0.1")
    cpus = str(detail.get("cpus", os.environ.get("SPARK_GRAFT_CPUS", "32")))

    # "same session" is only as true as the detail file is fresh: warn when
    # the graft numbers were taken more than 30 min before the stock ones
    age = time.time() - os.path.getmtime(detail_path)
    if age > 1800:
        print(f"baseline_close: WARNING {detail_path} is {age/60:.0f} min old "
              "— re-run graft.Bench first for a true same-session ratio")

    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_bench.py")
    out = subprocess.run([sys.executable, tool, sf, cpus],
                         capture_output=True, text=True, check=True)
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')]
    stock = json.loads(lines[-1])

    graft_q = detail.get("queries", {})
    shapes = []
    for b, g in TWINS.items():
        bs = stock["queries"].get(b)
        gs = graft_q.get(g)
        ok = bs and gs is not None and gs > 0
        shapes.append({
            "baseline": b, "stock_sec": bs, "twin": g, "graft_sec": gs,
            "ratio": round(gs / bs, 3) if ok else None,
        })
    stock_total = sum(s["stock_sec"] for s in shapes if s["stock_sec"])
    graft_total = sum(s["graft_sec"] for s in shapes
                      if s["graft_sec"] and s["graft_sec"] > 0)
    result = {
        "round": rnd,
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf": sf,
        "cpus": cpus,
        "detail_age_sec": round(age),
        "protocol": ("stock 15-shape battery re-run in the same session "
                     "state (host/hour/config) as the bench_detail it is "
                     "compared against; ratios are same-run, immune to "
                     "cross-round host drift"),
        "stock_total_sec": round(stock_total, 3),
        "graft_twin_total_sec": round(graft_total, 3),
        "aggregate_ratio": round(graft_total / stock_total, 3),
        "shapes": shapes,
    }
    path = f"BASELINE_r{rnd:02d}.json"
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"baseline_close: wrote {path} — aggregate "
          f"{result['aggregate_ratio']}x (stock {stock_total:.2f}s, graft "
          f"twins {graft_total:.2f}s, {len(shapes)} shapes, cpus={cpus})")
    rated = sorted((s for s in shapes if s["ratio"]), key=lambda s: -s["ratio"])
    for s in rated[:3]:
        print(f"  slowest vs stock: {s['twin']:28s} {s['ratio']:5.2f}x "
              f"({s['stock_sec']:.3f}s stock, {s['graft_sec']:.3f}s graft)")
    over = [s for s in rated if s["ratio"] > 2.0]
    if over:
        print("  WARNING: above the 2x gate vs SAME-RUN stock (investigate): "
              + ", ".join(f"{s['twin']} {s['ratio']}x" for s in over))


if __name__ == "__main__":
    main()
