#!/usr/bin/env python3
"""Same-session stock-Spark baseline at round close (VERDICT r7 task 1).

BASELINE.md's numbers were measured once, on 2026-08-12; the r7 verdict's
re-runs showed the host drifts +-30% BETWEEN rounds (pure-function control
queries moved 1.26-1.45x with zero code change), so a fixed bar lets drift
masquerade as regression — or hide one — and pollutes the 2x gate in both
directions. This tool measures BOTH sides of every ratio fresh, back to back, in one
session state: the graft twins via a targeted `graft.Bench` run
(SPARK_GRAFT_ONLY + SPARK_GRAFT_REPEAT) and the stock 15-shape battery via
tools/baseline_bench.py — each shape timed k=5 times, ratios computed on
MEDIANS with [min, max] spreads recorded (r10: single-shot ratios produced
three phantom >2x excursions on sub-second shapes in r9). It emits
BASELINE_r<N>.json; performance adjudication should read THESE ratios;
BASELINE.md stays as the protocol document and twin-mapping record.

Usage: python3 tools/baseline_close.py <round> [bench_detail.json]
(bench_detail.json supplies sf/cpus config and the single-shot battery
numbers recorded for reference; the ratio inputs are measured fresh.)
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


K = 5  # per-shape repeats on BOTH sides; the 2x gate reads medians
K_SF1 = 3  # sf1 shapes run 1-10 s; 3 repeats bound the pass's wall-clock


def measure_twins(repo, sf, cpus, k, rnd):
    """Median-of-k graft twin timings via a targeted graft.Bench run."""
    twin_detail = os.path.join(repo, f".baseline_twins_r{rnd:02d}.json.tmp")
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_ONLY=",".join(TWINS.values()),
               SPARK_GRAFT_REPEAT=str(k),
               SPARK_GRAFT_DETAIL_OUT=twin_detail)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=repo, env=env,
                   capture_output=True, text=True, check=True)
    graft = json.load(open(twin_detail))
    os.unlink(twin_detail)
    return graft


def measure_stock(sf, cpus, k):
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_bench.py")
    out = subprocess.run([sys.executable, tool, sf, cpus, str(k)],
                         capture_output=True, text=True, check=True)
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')]
    return json.loads(lines[-1])


def shape_table(stock, graft):
    graft_q = graft.get("queries", {})
    graft_spread = graft.get("spread", {})
    stock_spread = stock.get("spread", {})
    shapes = []
    for b, g in TWINS.items():
        bs = stock["queries"].get(b)
        gs = graft_q.get(g)
        ok = bs and gs is not None and gs > 0
        shapes.append({
            "baseline": b, "stock_sec": bs, "twin": g, "graft_sec": gs,
            "ratio": round(gs / bs, 3) if ok else None,
            "stock_spread": stock_spread.get(b),
            "graft_spread": graft_spread.get(g),
        })
    return shapes


TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def ensure_sf1(repo, sf):
    """Generate the 10x key-shifted fixture if it isn't there (same layout
    round_close.sh uses, so the two tools share one generation). A
    PARTIAL fixture (interrupted gen_sf1 run — it writes table by table,
    no tmp-then-rename) is regenerated rather than silently reused."""
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    complete = all(os.path.isfile(os.path.join(sf1, f"{t}.parquet"))
                   for t in TABLES)
    if not complete:
        if os.path.isdir(sf1) and os.listdir(sf1):
            print(f"  sf1 fixture at {sf1} is incomplete — regenerating")
        subprocess.run([sys.executable,
                        os.path.join(repo, "tools", "gen_sf1.py"), sf, sf1, "10"],
                       check=True, capture_output=True, text=True)
    return sf1


def main():
    rnd = int(sys.argv[1])
    detail_path = sys.argv[2] if len(sys.argv) > 2 else "bench_detail.json"
    # shared close-session run id (round_close.sh mints one per close so
    # headline/detail/baseline artifacts are provably from ONE session)
    run_id = sys.argv[3] if len(sys.argv) > 3 else None
    detail = json.load(open(detail_path))
    sf = detail.get("sf", "/root/testdata/sf0.1")
    cpus = str(detail.get("cpus", os.environ.get("SPARK_GRAFT_CPUS", "32")))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # Median-of-K graft twin timings, fresh in THIS session (r10: the r9
    # close read single-shot battery numbers for the graft side and
    # produced three phantom >2x ratios on 100-500 ms shapes; both sides
    # of every ratio are now k=5 medians measured back to back).
    # SPARK_GRAFT_DETAIL_OUT keeps the targeted run from clobbering the
    # close run's bench_detail.json (the r9 attribution loss).
    graft = measure_twins(repo, sf, cpus, K, rnd)
    stock = measure_stock(sf, cpus, K)
    shapes = shape_table(stock, graft)

    # The sf1 (10x) ratio pass the r9 verdict prescribed: at sf0.1 most
    # twins finish in 100-700 ms and the constant oracle-contract
    # overhead (output ORDER BY, decimal casts) dominates the ratio; at
    # sf1 the shapes run 1-10 s and measure actual engine throughput.
    sf1_block = None
    if os.environ.get("SPARK_GRAFT_SKIP_SF1_RATIOS") != "1":
        sf1_dir = ensure_sf1(repo, sf)
        graft1 = measure_twins(repo, sf1_dir, cpus, K_SF1, rnd)
        stock1 = measure_stock(sf1_dir, cpus, K_SF1)
        shapes1 = shape_table(stock1, graft1)
        # totals over shapes measured on BOTH sides only — summing a
        # shape's stock time while dropping its missing graft time would
        # silently deflate the aggregate exactly when a twin failed
        both1 = [s for s in shapes1 if s["ratio"] is not None]
        missing1 = [s["twin"] for s in shapes1 if s["ratio"] is None]
        if missing1:
            print("  WARNING: sf1 shapes missing a measurement (excluded "
                  "from BOTH totals): " + ", ".join(missing1))
        s_tot = sum(s["stock_sec"] for s in both1)
        g_tot = sum(s["graft_sec"] for s in both1)
        sf1_block = {
            "sf": sf1_dir, "k": K_SF1,
            "stock_total_sec": round(s_tot, 3),
            "graft_twin_total_sec": round(g_tot, 3),
            "aggregate_ratio": round(g_tot / s_tot, 3),
            "shapes": shapes1,
        }

    both = [s for s in shapes if s["ratio"] is not None]
    missing = [s["twin"] for s in shapes if s["ratio"] is None]
    if missing:
        print("  WARNING: shapes missing a measurement (excluded from BOTH "
              "totals): " + ", ".join(missing))
    stock_total = sum(s["stock_sec"] for s in both)
    graft_total = sum(s["graft_sec"] for s in both)
    result = {
        "round": rnd,
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf": sf,
        "cpus": cpus,
        "k": K,
        "protocol": ("median-of-%d per shape on BOTH sides, graft twins and "
                     "stock battery measured back to back in one session "
                     "state; spreads are [min, max] over the k runs; the 2x "
                     "gate reads the median ratios" % K),
        "stock_total_sec": round(stock_total, 3),
        "graft_twin_total_sec": round(graft_total, 3),
        "aggregate_ratio": round(graft_total / stock_total, 3),
        "shapes": shapes,
        "sf1_ratios": sf1_block,
        # the close battery's own numbers for reference (median-of-k since
        # r19's round_close REPEAT change; k recorded alongside)
        "battery_sec": {g: detail.get("queries", {}).get(g)
                        for g in TWINS.values()},
        "battery_k": detail.get("k", 1),
    }
    if run_id:
        result["source_run"] = {
            "id": run_id,
            "detail_of": detail_path,
            "producer": "baseline_close.py in the same round_close session "
                        "as the bench detail snapshot",
        }
    path = f"BASELINE_r{rnd:02d}.json"
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"baseline_close: wrote {path} — aggregate "
          f"{result['aggregate_ratio']}x (stock {stock_total:.2f}s, graft "
          f"twins {graft_total:.2f}s, {len(shapes)} shapes, k={K}, cpus={cpus})")
    rated = sorted((s for s in shapes if s["ratio"]), key=lambda s: -s["ratio"])
    for s in rated[:3]:
        print(f"  slowest vs stock: {s['twin']:28s} {s['ratio']:5.2f}x "
              f"(median {s['stock_sec']:.3f}s stock, {s['graft_sec']:.3f}s graft)")
    over = [s for s in rated if s["ratio"] > 2.0]
    if over:
        print("  WARNING: above the 2x gate on MEDIANS vs same-run stock "
              "(investigate): "
              + ", ".join(f"{s['twin']} {s['ratio']}x" for s in over))
    if sf1_block:
        print(f"  sf1 (10x) pass: aggregate {sf1_block['aggregate_ratio']}x "
              f"(stock {sf1_block['stock_total_sec']}s, graft "
              f"{sf1_block['graft_twin_total_sec']}s, k={K_SF1})")
        over1 = sorted((s for s in sf1_block["shapes"]
                        if s["ratio"] and s["ratio"] > 2.0),
                       key=lambda s: -s["ratio"])
        if over1:
            print("  sf1 >2x on medians: "
                  + ", ".join(f"{s['twin']} {s['ratio']}x" for s in over1))
        else:
            print("  sf1: every shape within the 2x gate")


if __name__ == "__main__":
    main()
