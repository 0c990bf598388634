#!/usr/bin/env python3
"""Probe-normalized bench trend rows (VERDICT r12 #7).

Every committed bench record since r12 carries per-pass host-calibration
probes (a fixed Spark-free splitmix64 CPU loop, see Bench.calibrate). This
script turns a (bench_out, bench_metrics) pair into one ledger row where the
total is normalized by the record's own measured host speed against a PINNED
reference probe, so cross-round comparisons are drift-corrected by
construction instead of by adjudication prose:

    probe_mean  = mean(cpu_sec over all boundaries)
    normalized  = total * (REF_CPU / probe_mean)

REF_CPU is pinned to 0.250 s — the calm-window value of the r12 sf0.1/sf10
records (boundaries read 0.23-0.29 when the host is quiet). A record taken in
a slow window shows probe_mean above the pin and normalizes DOWN; a genuinely
regressed build shows a raw increase the probe does not explain.

Usage: python3 scripts/bench_trend.py <bench_out.json> <bench_metrics.json> [label]
Prints one markdown table row: label | n | raw total | probe mean | normalized.
"""
import json
import sys

REF_CPU = 0.250

def main() -> None:
    out = json.load(open(sys.argv[1]))
    metrics = json.load(open(sys.argv[2]))
    label = sys.argv[3] if len(sys.argv) > 3 else sys.argv[1]
    calib = metrics.get("calibration", [])
    if not calib:
        sys.exit("no calibration array in metrics sheet (pre-r12 record?)")
    probe_mean = sum(e["cpu_sec"] for e in calib) / len(calib)
    total = out["value"]
    n = out.get("queries_ok", len(out.get("queries", {})))
    normalized = total * (REF_CPU / probe_mean)
    probes = "/".join(f"{e['cpu_sec']:.2f}" for e in calib)
    print(f"| {label} | {n} | {total:.1f} s | {probe_mean:.3f} s ({probes}) "
          f"| **{normalized:.1f} s** |")

if __name__ == "__main__":
    main()
