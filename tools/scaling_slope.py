#!/usr/bin/env python3
"""Empirical scaling-slope gate: sf0.001 -> sf0.1 is 100x the data, so a
key whose best time grows by more than BOUND (default 30x) is empirically
super-linear and will not survive a further 100x -- the backstop for every
"would this plan hold at scale" claim.

Usage: python3 tools/scaling_slope.py [BENCH_full.json BENCH_full_sf001.json [bound]]

Reads the two committed full bench maps (min-basis; medians carry
measurement-window noise), divides each common key's sf0.1 min by its
sf0.001 min floored at NOISE_FLOOR seconds (sub-50ms tiny-scale times are
session fixed costs, not data-proportional work, and would make the ratio
meaningless), and fails loudly on any key over the bound. The same check
runs in-JVM as ScalingSlopeSpec so `sbt test` gates it every round.
"""
import json
import sys

NOISE_FLOOR = 0.05


def main() -> int:
    big_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
    small_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_full_sf001.json"
    bound = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    big_doc = json.load(open(big_path))
    small_doc = json.load(open(small_path))
    big = big_doc["queries"]
    small = small_doc["queries"]
    # a key with no successful run lands in "failures", not "queries" --
    # the worst scaling outcome must fail the gate, never drop out of it
    failed = [(big_path, k) for k in big_doc.get("failures", [])] + \
             [(small_path, k) for k in small_doc.get("failures", [])]
    if failed:
        print("FAIL: keys with no successful run:")
        for path, k in failed:
            print(f"  {k} ({path})")
        return 1
    one_sided = sorted(set(big) ^ set(small))
    if one_sided:
        print(f"FAIL: keys present at only one scale: {one_sided}")
        return 1
    common = sorted(set(big) & set(small))
    if not common:
        print("FAIL: no common keys between the two bench maps")
        return 1
    slopes = []
    for k in common:
        ratio = big[k]["min"] / max(small[k]["min"], NOISE_FLOOR)
        slopes.append((ratio, k, big[k]["min"], small[k]["min"]))
    slopes.sort(reverse=True)
    bad = [s for s in slopes if s[0] > bound]
    print(f"{len(common)} common keys; no failures, no one-sided keys")
    print("worst 10 slopes (ratio, key, sf0.1 min, sf0.001 min):")
    for ratio, k, b, s in slopes[:10]:
        print(f"  {ratio:7.1f}x  {k}  {b:.3f}s  {s:.3f}s")
    if bad:
        print(f"FAIL: {len(bad)} key(s) over the {bound}x bound for 100x data:")
        for ratio, k, b, s in bad:
            print(f"  {ratio:.1f}x  {k}")
        return 1
    print(f"PASS: all {len(common)} keys within {bound}x for 100x data")
    return 0


if __name__ == "__main__":
    sys.exit(main())
