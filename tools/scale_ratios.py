#!/usr/bin/env python3
"""Compare two Bench contract lines (sf0.1 vs sf~1) and print the
per-query scale ratio table for BENCH_NOTES.md.

Usage: scale_ratios.py <sf01.jsonl> <sf1.jsonl> [threshold]

Reads the LAST {"metric":"total",...} line of each file (the contract
line), joins on query key, and prints a markdown table sorted by ratio
descending, flagging ratios above the super-linear threshold (default
15x for 10x data — allows 1.5x per-row overhead before a query needs a
named cause).
"""
import json
import sys


def contract(path):
    last = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            # sbt prefixes [info]; the contract line is bare JSON after it
            if '"metric":"total"' in line:
                last = line[line.index('{'):]
    if last is None:
        sys.exit(f"no contract line in {path}")
    return json.loads(last)


def main():
    a, b = contract(sys.argv[1]), contract(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qa, qb = a["queries"], b["queries"]
    rows = []
    for k in sorted(qa):
        if k in qb and qa[k] > 0 and qb[k] > 0:
            rows.append((k, qa[k], qb[k], qb[k] / qa[k]))
    rows.sort(key=lambda r: -r[3])
    print(f'| query | {a["sf"]} (s) | {b["sf"]} (s) | ratio |')
    print("|---|---|---|---|")
    flagged = []
    for k, x, y, r in rows:
        flag = " **SUPER-LINEAR**" if r > thresh else ""
        if r > thresh:
            flagged.append(k)
        print(f"| {k} | {x:.2f} | {y:.2f} | {r:.1f}x{flag} |")
    ta, tb = a["value"], b["value"]
    print(f"| **total** | {ta:.2f} | {tb:.2f} | {tb/ta:.1f}x |")
    print()
    print(f'loads: {a["sf"]}={a.get("load")} {b["sf"]}={b.get("load")}; '
          f'runs: {a.get("runs")}/{b.get("runs")}')
    med = sorted(r for _, _, _, r in rows)[len(rows) // 2] if rows else 0
    print(f"median ratio: {med:.1f}x over {len(rows)} queries; "
          f"flagged >{thresh}x: {flagged or 'none'}")
    sa, sb = a.get("streams", {}), b.get("streams", {})
    if sa and sb:
        common = {k: (sa[k], sb[k]) for k in sa if k in sb}
        print("streams eps (a→b): " + ", ".join(
            f"{k}:{x}->{y}" for k, (x, y) in sorted(common.items())))


if __name__ == "__main__":
    main()
