#!/usr/bin/env python3
"""Regenerate bench/trailing_medians_<sf>.tsv from recent close runs.

Bench re-runs a query once (and takes the min over all runs) when its
min-of-n exceeds 3x the trailing median recorded here — the box-load
robustness rule (BENCH_NOTES r19). Run each round AFTER the close run:

    python3 tools/gen_trailing_medians.py sf0.1 \
        bench/r17_sf0.1_close.jsonl bench/r18_sf0.1_close.jsonl \
        bench/r19_sf0.1_close.jsonl

Keep the window to the last ~3 quiet runs: medians over stale rounds
under-price queries that legitimately grew with new in-query checks.
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sf, files = sys.argv[1], sys.argv[2:]
    vals: dict[str, list[float]] = {}
    for f in files:
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if (d.get("metric") == "query"
                        and not d.get("name", "").startswith("s9")
                        and d.get("sec", -1) >= 0):
                    vals.setdefault(d["name"], []).append(d["sec"])
    out = f"bench/trailing_medians_{sf}.tsv"
    with open(out, "w") as fh:
        fh.write("# trailing median of recent quiet close runs "
                 f"({', '.join(files)}); Bench re-runs a query once when "
                 "its min-of-n exceeds 3x this value\n")
        for k in sorted(vals):
            fh.write(f"{k}\t{statistics.median(vals[k]):.4f}\n")
    print(f"{out}: {len(vals)} queries from {len(files)} runs")


if __name__ == "__main__":
    main()
