#!/usr/bin/env bash
# The 10x scale measurement, end to end (BENCH_NOTES "Round 10" section):
# generate a consistency-preserving Nx copy of the sf0.1 testdata, bench
# both scales back-to-back on a quiet box, and print the per-query ratio
# table (flagging super-linear queries: ratio > factor x 1.5).
#
# Usage: tools/scale_leg.sh [factor]   (default 10; ~15 min at 10x)
set -euo pipefail
cd "$(dirname "$0")/.."
FACTOR="${1:-10}"
SRC=/root/testdata/sf0.1
DEST="scaledata/sf$FACTOR"x
echo "== load: $(cat /proc/loadavg) (want < ~3 before trusting numbers)"
sbt -batch "runMain graft.ScaleGen $SRC $PWD/$DEST $FACTOR"
SPARK_GRAFT_SF_DIR=$SRC sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '^\[info\] {' > /tmp/scale_leg_base.jsonl
SPARK_GRAFT_SF_DIR=$PWD/$DEST sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '^\[info\] {' > /tmp/scale_leg_big.jsonl
# threshold via python (bc is not installed on every box)
python3 tools/scale_ratios.py /tmp/scale_leg_base.jsonl \
  /tmp/scale_leg_big.jsonl "$(python3 -c "print($FACTOR * 1.5)")"
