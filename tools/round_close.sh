#!/usr/bin/env bash
# One-command round-close artifact ritual — the three things every
# round must leave in the repo (three of the last four verdicts flagged
# a missing or lossy one):
#   1. full-catalog correctness at sf0.01 (the driver-parity gate);
#   2. a COMPLETE per-query bench artifact at sf0.1
#      (bench_r<N>_session.json — the driver's own BENCH_r<N>.json
#      truncates to the stdout tail);
#   3. optionally ("sf1"), the durable sf1.0 certification
#      (CORRECTNESS_sf1.json, merge-on-write) + bench_r<N>_sf1.json.
#
# Usage: tools/round_close.sh <round-number> [sf1]
#   tools/round_close.sh 14        # correctness sf0.01 + bench sf0.1
#   tools/round_close.sh 14 sf1    # ... + the sf1.0 sweep and bench
#
# Exits nonzero on the first failing gate. Run `sbt test` separately —
# it is part of the working loop, not the artifact ritual.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: round_close.sh <round-number> [sf1]}"
WANT_SF1="${2:-}"
CPUS="${SPARK_GRAFT_CPUS:-32}"

echo "== [1/2] full-catalog correctness at sf0.01 =="
rm -rf target/verify_close
SPARK_GRAFT_CPUS="$CPUS" sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 target/verify_close" \
  2>&1 | grep -E '\[verify\].*failed' && {
    echo "FATAL: Verify reported per-query failures"; exit 1; } || true
python3 tools/check_oracle.py /root/testdata/sf0.01 target/verify_close

echo "== [2/2] full per-query bench at sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" > target/bench_close.log
grep '"metric"' target/bench_close.log > "bench_r${ROUND}_session.json"
grep BENCH_SUMMARY target/bench_close.log
PREV=$(ls bench_r*_session.json 2>/dev/null | sort -V | tail -2 | head -1)
if [ -n "$PREV" ] && [ "$PREV" != "bench_r${ROUND}_session.json" ]; then
  echo "-- bench diff vs $PREV (host noise moves totals; read per-query pairs) --"
  python3 tools/bench_diff.py "$PREV" "bench_r${ROUND}_session.json" || true
fi

if [ "$WANT_SF1" = "sf1" ]; then
  echo "== [sf1] full-catalog certification at sf1.0 =="
  rm -rf target/verify_sf1_close
  SPARK_GRAFT_CPUS="$CPUS" sbt -batch \
    "runMain graft.Verify /root/repo/target/sf1.0 target/verify_sf1_close" \
    2>&1 | grep -E '\[verify\].*failed' && {
      echo "FATAL: sf1.0 Verify reported per-query failures"; exit 1; } || true
  python3 tools/check_oracle_big.py /root/repo/target/sf1.0 \
    target/verify_sf1_close "" CORRECTNESS_sf1.json
  echo "== [sf1] bench at sf1.0 =="
  SPARK_GRAFT_SF_DIR=/root/repo/target/sf1.0 SPARK_GRAFT_CPUS="$CPUS" \
    sbt -batch "runMain graft.Bench" > target/bench_sf1_close.log
  grep '"metric"' target/bench_sf1_close.log > "bench_r${ROUND}_sf1.json"
  grep BENCH_SUMMARY target/bench_sf1_close.log
fi

echo "round_close: all gates green; artifacts:"
ls -la "bench_r${ROUND}_session.json" \
  $( [ "$WANT_SF1" = "sf1" ] && echo "bench_r${ROUND}_sf1.json CORRECTNESS_sf1.json" )
