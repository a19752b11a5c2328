#!/bin/bash
# Round-3 bench campaign: auditable scaling-efficiency artifacts.
#   run1: 2->8  FULL (operator catalog incl. q01 at sf0.1, local[32])
#   run2: 4->16 replay-only (the round-1 window, recorded for audit)
#   run3: 2->8  replay-only (repeat)
#   run4: 2->8  replay-only (repeat)
# Each JSON carries the in-run CPU and memory-bandwidth ceilings measured
# in the same minutes as the engine numbers (see BASELINE.md protocol).
set -u
cd /root/repo
mkdir -p bench
run() {
  local levels="$1" tag="$2" extra="$3"
  echo "=== $tag levels=$levels extra=$extra $(date -u +%H:%M:%S) ==="
  env SPARK_DRIVER_MEM=48g SPARK_GRAFT_BENCH_LEVELS="$levels" \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $extra \
    sbt -batch "runMain graft.Bench" > "/tmp/bench_$tag.log" 2>&1
  # sbt prefixes stdout with "[info] " — strip it before saving the artifact
  grep -h '"metric"' "/tmp/bench_$tag.log" | sed 's/^\[info\] //' | tail -1 > "bench/$tag.json"
  cat "bench/$tag.json"
}
if [ $# -gt 0 ]; then
  # single run: run_campaign.sh <levels> <tag> [extra-env]
  run "$1" "$2" "${3:-}"
else
  # round-5 default: one full 2→8 protocol run, then 4→16 attempts hunting a
  # calm window (see README §"The 4→16 window")
  run "2,8"  r5_run1_full_2-8        ""
  run "4,16" r5_run2_replay_4-16     "SPARK_GRAFT_BENCH_SKIP_QUERIES=1"
  run "2,8"  r5_run3_replay_2-8      "SPARK_GRAFT_BENCH_SKIP_QUERIES=1"
  run "4,16" r5_run4_replay_4-16     "SPARK_GRAFT_BENCH_SKIP_QUERIES=1"
fi
echo "campaign done $(date -u +%H:%M:%S)"
