#!/bin/bash
# Round-12 isolated evidence sweep: 3-scale bench + correctness gates on
# FINAL HEAD in a clean host window. Run inside tmux (bench-isolation
# protocol: a killed wrapper shell orphans the JVM; tmux keeps the
# sequence alive and serialized). Same-leg-count discipline as r10/r11:
# EVERY scale runs 2 legs and build_bench_scale min-merges each group.
# Round-12 deltas: the sf10 oracle gate broadens from 6 to 10 queries
# (r11 verdict #6 — adds the hash-friendly curation rows c4_clean,
# gopher_quality, url_canonicalize, stratified_quota, ~65s extra), and
# bench.py itself now re-measures contention-flagged lines post-drain.
set -x
cd /root/repo
git rev-parse HEAD > /tmp/r12_sweep_head.txt

drain_jvms() {
  for _ in $(seq 1 30); do
    pgrep -f "mdf-spark-bench|mdf-oracle-gate|mdf-diag" > /dev/null || return 0
    sleep 2
  done
  echo "FOREIGN JVM still alive after 60s — abort"
  return 1
}

wait_idle() {
  # load gate, sweep edition: never start a leg on a busy host
  for _ in $(seq 1 40); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l <= 2.0)}' && return 0
    sleep 15
  done
  echo "load stayed > 2 for 10m — proceeding anyway (recorded in host_state)"
}

for leg in 01a 01b 1a 1b 10a 10b; do
  drain_jvms || exit 1
  wait_idle
  case $leg in
    01a) python bench.py --sf 0.1 > /tmp/b01a.json 2>/tmp/b01a.err ;;
    01b) python bench.py --sf 0.1 > /tmp/b01b.json 2>/tmp/b01b.err ;;
    1a)  python bench.py --sf /root/repo/.localdata/sf1 > /tmp/b1a.json 2>/tmp/b1a.err ;;
    1b)  python bench.py --sf /root/repo/.localdata/sf1 > /tmp/b1b.json 2>/tmp/b1b.err ;;
    10a) python bench.py --sf /root/repo/.localdata/sf10 > /tmp/b10a.json 2>/tmp/b10a.err ;;
    10b) python bench.py --sf /root/repo/.localdata/sf10 > /tmp/b10b.json 2>/tmp/b10b.err ;;
  esac
  echo "leg $leg done"
done
python scripts/build_bench_scale.py /tmp/b01a.json,/tmp/b01b.json \
  /tmp/b1a.json,/tmp/b1b.json /tmp/b10a.json,/tmp/b10b.json
drain_jvms || exit 1
python scripts/oracle_gate.py --sf /root/repo/.localdata/sf1 --skip-quadratic \
  --json-out /tmp/gate10x.json > /tmp/gate10x.log 2>&1
drain_jvms || exit 1
python scripts/oracle_gate.py --sf /root/repo/.localdata/sf10 \
  --only q1_pricing_summary,cube_status_priority,grouping_sets_orders,events_salted_user_totals,dataset_split_mix,epoch_mix,c4_clean,gopher_quality,url_canonicalize,stratified_quota \
  --json-out /tmp/gate100x.json > /tmp/gate100x.log 2>&1
python scripts/patch_bench_scale_notes.py /tmp/gate10x.json /tmp/gate100x.json
echo SWEEP_COMPLETE
