#!/bin/bash
# Round-13 isolated evidence sweep: 3-scale bench + correctness gates on
# FINAL HEAD in a clean host window, same leg-count discipline as r10-r12
# (2 legs per scale, min-merged by build_bench_scale.py). Run inside tmux.
# Round-13 deltas vs run_r12_sweep.sh: bench.py now carries the escalated
# episode guard (>1.25x-isolated sweep + probe-drained retry +
# episode_suspect annotation), and a final SPARK_GRAFT_CPUS=8 sf0.1 smoke
# leg records the low-core scaling evidence the driver's PERF block reads.
set -x
cd /root/repo
git rev-parse HEAD > /tmp/r13_sweep_head.txt

drain_jvms() {
  for _ in $(seq 1 30); do
    pgrep -f "mdf-spark-bench|mdf-oracle-gate|mdf-diag" > /dev/null || return 0
    sleep 2
  done
  echo "FOREIGN JVM still alive after 60s — abort"
  return 1
}

wait_idle() {
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
    01a) python bench.py --sf 0.1 > /tmp/r13_b01a.json 2>/tmp/r13_b01a.err ;;
    01b) python bench.py --sf 0.1 > /tmp/r13_b01b.json 2>/tmp/r13_b01b.err ;;
    1a)  python bench.py --sf /root/repo/.localdata/sf1 > /tmp/r13_b1a.json 2>/tmp/r13_b1a.err ;;
    1b)  python bench.py --sf /root/repo/.localdata/sf1 > /tmp/r13_b1b.json 2>/tmp/r13_b1b.err ;;
    10a) python bench.py --sf /root/repo/.localdata/sf10 > /tmp/r13_b10a.json 2>/tmp/r13_b10a.err ;;
    10b) python bench.py --sf /root/repo/.localdata/sf10 > /tmp/r13_b10b.json 2>/tmp/r13_b10b.err ;;
  esac
  echo "leg $leg done"
done
python scripts/build_bench_scale.py /tmp/r13_b01a.json,/tmp/r13_b01b.json \
  /tmp/r13_b1a.json,/tmp/r13_b1b.json /tmp/r13_b10a.json,/tmp/r13_b10b.json
drain_jvms || exit 1
python scripts/oracle_gate.py --sf /root/repo/.localdata/sf1 --skip-quadratic \
  --json-out /tmp/r13_gate10x.json > /tmp/r13_gate10x.log 2>&1
drain_jvms || exit 1
python scripts/oracle_gate.py --sf /root/repo/.localdata/sf10 \
  --only q1_pricing_summary,cube_status_priority,grouping_sets_orders,events_salted_user_totals,dataset_split_mix,epoch_mix,c4_clean,gopher_quality,url_canonicalize,stratified_quota \
  --json-out /tmp/r13_gate100x.json > /tmp/r13_gate100x.log 2>&1
python scripts/patch_bench_scale_notes.py /tmp/r13_gate10x.json /tmp/r13_gate100x.json
drain_jvms || exit 1
wait_idle
SPARK_GRAFT_CPUS=8 python bench.py --sf 0.1 > /tmp/r13_bench_c8.json 2>/tmp/r13_bench_c8.err
echo SWEEP_COMPLETE
