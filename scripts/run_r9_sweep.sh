#!/bin/bash
# Round-9 isolated evidence sweep: 3-scale bench + correctness gates.
# Run inside tmux (the bench-isolation protocol: a killed wrapper shell
# orphans the JVM; tmux keeps the sequence alive and serialized).
#
# drain_jvms: a finished leg's JVM lingers a few seconds past its python
# wrapper's exit — the first sweep run aborted at leg 2's INSTANT
# pre-flight because it pgrep'd leg 1's still-draining JVM as foreign.
# Wait out the shutdown (bounded) and abort only if something genuinely
# foreign stays alive.
set -x
cd /root/repo

drain_jvms() {
  for _ in $(seq 1 30); do
    pgrep -f "mdf-spark-bench|mdf-oracle-gate" > /dev/null || return 0
    sleep 2
  done
  echo "FOREIGN JVM still alive after 60s — abort"
  return 1
}

# sf10 runs TWICE: the episodic host mode (scripts/diag_episodic.out)
# moves CPU-heavy lines ±40% between otherwise-clean runs, and the sf10
# point is the per-line min across clean legs (build_bench_scale merges
# and annotates legs_merged; note_100x documents the methodology).
for leg in 1 2 3 4; do
  drain_jvms || exit 1
  case $leg in
    1) python bench.py --sf 0.1 > /tmp/b01.json 2>/tmp/b01.err ;;
    2) python bench.py --sf /root/repo/.localdata/sf1 > /tmp/b1.json 2>/tmp/b1.err ;;
    3) python bench.py --sf /root/repo/.localdata/sf10 > /tmp/b10.json 2>/tmp/b10.err ;;
    4) python bench.py --sf /root/repo/.localdata/sf10 > /tmp/b10b.json 2>/tmp/b10b.err ;;
  esac
  echo "leg $leg done"
done
python scripts/build_bench_scale.py /tmp/b01.json /tmp/b1.json /tmp/b10.json /tmp/b10b.json
drain_jvms || exit 1
python scripts/oracle_gate.py --sf /root/repo/.localdata/sf1 --skip-quadratic \
  --json-out /tmp/gate10x.json > /tmp/gate10x.log 2>&1
drain_jvms || exit 1
python scripts/oracle_gate.py --sf /root/repo/.localdata/sf10 \
  --only q1_pricing_summary,cube_status_priority,grouping_sets_orders,events_salted_user_totals,dataset_split_mix,epoch_mix \
  --json-out /tmp/gate100x.json > /tmp/gate100x.log 2>&1
python scripts/patch_bench_scale_notes.py /tmp/gate10x.json /tmp/gate100x.json
echo SWEEP_COMPLETE
