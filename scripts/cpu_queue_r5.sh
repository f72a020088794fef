#!/bin/bash
# CPU-side head-to-head queue, round 5 (VERDICT r4 item 4): the torch
# reference has no TPU path, so the h2h trainings run CPU-pinned. Runs
# concurrently with scripts/tpu_queue_r5.sh but nice-19 so the TPU queue's
# host-side work keeps priority on this host's single core. Registers a
# /tmp/tpu_queue*.pid so bench.py's round-end cleanup can stop it; the
# h2h script checkpoints both sides at every milestone, so a kill loses at
# most one milestone segment.
echo $$ > /tmp/tpu_queue_cpu_r5.pid
cd /root/repo
PY=python
SUP="nice -n 19 $PY -m imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.supervisor --timeout 3600 --grace 5400 --max-restarts 50"
gate() {
  if [ -f /tmp/queue_stop ]; then
    echo "cpu queue stopped by /tmp/queue_stop" >> /tmp/q_status
    rm -f /tmp/tpu_queue_cpu_r5.pid; exit 0
  fi
}
run() {
  name=$1; shift
  "$@" >> "/tmp/q_$name.log" 2>&1
  echo "$? $name $(date -u +%H:%M:%S)" >> /tmp/q_status
}

gate
run h2h_fact  $SUP --pidfile /tmp/rd_sweep_h2h_f.pid -- $PY scripts/headtohead.py --entropy factorized --steps 2000 --eval-every 250
gate
run h2h_ztsep $SUP --pidfile /tmp/rd_sweep_h2h_z.pid -- $PY scripts/headtohead.py --entropy ztsep --steps 1000 --eval-every 125
rm -f /tmp/tpu_queue_cpu_r5.pid
