#!/bin/bash
# CPU h2h queue, take 2 (replaces cpu_queue_r5.sh's second job while its
# first — the factorized h2h, launched before measuring how slow the
# 1-core fresh-compile path is — keeps running). Waits for the factorized
# supervisor to exit, then runs the ztsep h2h with settings sized to this
# host: fewer steps, tighter milestones, single-shape final eval. The
# /tmp/h2h_deadline file makes headtohead.py finalize early at the step it
# reached, so a final matched-step comparison lands no matter what.
echo $$ > /tmp/tpu_queue_cpu_r5b.pid
cd /root/repo
PY=python
SUP="nice -n 19 $PY -m imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.supervisor --timeout 3600 --grace 5400 --max-restarts 50"

# finalize-early deadline for BOTH h2h runs (epoch seconds)
date -d "09:30" +%s > /tmp/h2h_deadline

# wait for the factorized h2h supervisor to finish (poll its recorded pid;
# vanished pidfile or dead pid both mean done)
while :; do
  [ -f /tmp/queue_stop ] && { rm -f /tmp/tpu_queue_cpu_r5b.pid; exit 0; }
  fp=$(cat /tmp/rd_sweep_h2h_f.pid 2>/dev/null)
  { [ -z "$fp" ] || ! kill -0 "$fp" 2>/dev/null; } && break
  sleep 60
done

[ -f /tmp/queue_stop ] && { rm -f /tmp/tpu_queue_cpu_r5b.pid; exit 0; }
$SUP --pidfile /tmp/rd_sweep_h2h_z.pid -- $PY scripts/headtohead.py --entropy ztsep --steps 1000 --eval-every 125 --final-eval-n 8 --final-crop 256 >> /tmp/q_h2h_ztsep.log 2>&1
echo "$? h2h_ztsep $(date -u +%H:%M:%S)" >> /tmp/q_status
rm -f /tmp/tpu_queue_cpu_r5b.pid
