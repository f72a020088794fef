#!/bin/bash
# Serialized TPU job queue, round 5. Cooperates with
# bench.py::_stop_background_runs (registers /tmp/tpu_queue*.pid, exits at
# the next job boundary when /tmp/queue_stop appears). ADVICE r4 fixes:
# clears a STALE /tmp/queue_stop at startup (a stop-file only stops the
# queue instance that was running when it appeared — bench leaves one
# behind at every round end), records each job's exit status to
# /tmp/q_status, and self-drains at QUEUE_DEADLINE (epoch seconds,
# default +8.5 h) so the driver's end-of-round bench finds an idle TPU
# instead of killing half-done jobs (VERDICT r4 weak-point 2).
#
# Job order: bench FIRST (captures an early round-5 number + warms the
# compile caches while they're known-good), then the evidence-rebuild
# trainings in VERDICT priority order, then profiles, then bench again on
# the warmed caches.
rm -f /tmp/queue_stop
echo $$ > /tmp/tpu_queue_r5.pid
cd /root/repo
: > /tmp/q_status
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 30600 ))}
PY=python
SUP="$PY -m imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.supervisor --timeout 900 --max-restarts 100"
gate() {
  if [ -f /tmp/queue_stop ]; then
    echo "stopped by /tmp/queue_stop" >> /tmp/q_status
    rm -f /tmp/tpu_queue_r5.pid; exit 0
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "deadline self-drain" >> /tmp/q_status
    rm -f /tmp/tpu_queue_r5.pid; exit 0
  fi
}
run() {
  name=$1; shift
  "$@" >> "/tmp/q_$name.log" 2>&1
  echo "$? $name $(date -u +%H:%M:%S)" >> /tmp/q_status
}

gate
run bench0   env BENCH_KEEP_BG=1 BENCH_DEADLINE_S=2700 timeout 3000 $PY bench.py
gate
run lam2000  $SUP --pidfile /tmp/rd_sweep_lam2000.pid -- $PY scripts/rd_sweep.py --preset flagship --lambdas 2000 --steps 75000 --resume
gate
run lam6000  $SUP --pidfile /tmp/rd_sweep_lam6000.pid -- $PY scripts/rd_sweep.py --preset flagship --lambdas 6000 --steps 75000 --resume
gate
run quincunx $SUP --pidfile /tmp/rd_sweep_quincunx.pid -- $PY scripts/rd_sweep.py --preset quincunx --lambdas 400 --steps 30000 --resume
gate
run pp       $SUP --pidfile /tmp/rd_sweep_pp.pid -- $PY scripts/postprocess_gain.py --lam 2000 --steps 15000
gate
run profile  timeout 1800 $PY scripts/profile_flagship.py
gate
run benchN   env BENCH_KEEP_BG=1 BENCH_DEADLINE_S=2700 timeout 3000 $PY bench.py
rm -f /tmp/tpu_queue_r5.pid
