#!/bin/bash
# Round-3 idle-host measurement queue (artifact-quality numbers for
# BASELINE.md / README).  Run ONLY when no heavy CPU job shares the host —
# the tunnel + 1-core sandbox add 30-40 % wall-clock noise under load.
#
#   nohup bash scripts/measure_r3.sh > /tmp/mq/queue.log 2>&1 &
#
# Outputs one log per item under /tmp/mq/.
set -u
cd "$(dirname "$0")/.."
L=/tmp/mq
mkdir -p "$L"

run() {
  local name=$1 to=$2
  shift 2
  echo "=== $(date +%H:%M:%S) $name: $*"
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  echo "    rc=$? ($(date +%H:%M:%S))"
}

# TPU one-shot measurements (each needs the host quiet for Python tracing)
run perc512   1200 python scripts/perc512.py
run t512_a    1200 env PRECOND=auto PERC=auto OPENIMPALA_PROFILE=1 python scripts/t512.py
run t512_b    1200 env PRECOND=auto PERC=auto OPENIMPALA_PROFILE=1 python scripts/t512.py
run all512    1800 python scripts/all512.py
run bench     1200 python bench.py
run deff512   1800 env ONLY=gmg python scripts/deff512.py
run fgmres512 1800 python scripts/fgmres512.py

# multi-chip gate determinism: 5 consecutive runs (VERDICT r2 #1 done-bar)
for i in 1 2 3 4 5; do
  run dryrun$i 1800 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
done

# full suite incl. heavy tier (192^3 sharded parity, >4 GiB BigTIFF ingest)
run suite_heavy 7200 env OPENIMPALA_HEAVY_TESTS=1 python -m pytest tests/ -q

echo "=== $(date +%H:%M:%S) QUEUE DONE"
