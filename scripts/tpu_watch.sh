#!/bin/bash
# TPU-recovery watcher (round-3 outage lesson, committed per round-3
# VERDICT weak #6 / next-round item 5).
#
# Polls the TPU backend until it answers, then exits 0 so the caller
# (or a background-task notification) can run scripts/chip_return.sh.
# It deliberately does NOT auto-run the validation itself: the chip is
# a serial resource and the operator should own what runs first.
#
# LEASE SAFETY (the rule that cost round 3 its official bench record):
# never SIGKILL a TPU-attached python while it may hold the remote
# lease — killed-mid-handshake processes can leave the lease in
# "defer-release" and wedge the tunnel for hours.  This watcher's probe
# therefore uses an in-process watchdog thread (the process exits on
# its own after the join timeout; no external `timeout`/`kill`), and
# polls at a low duty cycle (default 10 min) to minimise lease-request
# churn against a wedged remote.
#
# Usage: bash scripts/tpu_watch.sh [interval_s] [max_tries]
#   e.g. nohup bash scripts/tpu_watch.sh 600 70 > /tmp/tpu_watch.log &
set -u
INTERVAL=${1:-600}
TRIES=${2:-70}
echo "tpu_watch: start $(date) interval=${INTERVAL}s tries=${TRIES}"
for i in $(seq 1 "$TRIES"); do
  if python - <<'PYEOF'
import sys
import threading

# Chip-lease lock (round-4 VERDICT item 2): if another LOCAL process
# holds the chip (official bench, probe suite), the chip is in use and
# therefore up — report UP without touching the tunnel.  flock releases
# on holder death, so there is no stale state to special-case.
from movenet_tpu.utils.chiplock import ChipLockTimeout, chip_lock
try:
    _lock = chip_lock("tpu_watch_probe", timeout_s=5)
    _lock.__enter__()
except ChipLockTimeout:
    print("tpu_watch probe: lease held by another local process -> UP")
    sys.exit(0)

ok = {}

def probe():
    try:
        import jax
        import jax.numpy as jnp

        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        ok["y"] = True
    except Exception as e:  # backend-specific init failures
        ok["e"] = repr(e)

t = threading.Thread(target=probe, daemon=True)
t.start()
t.join(180)
sys.exit(0 if ok.get("y") else 1)
PYEOF
  then
    echo "tpu_watch: TPU UP $(date)"
    exit 0
  fi
  echo "tpu_watch: poll $i down $(date)"
  sleep "$INTERVAL"
done
echo "tpu_watch: gave up after $TRIES tries $(date)"
exit 1
