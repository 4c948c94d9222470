#!/bin/bash
# Watch for TPU recovery, then run the full revalidation sequence
# unattended: chip_return probe suite -> quick train bench -> full
# bench.py preview.  ONE process on the chip at a time, sequential, no
# external kill of any step (lease safety — see BENCH_NOTES.md).
#
# Every chip-touching step below takes the flock chip lease
# (movenet_tpu.utils.chiplock, /tmp/movenet_tpu_chip.lock) itself, so
# this pipeline can NEVER put a second JAX process on the tunnel while
# an official bench holds the chip — the round-4 failure class where a
# wall-clock guard (07:30 UTC) guessed wrong (VERDICT r4 weak #2).
#
# Usage: nohup bash scripts/recovery_pipeline.sh > /tmp/recovery.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

bash scripts/tpu_watch.sh "${1:-300}" "${2:-130}" || exit 1

echo "=== chip returned $(date); running chip_return.sh ==="
bash scripts/chip_return.sh
echo "=== chip_return done rc=$? $(date); running bench preview ==="
python bench.py > /tmp/bench_preview.json 2>/tmp/bench_preview.err
echo "=== bench preview rc=$? $(date) ==="
tail -c 2000 /tmp/bench_preview.json
