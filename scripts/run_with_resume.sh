#!/usr/bin/env bash
# Crash-recovery driver for long TPU runs: run demo_roundtrip.py, and on
# failure re-invoke with --resume from the per-round .thu checkpoints
# (the reference's own recovery workflow) up to MAX_RETRIES times.
# Usage: scripts/run_with_resume.sh [demo_roundtrip.py args...]
set -u
MAX_RETRIES=${MAX_RETRIES:-3}
DIR="$(cd "$(dirname "$0")" && pwd)"

python "$DIR/demo_roundtrip.py" "$@"
rc=$?
try=0
while [ $rc -ne 0 ] && [ $try -lt "$MAX_RETRIES" ]; do
    try=$((try + 1))
    echo "[run_with_resume] attempt failed (rc=$rc); resume try $try/$MAX_RETRIES" >&2
    sleep 30  # give a crashed TPU worker time to restart
    python "$DIR/demo_roundtrip.py" "$@" --resume
    rc=$?
done
exit $rc
