#!/usr/bin/env bash
# Kill+resume robustness stress (BENCH.md §6 protocol, scaled up).
#
# Phase 1 starts the crawl and is SIGKILLed (whole process group, so the
# JVM dies too) mid-tick once the manifest shows KILL_AFTER_TICK
# committed — a hard kill with an uncommitted tick in flight, not a
# clean exit at a tick boundary. Phase 2 resumes a fresh process on the
# same checkpoint, runs to TICKS, and runs the --audit pass: 0 duplicate
# fetches, 0 duplicate (url_hash, url_canon) seen pairs, seen-dir read
# amplification, peak RSS.
#
# Usage: stress_kill_resume.sh <checkpoint> <pages> <hosts> <ticks> \
#          <kill_after_tick> <backend: bloom|cuckoo|none> [extra args...]
set -u
CK=$1; PAGES=$2; HOSTS=$3; TICKS=$4; KILL_AFTER=$5; BACKEND=$6; shift 6
cd "$(dirname "$0")/.."

ACCEL=()
case "$BACKEND" in
  bloom)  ACCEL=(--use-bloom --bloom-bits-per-shard $((1<<23))) ;;
  cuckoo) ACCEL=(--use-cuckoo --cuckoo-buckets-per-shard $((1<<16))) ;;
esac

COMMON=(--synth-pages "$PAGES" --synth-hosts "$HOSTS" --checkpoint "$CK"
        --ticks "$TICKS" "${ACCEL[@]}" "$@")

rm -rf "$CK"
setsid python scripts/submit_crawl.py "${COMMON[@]}" > "$CK.phase1.log" 2>&1 &
PID=$!
PGID=$(ps -o pgid= -p $PID | tr -d ' ')
echo "phase1 pid=$PID pgid=$PGID"

while kill -0 "$PID" 2>/dev/null; do
  CT=$(python -c "import json,sys;print(json.load(open('$CK/manifest.json')).get('committed_tick',-1))" 2>/dev/null || echo -1)
  if [ "$CT" -ge "$KILL_AFTER" ]; then
    # let the next tick get properly in flight before the kill; override
    # KILL_SLEEP downward for small/fast configs whose remaining ticks
    # would otherwise complete inside the default window
    sleep "${KILL_SLEEP:-30}"
    echo "killing phase1 mid-tick (committed_tick=$CT)"
    kill -9 -"$PGID" 2>/dev/null
    break
  fi
  sleep 15
done
wait "$PID" 2>/dev/null
sleep 5

echo "phase2 resume"
python scripts/submit_crawl.py "${COMMON[@]}" --audit > "$CK.phase2.log" 2>&1
tail -1 "$CK.phase2.log"
