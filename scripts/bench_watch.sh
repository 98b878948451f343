#!/bin/bash
# Health-gated protocol runner (BENCH.md round 3-4 discipline): probe the
# box every ~7 min and launch the full N->4N protocol + seen A/Bs + graph
# sample on the first healthy window (>= $THRESHOLD URLs/s at 8 cores,
# healthy ~2000); after $ATTEMPTS failed probes, run anyway and let the
# log disclose the degraded probes alongside the samples.
#
# Usage:  sbt -batch package && setsid nohup scripts/bench_watch.sh [log] &
# (setsid matters: a plain background job dies with its shell session.)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/bench_watch.log}
THRESHOLD=${THRESHOLD:-1700}
ATTEMPTS=${ATTEMPTS:-14}
SLEEP=${SLEEP:-420}
echo "== watcher start $(date -u +%F' '%T) threshold=$THRESHOLD" >> "$LOG"
for i in $(seq 1 "$ATTEMPTS"); do
  line=$(scripts/scaling_protocol.sh probe 2>/dev/null | tail -1)
  tput=$(echo "$line" | python3 -c "import json,sys; print(json.load(sys.stdin)['urls_per_sec'])" 2>/dev/null || echo 0)
  echo "$(date -u +%H:%M:%S) probe#$i $tput" >> "$LOG"
  ok=$(python3 -c "print(1 if float('$tput' or 0)>=$THRESHOLD else 0)")
  [ "$ok" = "1" ] && break
  sleep "$SLEEP"
done
echo "== protocol start $(date -u +%F' '%T)" >> "$LOG"
scripts/scaling_protocol.sh >> "$LOG" 2>/dev/null
echo "== post-protocol probe" >> "$LOG"
scripts/scaling_protocol.sh probe >> "$LOG" 2>/dev/null
echo "== ab (1e5 horizon)" >> "$LOG"
scripts/scaling_protocol.sh ab >> "$LOG" 2>/dev/null
echo "== ab1m (1e6 horizon)" >> "$LOG"
scripts/scaling_protocol.sh ab1m >> "$LOG" 2>/dev/null
echo "== graph" >> "$LOG"
scripts/scaling_protocol.sh graph >> "$LOG" 2>/dev/null
echo "== done $(date -u +%F' '%T)" >> "$LOG"
