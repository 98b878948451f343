#!/bin/bash
# N->4N scaling protocol runner (BENCH.md "Reproduce"): three interleaved
# rounds of 2 -> 8 -> 32 cores, direct java (no sbt JVM in the measured
# window), ParallelGC, tmpfs checkpoints. Prints one JSON line per sample.
#
# Prereqs:  sbt -batch package
#           $0 prep          # once: generate the 100k-page wide corpus
# Run:      $0               # the 3x3 protocol (~25 min on an idle box)
# Health:   $0 probe         # one 8-core sample (~3 min; healthy ~2000 URLs/s)
#
# Box discipline (BENCH.md "re-run under host contention"): run ONLY on an
# idle box — probe first, never run sbt/tests concurrently with samples.
set -euo pipefail
cd "$(dirname "$0")/.."

JAR=target/scala-2.13/anycrawlspark_2.13-0.1.0.jar
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_java() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -XX:+UseParallelGC -Xmx48g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$JAR:/opt/spark/jars/*" "$@"
}

case "${1:-protocol}" in
  prep)
    SPARK_GRAFT_SHUFFLE=128 run_java graft.ScalingBench prep 100000 64 ;;
  probe)
    # seen mode pinned: a stray `export SPARK_GRAFT_SEEN=sidecar` from an ab
    # session must not leak into health probes or the protocol of record
    SPARK_GRAFT_SEEN=driver SPARK_GRAFT_SHUFFLE=32 run_java graft.ScalingBench run 8 2>/dev/null | tail -1 ;;
  ab)
    # seen-filter A/B at 8 cores: the 1e10-deployment sidecar shape vs the
    # driver-resident filter, same corpus, back-to-back (BENCH.md section)
    for mode in sidecar driver; do
      line=$(SPARK_GRAFT_SEEN=$mode SPARK_GRAFT_SHUFFLE=32 run_java graft.ScalingBench run 8 2>/dev/null | tail -1)
      echo "{\"seen\":\"$mode\",${line#\{}"
    done ;;
  ab1m)
    # seen-filter A/B at the 10^6-key horizon (VERDICT r3 #7): same engine,
    # same corpus, sidecar vs driver seen mode at 32 cores. Thin pages
    # (~1 KB) so the frontier/seen machinery — the thing that differs —
    # dominates; a separate corpus dir so the 100k protocol corpus stays.
    export SPARK_GRAFT_SCALING_DIR=/tmp/graft_scaling_corpus_1m
    if [ ! -d "$SPARK_GRAFT_SCALING_DIR" ]; then
      SPARK_GRAFT_PARAGRAPHS=2 SPARK_GRAFT_SHUFFLE=128 \
        run_java graft.ScalingBench prep 1000000 64
    fi
    for mode in sidecar driver; do
      line=$(SPARK_GRAFT_SEEN=$mode SPARK_GRAFT_SHUFFLE=128 run_java graft.ScalingBench run 32 2>/dev/null | tail -1)
      echo "{\"seen\":\"$mode\",\"horizon\":1000000,${line#\{}"
    done ;;
  ab10m)
    # seen-filter A/B at the 10^7-key horizon (VERDICT r4 #4): one more
    # decade over ab1m — the driver-resident filter is now ~120 MB of
    # re-broadcast bloom per compaction while the sidecar's per-bucket
    # blooms stay executor-local; shards sized to the horizon (8 x 2M) so
    # bloom fpp is comparable across horizons. ~5 GB corpus, thin pages.
    export SPARK_GRAFT_SCALING_DIR=/tmp/graft_scaling_corpus_10m
    if [ ! -d "$SPARK_GRAFT_SCALING_DIR" ]; then
      SPARK_GRAFT_PARAGRAPHS=2 SPARK_GRAFT_SHUFFLE=256 \
        run_java graft.ScalingBench prep 10000000 64
    fi
    for mode in sidecar driver; do
      line=$(SPARK_GRAFT_SEEN=$mode SPARK_GRAFT_BLOOM_PER_SHARD=2000000 \
        SPARK_GRAFT_SHUFFLE=256 run_java graft.ScalingBench run 32 2>/dev/null | tail -1)
      echo "{\"seen\":\"$mode\",\"horizon\":10000000,${line#\{}"
    done ;;
  scale10m)
    # 8 -> 32 pairing on the 10M-page corpus (floor-amortized pairing B):
    # at 10M pages the ~0.5 s/generation superstep floor amortizes 10x
    # further than the 100k protocol corpus, so this pairing isolates the
    # DRAM roofline (kernel ceiling 0.757, BENCH.md thread table) from the
    # fixed-cost floor. Driver seen mode, horizon-sized bloom shards.
    export SPARK_GRAFT_SCALING_DIR=/tmp/graft_scaling_corpus_10m
    if [ ! -d "$SPARK_GRAFT_SCALING_DIR" ]; then
      SPARK_GRAFT_PARAGRAPHS=2 SPARK_GRAFT_SHUFFLE=256 \
        run_java graft.ScalingBench prep 10000000 64
    fi
    for c in 8 32; do
      line=$(SPARK_GRAFT_SEEN=driver SPARK_GRAFT_BLOOM_PER_SHARD=2000000 \
        SPARK_GRAFT_SHUFFLE=256 run_java graft.ScalingBench run "$c" 2>/dev/null | tail -1)
      echo "{\"pairing\":\"8-32@10m\",${line#\{}"
    done ;;
  protocol)
    for r in 1 2 3; do
      for c in 2 8 32; do
        line=$(SPARK_GRAFT_SEEN=driver SPARK_GRAFT_SHUFFLE=32 run_java graft.ScalingBench run "$c" 2>/dev/null | tail -1)
        echo "{\"round\":$r,${line#\{}"
      done
    done ;;
  graph)
    # N->4N sample for the graph-operator family: connected components over
    # the same seeded 3M-edge graph at 8 then 32 cores (above the window
    # threshold -> the at-scale groupBy+join star path). Checksums must be
    # equal across core counts (partitioning-independence evidence).
    for c in 8 32; do
      run_java graft.GraphBench "$c" 2>/dev/null | tail -1
    done ;;
  *) echo "usage: $0 [prep|probe|protocol|ab|ab1m|ab10m|scale10m|graph]" >&2; exit 2 ;;
esac
