#!/bin/bash
# Same-window A/B of the two r15 scale-tier alarms (q_join_agg,
# q_minhash_lsh_pairs at 10x) between r14 (2132373) and HEAD, per the
# NOTES_r14/r15 protocol — two git WORKTREES (each with its own
# target/, so post-r14 files can't pollute the r14 compile), HEAD's
# Bench.scala (incl. contention sentinel) in both, interleaved
# r14->HEAD per iteration, scale tier only.
set -e
ENV="SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_PIPE=0 SPARK_GRAFT_STREAM=0 \
  SPARK_GRAFT_QUERIES=q_join_agg,q_minhash_lsh_pairs"
for i in 1 2; do
  (cd /tmp/wt_r14 && eval env $ENV SPARK_GRAFT_BENCH_OUT=/tmp/ab16w_r14_$i.json \
    sbt -batch '"runMain graft.Bench"' >/tmp/ab16w_r14_$i.log 2>&1) || true
  (cd /tmp/wt_head && eval env $ENV SPARK_GRAFT_BENCH_OUT=/tmp/ab16w_head_$i.json \
    sbt -batch '"runMain graft.Bench"' >/tmp/ab16w_head_$i.log 2>&1) || true
done
echo AB_DONE
