#!/bin/bash
# Preempt pipeline 18's final (quench-capacity) stretch legs once the
# depth-10 leg has finished: the queued EMA A/B + ARNN-adam + honeycomb
# legs (pipelines 19-21) are higher value for the remaining session
# budget. Killing the p18 process group within seconds of the quench
# leg starting is safe — its train child is still in python imports,
# long before any TPU compile.
set -x
cd /root/repo
while ! grep -q 'd10 rc=' runs/r2_pipeline18.out 2>/dev/null; do sleep 15; done
sleep 5
kill -- -$(cat /tmp/p18.pid)
echo "p18 quench legs preempted; chain advances to pipeline 19"
