#!/bin/bash
# Replaces r2_p18_takeover.sh: preempt pipeline 18 after its d10 leg so the
# queued pipelines 19-23 run instead of p18's stretch legs (whose prequench
# recipe is the one that collapsed — pipeline 23 carries the fixed version).
# The original used `kill -- -<shell pgid>`, but each leg runs under GNU
# timeout, which setpgid()s itself — the just-started leg would survive the
# shell-group kill as an orphan. Sequence here: freeze the shell (no new
# legs), SIGTERM each child's own process group (the supervisor now reaps
# its train child on SIGTERM), then SIGKILL leftovers and the shell.
set -x
cd /root/repo
while ! grep -q 'd10 rc=' runs/r2_pipeline18.out 2>/dev/null; do sleep 10; done
kill -STOP 4666 2>/dev/null
kids=$(pgrep -P 4666)
for c in $kids; do kill -TERM -- -$c 2>/dev/null || kill -TERM $c 2>/dev/null; done
sleep 10
for c in $kids; do kill -KILL -- -$c 2>/dev/null || kill -KILL $c 2>/dev/null; done
kill -KILL 4666 2>/dev/null
echo "p18 preempted after d10; chain advances to pipeline 19"
