#!/bin/bash
# Wait for the chain_p8 watcher (pid $1, which itself runs pipeline 8) to
# exit, then run pipeline 9.
while kill -0 "$1" 2>/dev/null; do sleep 60; done
sleep 30
bash /root/repo/scripts/r2_pipeline9.sh > /root/repo/runs/r2_pipeline9.out 2>&1
