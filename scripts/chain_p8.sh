#!/bin/bash
# Wait for the chain_p7 watcher (pid $1, which itself runs pipeline 7) to
# exit, then run pipeline 8.
while kill -0 "$1" 2>/dev/null; do sleep 60; done
sleep 30
bash /root/repo/scripts/r2_pipeline8.sh > /root/repo/runs/r2_pipeline8.out 2>&1
