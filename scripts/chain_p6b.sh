#!/bin/bash
# Wait for the pipeline-6 shell (pid $1) to exit, then run pipeline 6b
# (8x8 phase-3 refine + makeup measures).
while kill -0 "$1" 2>/dev/null; do sleep 60; done
sleep 30   # let the chip settle
bash /root/repo/scripts/r2_pipeline6b.sh > /root/repo/runs/r2_pipeline6b.out 2>&1
