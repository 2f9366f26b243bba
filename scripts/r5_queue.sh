#!/bin/bash
# Round-5 serial chip queue: the four VERDICT r4 chip items in priority
# order. Each pipeline supervises its own runs (chip flock serializes);
# rc and timing land in runs/r5_queue.log.
cd /root/repo
{
  date; echo "=== pipeline 1: wide 8x8 rung ==="
  bash scripts/r5_pipeline1.sh
  date; echo "=== pipeline 2: kagome lanczos ansatz ==="
  bash scripts/r5_pipeline2.sh
  date; echo "=== pipeline 4 (r4): t-VMC structural arm ==="
  bash scripts/r4_pipeline4.sh
  date; echo "=== pipeline 3: 8x8 E1 deflation ==="
  bash scripts/r5_pipeline3.sh
  date; echo "=== r5 queue done ==="
} >> runs/r5_queue.log 2>&1
