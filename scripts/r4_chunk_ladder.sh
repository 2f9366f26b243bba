#!/bin/bash
# Round-4 chunk ladder — the measured answer to the hero-MFU question
# (VERDICT r3 item 2). The r4 phase profile overturned the r3 reading:
# the d8 hero full step (1446 ms) is E_LOC-dominated (972 ms, 2.7% MFU)
# with the sweep at 204 ms (14%) — and the auto-chunker runs E_loc at
# chunk_size=64 (16 chunks of 16.4k configs). This ladder measures
# whether larger chunks (fewer scan iterations, bigger fused batches)
# buy back E_loc time, stepping 64 -> 128 -> 256 with the builder's
# preflight HBM check as the guard.
set -x
cd /root/repo
for CH in 128 256; do
  timeout 2400 python scripts/gcnn_perf.py configs/j1j2_8x8_gcnn_r2.yaml \
    --mfu --steps 5 --override run.chunk_size=$CH \
    | tee runs/r4_gcnn_profile_chunk$CH.txt
  echo "chunk=$CH rc=$?"
done
# and fully unchunked if 256 looked safe (run manually if so):
#   --override run.chunk_size=1024
echo "chunk ladder done"
