#!/bin/bash
# Round-3 pipeline 2c — the MFU table on the real chip (VERDICT item 4),
# spliced early so it is banked before the long p3/p4 legs.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p2b.wait) 2>/dev/null; do sleep 60; done
timeout 5000 python scripts/mfu_report.py --out runs/mfu_report.md \
  > runs/mfu_report.log 2>&1
echo "mfu rc=$?"
echo "pipeline2c done"
