#!/bin/bash
# Round-5 follower queue: waits for the main r5 queue (pid in
# /tmp/r5_queue.pid) to finish, then runs the second wave serially:
# kagome Lanczos refine, the t-VMC quench retry (leg 2 of r4_pipeline4,
# which died on a transient tunnel error), the direct (pi,pi) sector
# gap, the Lanczos error-bar re-measure, and a bench band capture.
cd /root/repo
MAIN_PID=$(cat /tmp/r5_queue.pid 2>/dev/null)
while [ -n "$MAIN_PID" ] && kill -0 "$MAIN_PID" 2>/dev/null; do sleep 30; done
{
  date; echo "=== pipeline 7: kagome lanczos refine ==="
  bash scripts/r5_pipeline7.sh
  date; echo "=== t-VMC quench retry (r4_pipeline4 leg 2) ==="
  timeout 8000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
    --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
    --override model.complex_params=true --override 'model.channels=[16,16]' \
    --override model.init_mode=fan_in \
    --override 'model.phase_net_channels=[16,16,16,16]' \
    --override sampler.n_walkers=2048 --override sampler.move=flip \
    --mode real --init-from runs/tfim8x8_h3pn_ckpt --dt 0.0025 --steps 280 \
    --diag-shift 0.01 --sampling mc --csv runs/tvmc_tfim8x8_quench_pn.csv \
    > runs/tvmc_tfim8x8_quench_pn.out 2>&1
  echo "tvmc-pn retry rc=$?"
  date; echo "=== pipeline 6: direct (pi,pi) sector gap ==="
  bash scripts/r5_pipeline6.sh
  date; echo "=== pipeline 5: lanczos err re-measure ==="
  bash scripts/r5_pipeline5.sh
  date; echo "=== bench band capture ==="
  timeout 3000 python bench.py > runs/bench_r5.json 2> runs/bench_r5.log
  echo "bench rc=$?"
  date; echo "=== r5 queue2 done ==="
} >> runs/r5_queue2.log 2>&1
