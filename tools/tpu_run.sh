#!/bin/bash
# One-shot TPU measurement batch (run when the axon tunnel is back).
# Sequential; everything logs under /tmp/tpu_*.log. See docs/PERF.md
# "Round 3" for the decision rules each measurement feeds:
#   - flip cfg.pallas_inkernel_nee default if entry_iknee < entry_full
#   - retune ops/pallas UNROLL default if entry_u{8,16,24} beat u12
#   - expect entry_step_cap128 ~1.4x SLOWER (capmodel validation)
set -x
cd /root/repo
timeout 240 python -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 1; }
# 1. entry-scene decomposition + flag A/Bs (flat-NEE, batched-shade,
#    in-kernel NEE, unroll retune, step-cap validation) — interleaved
#    medians in one process, the only trustworthy comparison here.
timeout 7200 python tools/probe.py entry --reps 5 > /tmp/tpu_entry.log 2>&1
# 2. step-cap sweep on the pristine frame
timeout 5400 python tools/probe.py frame \
  --tracers proc_pallas,proc_pallas_sc64,proc_pallas_sc128,proc_pallas_sc256 \
  --reps 5 > /tmp/tpu_sweep.log 2>&1
# 3. headline bench
timeout 5400 python bench.py > /tmp/tpu_bench.json 2> /tmp/tpu_bench.log
echo ALL_DONE
