#!/bin/bash
# One-shot TPU measurement batch (run when the axon tunnel is up).
# Sequential; everything logs under /tmp/tpu_*.log.
#
# Round-4 queue: the march-body micro-op A/B (cfg.pallas_march_opt),
# the block patch-shape A/B (cfg.pallas_tile — capmodel's tile sweep
# predicts), an unroll re-check at the new body, the interleaved
# wavefront-vs-megakernel verdict the round-3 advisor asked for, then
# the bench JSON.
set -x
cd /root/repo
timeout 240 python -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 1; }
# 1. march-opt + tile-shape A/Bs on the graded scene (one process)
timeout 5400 python tools/probe.py entry \
  --tracers pristine,entry_full,entry_mo0,entry_t32,entry_t16 --reps 5 \
  > /tmp/tpu_entry_r4.log 2>&1
# 2. unroll re-check at the new march body
timeout 3600 python tools/probe.py entry \
  --tracers entry_full,entry_mo2,entry_u16 --reps 5 \
  > /tmp/tpu_unroll_r4.log 2>&1
# 3. wavefront vs megakernel, interleaved (advisor round-3 medium item)
timeout 3600 python tools/probe.py frame \
  --tracers proc_pallas,proc_pallas_wave --spp 4 --bounces 4 --reps 7 \
  > /tmp/tpu_wave_r4.log 2>&1
# 4. headline bench (all graded configs + diagnostics)
timeout 7200 python bench.py > /tmp/tpu_bench.json 2> /tmp/tpu_bench.log
echo ALL_DONE
