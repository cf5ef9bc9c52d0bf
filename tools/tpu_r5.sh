#!/bin/bash
# One-shot round-5 TPU measurement batch (run when the axon tunnel is up).
# Sequential; everything logs under /tmp/tpu_*_r5.log.
#
# Round-5 queue (docs/PERF.md "Round 5"):
#   1. in-kernel radiance A/B (the 93 ms XLA-glue item) + unroll re-check
#   2. gameplay-cliff scenes: mirror edit + 256-edit build (edit gate)
#   3. Pallas-under-shard_map on the real chip (1-device mesh)
#   4. xprof of the production entry frame (kernel share target >= 85%)
#   5. headline bench JSON (incl. converged c16 + cliff diagnostics)
set -x
cd /root/repo
timeout 240 python -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 1; }
# 1. ikr A/B + unroll recheck on the graded scene (one process)
timeout 7200 python tools/probe.py entry \
  --tracers pristine,entry_full,entry_ikr0,entry_ikr_u16,entry_ikr_u32 --reps 5 \
  > /tmp/tpu_ikr_r5.log 2>&1
# 2. cliff scenes, interleaved with the production entry frame
timeout 7200 python tools/probe.py entry \
  --tracers entry_full,entry_mirror,entry_edits256 --reps 5 \
  > /tmp/tpu_cliff_r5.log 2>&1
# 3. shard_map-on-chip: 1-device mesh vs plain dispatch (8-spp frame)
timeout 5400 python tools/probe.py entry \
  --tracers entry_one8,entry_shmap1 --reps 5 \
  > /tmp/tpu_shmap_r5.log 2>&1
# 4. device profile of the production frame (fused-kernel share)
timeout 3600 python tools/profile_entry.py > /tmp/tpu_xprof_r5.log 2>&1
# 5. headline bench (all graded configs + round-5 diagnostics)
timeout 10800 python bench.py > /tmp/tpu_bench_r5.json 2> /tmp/tpu_bench_r5.log
echo ALL_DONE
