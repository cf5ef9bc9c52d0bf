#!/bin/bash
# One-shot TPU measurement batch (run when the axon tunnel is up).
# Sequential; everything logs under /tmp/tpu_*.log.
#
# Most round-3 A/Bs were measured on-chip 2026-08-19 (docs/PERF.md):
# in-kernel NEE ON, unroll 24, step_cap stays 0, tex dedup kept,
# tex_fetch='split', pdf records ON, 8x1spp chunking. What remains is
# re-measuring the production config after any fresh commits (the uv
# relayout landed unmeasured) and recording the bench JSON.
set -x
cd /root/repo
timeout 240 python -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 1; }
# 1. production-config decomposition (interleaved medians, one process)
timeout 3600 python tools/probe.py entry \
  --tracers pristine,entry_full,entry_nonee --reps 5 \
  > /tmp/tpu_entry_r3c.log 2>&1
# 2. headline bench (all graded configs + diagnostics)
timeout 7200 python bench.py > /tmp/tpu_bench.json 2> /tmp/tpu_bench.log
echo ALL_DONE
