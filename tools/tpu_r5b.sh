#!/bin/bash
# Round-5 chip session 2: re-measure after the post-session-1 fixes
# (split-formulation ikr fetch, per-cluster edit-gate boxes, cheap
# per-edit compare, glass-class edits).
set -x
cd /root/repo
timeout 240 python -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 1; }
timeout 7200 python tools/probe.py entry \
  --tracers pristine,entry_full,entry_ikr0,entry_mirror,entry_edits256 --reps 5 \
  > /tmp/tpu_s2_r5.log 2>&1
timeout 3600 python tools/profile_entry.py > /tmp/tpu_xprof2_r5.log 2>&1
timeout 10800 python bench.py > /tmp/tpu_bench2_r5.json 2> /tmp/tpu_bench2_r5.log
echo ALL_DONE
