"""End-to-end gate on the graded benchmark artifact.

Runs `BENCH_SMOKE=1 python bench.py` (tiny shapes, CPU) in a clean
subprocess and validates the one-line JSON contract the driver records:
required keys present, the headline value positive, and the production
ladder rung (not a fallback) the one that ran. Protects the round's
recorded number from Python-level regressions in bench.py itself —
the measured values are meaningless on CPU and not asserted.
"""

import json
import subprocess
import sys

from tests.conftest import REPO_ROOT, clean_env


def test_bench_smoke_json_contract():
    env = clean_env(n_devices=1)
    env["BENCH_SMOKE"] = "1"
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO_ROOT,
    )
    assert out.returncode == 0, f"bench.py failed:\n{out.stdout}\n{out.stderr}"
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    for key in (
        "metric", "value", "unit", "vs_baseline", "scene",
        "entry_onejit_fps", "pristine_fused_fps",
        "converged_128spp_fps", "converged_128spp_vs_baseline",
        "converged_128spp_hostloop_fps", "converged_128spp_onejit_fps",
        "wavefront_4spp_4b_fps", "megakernel_4spp_4b_fps",
        "entry_split_nee_fps", "entry_step_cap128_fps",
    ):
        assert key in rec, f"missing JSON key {key}: {line}"
    assert rec["unit"] == "fps"
    assert rec["value"] > 0
    # the production rung must run (fallback rungs signal a broken kernel)
    assert rec["scene"].startswith("entry (lamp + edit"), rec["scene"]
    assert rec["pristine_fused_fps"] > 0
    assert rec["converged_128spp_fps"] >= max(
        rec["converged_128spp_hostloop_fps"],
        rec["converged_128spp_onejit_fps"],
    ) - 1e-9
