"""Multi-host (DCN) scale-out entry.

Single-host/pod-slice rendering needs nothing beyond the ICI mesh
(parallel/mesh.py). For multi-host demo scale-out the standard JAX
distributed bootstrap is wrapped here; after init, `jax.devices()` spans
all hosts and the same ('samples' x 'rows') mesh + psum code path applies
unchanged — replication of the world arrays happens at jit input
placement, and steady-state cross-host traffic is only the sample-merge
psum (SURVEY.md section 5, distributed backend).

Callers: `app --multihost ADDR,NPROC,PID` (vrv_tpu/app.py). Tested for
real in tests/test_multihost.py: two actual processes bootstrap over a
localhost coordinator, render one frame across the 4-device global mesh
(the psum rides the cross-process transport), and match the
single-process frame byte-for-byte.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed when running multi-process; no-op otherwise.

    Returns the global device count.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def is_primary() -> bool:
    return jax.process_index() == 0
