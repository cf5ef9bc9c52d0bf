"""vrv_tpu — a TPU-native voxel path-tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
pimpale/vulkan-raytraced-voxels (reference mounted at /root/reference):
an interactive, procedurally generated voxel world rendered with a
physically based path tracer (NEE + MIS over emissive blocks), with
block place/break editing, simple rigid-body ego physics, and an
event-sourced game loop.

Architecture (TPU-first, not a port):
  - The Vulkan TLAS/BLAS + hardware ray-query stack is replaced by a
    dense voxel grid in HBM marched with Amanatides-Woo 3D-DDA
    (ops/dda.py); chunk meshes are unnecessary because every chunk
    triangle in the reference is a voxel face.
  - The GLSL megakernel (reference src/render_system/pathtrace_shader.rs)
    becomes a jit-compiled wavefront of array ops + Pallas kernels over
    ray batches (render/megakernel.py, ops/pallas/).
  - The murmur3 RNG chain is reproduced bit-exactly (ops/rng.py) so
    renders are comparable draw-for-draw with the reference.
  - Scaling is sample/row-axis data parallelism over a jax.sharding.Mesh
    with psum merges (parallel/), replacing nothing in the reference
    (which is single-GPU) — it is an added capability.
"""

__version__ = "0.1.0"

from vrv_tpu.config import RenderConfig, WorldConfig  # noqa: F401
