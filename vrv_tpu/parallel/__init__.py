"""Multi-chip scaling: mesh construction + sharded render steps.

The reference is single-GPU (SURVEY.md section 2.4) — everything here is
added capability, built the TPU way: `jax.sharding.Mesh` + `shard_map`
with XLA collectives over ICI, never hand-rolled transports.
"""
