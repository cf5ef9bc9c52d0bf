"""Hand-written TPU kernels (Pallas/Mosaic) for the hot paths.

These are drop-in replacements for the XLA formulations in ops/ — each has
a numerically identical jnp reference implementation that the tests oracle
against (interpret mode on CPU, compiled on TPU). Selection between XLA
and Pallas paths is a config/runtime decision driven by measured
throughput on the target chip (tools/probe_tpu.py).
"""
