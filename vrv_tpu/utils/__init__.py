"""Host-side utilities: geometry, image IO, profiling, checkpointing."""
