"""Device-side compute ops (pure jnp / Pallas)."""
