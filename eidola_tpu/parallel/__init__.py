"""Multi-chip scaling: pixel-space sharding over a jax.sharding.Mesh."""
