"""Device-side geometry/compute ops (all pure jnp, vmappable, jit-safe)."""
