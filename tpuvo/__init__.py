"""tpuvo — TPU-native visual odometry / SfM engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference C++ pipeline (llepa/02-VisualOdometry): descriptor matching,
essential-matrix bootstrap, DLT triangulation, projective-ICP tracking
(Gauss-Newton on SE(3)), incremental mapping, Sim(3) trajectory alignment —
plus a sharded sliding-window bundle-adjustment layer the reference lacks.

Design rules (TPU-first, not a port):
  * all state lives in fixed-capacity padded arrays (static shapes for XLA);
  * every per-point loop in the reference is a vmap/mask here;
  * the whole per-frame tracking step compiles to one XLA program
    (`lax.scan` over the sequence — zero host round-trips);
  * multi-chip scaling via `jax.sharding.Mesh` + `shard_map` collectives.
"""

import os as _os

import jax as _jax

# Geometry pipelines are precision-critical: TPU's default bf16 matmul
# passes destroy triangulation/solver accuracy (ATE 0.195 -> 3.2 on the
# bundled sequence).  Force true-f32 matmuls; the matrices here are tiny,
# so the multi-pass cost is negligible next to the accuracy cliff.
if _os.environ.get("TPUVO_MATMUL_PRECISION", "highest") != "default":
    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ.get("TPUVO_MATMUL_PRECISION", "highest"),
    )

# Honor JAX_PLATFORMS even when a site hook has already pinned the platform
# config (some TPU plugin environments re-pin it in sitecustomize, which
# silently overrides the user's env var for every entry point).
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms and _jax.config.jax_platforms != _env_platforms:
    _jax.config.update("jax_platforms", _env_platforms)

from tpuvo.config import EngineConfig, MatcherConfig, PICPConfig, RansacConfig

__version__ = "0.1.0"

__all__ = [
    "EngineConfig",
    "MatcherConfig",
    "PICPConfig",
    "RansacConfig",
    "__version__",
]
