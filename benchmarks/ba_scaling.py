"""Distributed-BA scaling benchmark (BASELINE.json configs 3 & 5).

Measures BA iterations/s for the windowed Schur solver:
  * single device, window=10, bundled-map scale (512 landmarks)
  * sharded across N devices at 100k synthetic landmarks, reporting
    scaling efficiency vs N=1

Run on real hardware:   python benchmarks/ba_scaling.py
Virtual 8-device CPU:   XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                        JAX_PLATFORMS=cpu python benchmarks/ba_scaling.py
Results are appended to benchmarks/results.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS=cpu even under the TPU plugin's sitecustomize, which
# re-pins the platform during registration
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def build_problem(W: int, L: int, obs_per_frame: int, seed: int = 0):
    import jax.numpy as jnp

    from tpuvo.ba.window import BAProblem
    from tpuvo.config import EngineConfig
    from tpuvo.data import synthetic

    cfg = EngineConfig()
    rng = np.random.default_rng(seed)
    world = synthetic.make_world(seed, n_landmarks=L, xy_extent=50.0, z_range=(0.0, 10.0))
    gt = synthetic.make_planar_trajectory(W, step=1.0, turn=0.03, seed=seed)

    poses = np.stack(
        [np.linalg.inv(synthetic.camera_pose_from_gt(g, cfg)) for g in gt]
    ).astype(np.float32)

    # synthetic observation set: each frame observes obs_per_frame random
    # landmarks (projected exactly, then perturbed)
    obs_uv = np.zeros((W, obs_per_frame, 2), np.float32)
    obs_lm = np.zeros((W, obs_per_frame), np.int32)
    obs_valid = np.zeros((W, obs_per_frame), bool)
    K = cfg.K()
    for f in range(W):
        lm = rng.choice(L, obs_per_frame, replace=False)
        p_cam = world.xyz[lm] @ poses[f][:3, :3].T + poses[f][:3, 3]
        ok = p_cam[:, 2] > 0.1
        ph = p_cam @ K.T
        with np.errstate(divide="ignore", invalid="ignore"):
            uv = ph[:, :2] / ph[:, 2:3]
        ok &= np.isfinite(uv).all(1)
        obs_uv[f] = np.nan_to_num(uv) + 0.3 * rng.standard_normal((obs_per_frame, 2))
        obs_lm[f] = lm
        obs_valid[f] = ok
    fixed = np.zeros(W, bool)
    fixed[:2] = True
    return cfg, BAProblem(
        poses=jnp.asarray(poses),
        points=jnp.asarray(world.xyz + 0.05 * rng.standard_normal(world.xyz.shape).astype(np.float32)),
        obs_uv=jnp.asarray(obs_uv),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(obs_valid),
        point_valid=jnp.ones(L, bool),
        fixed=jnp.asarray(fixed),
    )


def bench_single(W=10, L=512, obs=128, iters=20, reps=3):
    import jax
    import jax.numpy as jnp

    from tpuvo.ba.window import ba_solve
    from tpuvo.config import BAConfig

    cfg, prob = build_problem(W, L, obs)
    ba_cfg = BAConfig(iterations=iters)
    K = jnp.asarray(cfg.K())
    solve = jax.jit(lambda p: ba_solve(p, K, cfg.width, cfg.height, ba_cfg))
    jax.block_until_ready(solve(prob)[0].poses)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(solve(prob)[0].poses)
    dt = (time.perf_counter() - t0) / reps
    return iters / dt


def bench_sharded(n_devices, W=10, L=100_000, obs=128, iters=10, reps=3):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpuvo.config import BAConfig
    from tpuvo.parallel.ba_sharded import shard_ba_problem, sharded_ba_solve

    cfg, prob = build_problem(W, L, obs)
    ba_cfg = BAConfig(iterations=iters)
    K = jnp.asarray(cfg.K())
    sp = shard_ba_problem(prob, n_devices)
    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("lm",))

    @jax.jit
    def solve(poses, points):
        sp2 = sp._replace(poses=poses, points=points)
        out, stats = sharded_ba_solve(mesh, sp2, K, cfg.width, cfg.height, ba_cfg)
        return out.poses, out.points

    jax.block_until_ready(solve(sp.poses, sp.points)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(solve(sp.poses, sp.points)[0])
    dt = (time.perf_counter() - t0) / reps
    return iters / dt


def main():
    import jax

    out = {
        "device": str(jax.devices()[0]),
        "n_devices": jax.device_count(),
    }
    out["ba_iters_per_s_w10_L512"] = round(bench_single(), 2)
    n = jax.device_count()
    if n >= 2:
        big_L = int(os.environ.get("TPUVO_BA_L", "100000"))
        one = bench_sharded(1, L=big_L)
        many = bench_sharded(n, L=big_L)
        out["ba_iters_per_s_100k_1dev"] = round(one, 2)
        out[f"ba_iters_per_s_100k_{n}dev"] = round(many, 2)
        out["scaling_efficiency"] = round(many / (one * n), 3)
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps({"ts": time.time(), **out}) + "\n")


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: F401  (import after flags)

    main()
