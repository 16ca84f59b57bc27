"""Which jit PARAMETER makes the slam scan 9x slower?

Round-4 bisection so far: the identical _slam_scan body runs at 1.0 s
when its arrays are closure constants (inlined under an outer jit) and at
9.2 s when they arrive as top-level jit parameters.  xs-scanning the
frames did not fix it.  This probe holds the body fixed (the REAL
engine/slam._slam_scan) and varies only which inputs are parameters:

  allparam — state, poses_all, frames all parameters (= run_sequence_slam)
  posin    — poses_all created inside; state, frames parameters
  framein  — frames closure constants; state, poses_all parameters
  allin    — state the only parameter (poses_all + frames internal)

Run: python benchmarks/slam_arg_probe.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpuvo.config import EngineConfig, PICPConfig
from tpuvo.data import synthetic
from tpuvo.engine import slam as slam_mod
from tpuvo.engine import vo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--landmarks", type=int, default=10000)
    ap.add_argument("--map-capacity", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--variants", default="allparam,posin,framein,allin")
    args = ap.parse_args()

    cfg = EngineConfig(
        mode="fixed", n_frames=args.frames, map_capacity=args.map_capacity,
        fuse_frame_matchers=True, picp=PICPConfig(convergence_threshold=1e-4),
    )
    gt = synthetic.make_loop_trajectory(args.frames, step=1.0, seed=args.seed)
    extent = float(np.abs(gt[:, :2]).max()) + 15.0
    world = synthetic.make_world(args.seed, n_landmarks=args.landmarks,
                                 xy_extent=extent, z_range=(0.0, 8.0))
    seq = synthetic.render_sequence(world, gt, cfg, pixel_noise=0.3,
                                    seed=args.seed)
    seq = jax.tree.map(jnp.asarray, seq)
    F = seq.uv.shape[0]

    key = jax.random.PRNGKey(args.seed)
    f0, f1 = vo.frame_of(seq, 0), vo.frame_of(seq, 1)
    boot = jax.jit(lambda k, a, b: vo.bootstrap(k, a, b, cfg))
    state0, _ = boot(key, f0, f1)
    fc = vo.frames_of(seq, 0, F - 1)
    fn = vo.frames_of(seq, 1, F)
    eye_stack = jnp.broadcast_to(
        jnp.eye(4, dtype=jnp.float32), (F, 4, 4)).copy()

    scan = slam_mod._slam_scan

    @jax.jit
    def allparam(state, poses_all, fc, fn):
        return scan(state, poses_all, fc, fn, cfg)[1]

    @jax.jit
    def posin(state, fc, fn):
        poses_all = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (F, 4, 4)).copy()
        return scan(state, poses_all, fc, fn, cfg)[1]

    @jax.jit
    def framein(state, poses_all):
        return scan(state, poses_all, fc, fn, cfg)[1]

    @jax.jit
    def allin(state):
        poses_all = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (F, 4, 4)).copy()
        return scan(state, poses_all, fc, fn, cfg)[1]

    @jax.jit
    def nested_all(state, poses_all, fc, fn):
        # outer jit but ALL outputs returned (nothing DCE-able)
        return scan(state, poses_all, fc, fn, cfg)

    calls = {
        "allparam": lambda: allparam(state0, eye_stack, fc, fn),
        "posin": lambda: posin(state0, fc, fn),
        "framein": lambda: framein(state0, eye_stack),
        "allin": lambda: allin(state0),
        # the inner jit called DIRECTLY at top level (= run_sequence_slam)
        "direct": lambda: scan(state0, eye_stack, fc, fn, cfg)[1],
        "nested_all": lambda: nested_all(state0, eye_stack, fc, fn)[1],
    }
    for name in args.variants.split(","):
        call = calls[name]
        jax.block_until_ready(call())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(call())
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(json.dumps({"variant": name, "s": round(t, 4),
                          "fps": round((F - 1) / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
