"""Isolate slam-scan structural overhead (historical round-4 bisection
probe).  NOTE: the "45 ms/step cond" hypothesis this probe was built to
test was ultimately FALSIFIED — the real cliff was per-call bootstrap
recompilation (DESIGN.md §10); these variants were the experiments that
proved the scan/cond/ys structure itself is cheap.

Variants (each its own compiled program):
  A — plain tracker replica: scan over stacked frames as scan-xs
  B — A + carried poses_all/ring buffers + dynamic frames[k] indexing
      (no cond anywhere)
  C — B + lax.cond with the do_ba true branch, predicate ALWAYS false
  D — B + lax.cond whose true branch is a cheap no-op (isolates cond
      machinery from branch content)

Run: python benchmarks/slam_cond_probe.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpuvo.ba.window import BAProblem, ba_solve
from tpuvo.config import EngineConfig, PICPConfig
from tpuvo.data import synthetic
from tpuvo.engine import vo
from tpuvo.engine.slam import _local_ba_cfg
from tpuvo.ops import lie


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--landmarks", type=int, default=10000)
    ap.add_argument("--map-capacity", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--variants", default="A,B,C,D")
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
    N = seq.uv.shape[1]
    W = cfg.local_ba_window
    K = jnp.asarray(cfg.K())
    ba_cfg = _local_ba_cfg(cfg)

    key = jax.random.PRNGKey(args.seed)
    f0, f1 = vo.frame_of(seq, 0), vo.frame_of(seq, 1)
    boot = jax.jit(lambda k, a, b: vo.bootstrap(k, a, b, cfg))
    state0, _ = boot(key, f0, f1)
    frames = vo.frames_of(seq, 0, F)

    def make_do_ba():
        def do_ba(carry):
            state, poses_all, buf_lm, buf_valid, k = carry
            lo = k - W + 1
            ring = jnp.mod(lo + jnp.arange(W, dtype=jnp.int32), W)
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, W, axis=0)
            win_poses = sl(poses_all)
            wic = jax.vmap(lie.inv_se3)(win_poses)
            fixed = jnp.arange(W) < 2
            prob = BAProblem(
                poses=wic, points=state.map_xyz, obs_uv=sl(frames.uv),
                obs_lm=buf_lm[ring], obs_valid=buf_valid[ring],
                point_valid=state.map_valid, fixed=fixed,
            )
            prob2, _ = ba_solve(prob, K, cfg.width, cfg.height, ba_cfg)
            ok = jnp.all(jnp.isfinite(prob2.poses)) & jnp.all(
                jnp.isfinite(prob2.points))
            new_cw = jax.vmap(lie.inv_se3)(prob2.poses)
            upd = jnp.where((ok & ~fixed)[:, None, None], new_cw, win_poses)
            poses_all = jax.lax.dynamic_update_slice_in_dim(
                poses_all, upd, lo, axis=0)
            state = state._replace(
                map_xyz=jnp.where(ok, prob2.points, state.map_xyz),
                pose=poses_all[k])
            return state, poses_all, buf_lm, buf_valid, jnp.int32(1)
        return do_ba

    @jax.jit
    def variant_A(state):
        fc = vo.frames_of(seq, 0, F - 1)
        fn = vo.frames_of(seq, 1, F)
        return vo.scan_tracker(state, fc, fn, cfg)[1].pose

    @jax.jit
    def variant_B(state):
        poses_all = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (F, 4, 4)).copy()
        buf_lm = jnp.zeros((W, N), jnp.int32)
        buf_valid = jnp.zeros((W, N), bool)

        def step(carry, k):
            state, poses_all, buf_lm, buf_valid = carry
            curr = jax.tree.map(lambda a: a[k - 1], frames)
            nxt = jax.tree.map(lambda a: a[k], frames)
            state, log, (mi, mv, _ns, _nu, _nv) = vo.track_step(
                state, curr, nxt, cfg, return_matches=True)
            poses_all = poses_all.at[k].set(log.pose)
            slot = jnp.mod(k, W)
            buf_lm = buf_lm.at[slot].set(mi)
            buf_valid = buf_valid.at[slot].set(mv)
            return (state, poses_all, buf_lm, buf_valid), log.pose

        (state, poses_all, _, _), poses = jax.lax.scan(
            step, (state, poses_all, buf_lm, buf_valid),
            jnp.arange(1, F, dtype=jnp.int32))
        return poses_all

    def make_cond_variant(true_branch):
        @jax.jit
        def variant(state):
            poses_all = jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32), (F, 4, 4)).copy()
            buf_lm = jnp.zeros((W, N), jnp.int32)
            buf_valid = jnp.zeros((W, N), bool)

            def step(carry, k):
                state, poses_all, buf_lm, buf_valid = carry
                curr = jax.tree.map(lambda a: a[k - 1], frames)
                nxt = jax.tree.map(lambda a: a[k], frames)
                state, log, (mi, mv, _ns, _nu, _nv) = vo.track_step(
                    state, curr, nxt, cfg, return_matches=True)
                poses_all = poses_all.at[k].set(log.pose)
                slot = jnp.mod(k, W)
                buf_lm = buf_lm.at[slot].set(mi)
                buf_valid = buf_valid.at[slot].set(mv)
                state, poses_all, buf_lm, buf_valid, _ = jax.lax.cond(
                    k > 10**6,  # never true
                    true_branch,
                    lambda c: (c[0], c[1], c[2], c[3], jnp.int32(0)),
                    (state, poses_all, buf_lm, buf_valid, k),
                )
                return (state, poses_all, buf_lm, buf_valid), log.pose

            (state, poses_all, _, _), poses = jax.lax.scan(
                step, (state, poses_all, buf_lm, buf_valid),
                jnp.arange(1, F, dtype=jnp.int32))
            return poses_all
        return variant

    def make_fullog_variant(true_branch, every):
        """Exact replica of engine/slam._slam_scan: full FrameLog ys,
        n_ba carry, (k >= W) & (k % E == 0) predicate."""
        E = every

        @jax.jit
        def variant(state):
            poses_all = jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32), (F, 4, 4)).copy()
            buf_lm = jnp.zeros((W, N), jnp.int32)
            buf_valid = jnp.zeros((W, N), bool)

            def step(carry, k):
                state, poses_all, buf_lm, buf_valid, n_ba = carry
                curr = jax.tree.map(lambda a: a[k - 1], frames)
                nxt = jax.tree.map(lambda a: a[k], frames)
                state, log, (mi, mv, _ns, _nu, _nv) = vo.track_step(
                    state, curr, nxt, cfg, return_matches=True)
                poses_all = poses_all.at[k].set(log.pose)
                slot = jnp.mod(k, W)
                buf_lm = buf_lm.at[slot].set(mi)
                buf_valid = buf_valid.at[slot].set(mv)
                state, poses_all, buf_lm, buf_valid, ran = jax.lax.cond(
                    (k >= W) & (k % E == 0),
                    true_branch,
                    lambda c: (c[0], c[1], c[2], c[3], jnp.int32(0)),
                    (state, poses_all, buf_lm, buf_valid, k),
                )
                return (state, poses_all, buf_lm, buf_valid, n_ba + ran), log

            (state, poses_all, _, _, n_ba), logs = jax.lax.scan(
                step, (state, poses_all, buf_lm, buf_valid, jnp.int32(0)),
                jnp.arange(1, F, dtype=jnp.int32))
            return poses_all
        return variant

    from tpuvo.engine import slam as slam_mod

    @jax.jit
    def variant_G(state):
        poses_all = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (F, 4, 4)).copy()
        out = slam_mod._slam_scan(
            state, poses_all, vo.frames_of(seq, 0, F - 1),
            vo.frames_of(seq, 1, F), cfg)
        return out[1]

    noop = lambda c: (c[0], c[1], c[2], c[3], jnp.int32(1))
    variants = {
        "A": variant_A,
        "B": variant_B,
        "C": make_cond_variant(make_do_ba()),
        "D": make_cond_variant(noop),
        # E: replica with full-FrameLog ys, BA never fires (E huge)
        "E": make_fullog_variant(make_do_ba(), 10**6),
        # F: replica with full-FrameLog ys, BA fires every 2nd step
        "F": make_fullog_variant(make_do_ba(), 2),
        # G: the real engine/slam._slam_scan
        "G": variant_G,
    }

    def variant_H(state):
        _, _, poses, _ = slam_mod.run_sequence_slam(seq, cfg, seed=args.seed)
        return poses

    variants["H"] = variant_H  # the full user-facing wrapper
    for name in args.variants.split(","):
        fn = variants[name]
        jax.block_until_ready(fn(state0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(state0))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(json.dumps({"variant": name, "s": round(t, 4),
                          "ms_per_step": round(1e3 * t / (F - 1), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
