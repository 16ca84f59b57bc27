"""SLAM-mode tracking: the frame-to-frame tracker with an interleaved
local bundle-adjustment backend, as ONE compiled program.

NEW layer with no reference counterpart.  The reference (and the plain
``run_sequence`` tracker replicating it, exec/icp_test.cpp:61-136) never
revisits a pose: each frame's PICP solve is final, and newly triangulated
landmarks inherit whatever scale that single solve carried.  On
KITTI-scale forward motion (~1 m/frame) that per-frame scale handoff is
an un-damped multiplicative feedback loop — measured collapse to 20 m of
estimated path on a 199 m ground-truth loop (ATE 28.6).  Interleaving a
sliding-window BA (the standard modern-VO "local mapping" backend —
PTAM/ORB-SLAM architecture) re-estimates the last W poses and their
landmarks jointly every E frames, replacing the per-frame handoff with a
well-conditioned multi-view one: the same sequence tracks to ATE 1.4,
and the full backend stack (loop closure ba/loop.py + graduated global
BA engine/ba_refine.py) recovers ATE 0.20.

TPU-first: the whole run — every track step, every window re-match,
every BA solve — is a single ``lax.scan`` program.  The BA fires inside
``lax.cond`` (a true branch on TPU: skipped steps cost nothing), window
extraction is a dynamic slice of the carried (F, 4, 4) pose array, and
the solve is the same Schur-complement ``ba_solve`` the offline refiners
and the sharded multi-chip path use (ba/window.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpuvo.ba.window import BAProblem, ba_solve
from tpuvo.config import BAConfig, EngineConfig
from tpuvo.engine import vo
from tpuvo.ops import lie


def _local_ba_cfg(cfg: EngineConfig) -> BAConfig:
    return BAConfig(
        window=cfg.local_ba_window,
        iterations=cfg.local_ba_iterations,
        huber_threshold=cfg.ba.huber_threshold,
        max_landmarks=cfg.map_capacity,
        cull_bounds=False,  # refinement semantics (see BAConfig.cull_bounds)
    )


@partial(jax.jit, static_argnames=("cfg",))
def _slam_scan(state, poses_all, frames: vo.Frame, cfg: EngineConfig):
    """Track frames 1..F-1 with interleaved local BA.  Returns
    (final state, corrected poses_all, FrameLog stack, n_ba_runs).

    ``frames``: the whole sequence as a stacked Frame ((F, ...) leaves).

    The local-BA branch reuses the 2D-3D correspondences the tracker
    already computed: each step's ``(m_map.idx, m_map.valid)`` lands in a
    W-slot ring buffer (slot = frame % W), and ``do_ba`` gathers the
    window rows from the ring instead of re-matching W frames against the
    full map (the round-3 design re-matched — 28 ms of the 96 ms per-BA
    cost at a 8k-capacity map).  A frame's carried matches only see
    landmarks that existed when it was tracked (standard local-mapping
    semantics); landmarks appended later are picked up by later frames.
    """
    K = jnp.asarray(cfg.K())
    F = frames.uv.shape[0]
    N = frames.uv.shape[1]
    W = cfg.local_ba_window
    E = cfg.local_ba_every
    ba_cfg = _local_ba_cfg(cfg)

    def do_ba(carry):
        state, poses_all, buf_lm, buf_valid, k = carry
        lo = k - W + 1
        # ring -> window order: frame f lives in slot f % W
        ring = jnp.mod(lo + jnp.arange(W, dtype=jnp.int32), W)
        obs_lm = buf_lm[ring]
        obs_valid = buf_valid[ring]
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, W, axis=0)
        win_poses = sl(poses_all)
        wic = jax.vmap(lie.inv_se3)(win_poses)
        fixed = jnp.arange(W) < 2  # gauge+scale anchor to the prefix
        prob = BAProblem(
            poses=wic, points=state.map_xyz, obs_uv=sl(frames.uv),
            obs_lm=obs_lm, obs_valid=obs_valid,
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
            pose=poses_all[k],
        )
        return state, poses_all, buf_lm, buf_valid, jnp.int32(1)

    def step(carry, k):
        state, poses_all, buf_lm, buf_valid, n_ba = carry
        curr = jax.tree.map(lambda a: a[k - 1], frames)
        nxt = jax.tree.map(lambda a: a[k], frames)
        state, log, (m_idx, m_valid) = vo.track_step(
            state, curr, nxt, cfg, return_matches=True)
        poses_all = poses_all.at[k].set(log.pose)
        slot = jnp.mod(k, W)
        buf_lm = buf_lm.at[slot].set(m_idx)
        buf_valid = buf_valid.at[slot].set(m_valid)
        state, poses_all, buf_lm, buf_valid, ran = jax.lax.cond(
            (k >= W) & (k % E == 0),
            do_ba,
            lambda c: (c[0], c[1], c[2], c[3], jnp.int32(0)),
            (state, poses_all, buf_lm, buf_valid, k),
        )
        return (state, poses_all, buf_lm, buf_valid, n_ba + ran), log

    buf_lm = jnp.zeros((W, N), jnp.int32)
    buf_valid = jnp.zeros((W, N), bool)
    (state, poses_all, _, _, n_ba), logs = jax.lax.scan(
        step, (state, poses_all, buf_lm, buf_valid, jnp.int32(0)),
        jnp.arange(1, F, dtype=jnp.int32))
    return state, poses_all, logs, n_ba


def run_sequence_slam(seq, cfg: EngineConfig | None = None, seed: int = 42
                      ) -> Tuple[object, object, jnp.ndarray, dict]:
    """End-to-end SLAM-mode VO: bootstrap + tracking with local BA.

    Same signature/returns as ``vo.run_sequence``: (final state, logs,
    poses (F, 4, 4) camera-in-world, diag).  The returned poses include
    the local-BA corrections (``logs.pose`` keeps the raw per-frame
    tracking estimates for diagnostics).
    """
    cfg = cfg or EngineConfig()
    key = jax.random.PRNGKey(seed)
    F = seq.uv.shape[0]

    f0 = vo.frame_of(seq, 0)
    f1 = vo.frame_of(seq, 1)
    boot = jax.jit(lambda k, a, b: vo.bootstrap(k, a, b, cfg))
    state, diag = boot(key, f0, f1)

    poses_all = jnp.broadcast_to(
        jnp.eye(4, dtype=jnp.float32), (F, 4, 4)).copy()
    frames = vo.frames_of(seq, 0, F)
    state, poses_all, logs, n_ba = _slam_scan(state, poses_all, frames, cfg)
    diag = dict(diag)
    diag["n_local_ba_runs"] = n_ba
    return state, logs, poses_all, diag
