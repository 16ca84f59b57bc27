"""Windowed BA refinement of a tracked trajectory ("full BA" pass).

The tracker (engine/vo.py) is frame-to-frame PICP; this pass re-optimizes
poses + landmarks jointly over sliding windows — the layer the reference
lacks entirely (SURVEY.md §2 parallelism table, BASELINE.json configs 3/4).

Strategy: slide a W-frame window with 50% overlap along the trajectory.
Each window re-matches its frames against the (frozen-topology) map, fixes
its first two poses (gauge + scale anchor to the already-refined prefix),
runs the Schur BA solver, and writes back the improved poses and landmark
positions.  Every window has identical shapes, so the solver compiles once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpuvo.ba.window import BAProblem, ba_solve
from tpuvo.config import BAConfig, EngineConfig
from tpuvo.ops import lie
from tpuvo.ops.match import match_descriptors


def refine_trajectory(
    state,
    seq,
    poses,
    cfg: EngineConfig | None = None,
    ba_cfg: BAConfig | None = None,
):
    """poses: (F, 4, 4) camera-in-world from the tracker.

    Returns (refined poses (F, 4, 4), refined map_xyz (C, 3), stats list).
    """
    cfg = cfg or EngineConfig()
    ba_cfg = ba_cfg or BAConfig()
    W = ba_cfg.window
    F = seq.uv.shape[0]
    K = jnp.asarray(cfg.K())

    poses = np.asarray(poses).copy()
    points = jnp.asarray(state.map_xyz)
    point_valid = jnp.asarray(state.map_valid)
    map_desc = jnp.asarray(state.map_desc)

    match_j = jax.jit(
        lambda d, v: match_descriptors(
            d, v, map_desc, point_valid,
            cfg.matcher.distance_threshold, cfg.matcher.ratio_threshold,
            cfg.matcher.method,
        )
    )
    solve_j = jax.jit(
        lambda prob: ba_solve(prob, K, cfg.width, cfg.height, ba_cfg)
    )

    # precompute per-frame correspondences against the final map
    N = seq.uv.shape[1]
    obs_lm = np.zeros((F, N), np.int32)
    obs_valid = np.zeros((F, N), bool)
    for f in range(F):
        res = match_j(jnp.asarray(seq.desc[f]), jnp.asarray(seq.valid[f]))
        obs_lm[f] = np.asarray(res.idx)
        obs_valid[f] = np.asarray(res.valid)

    fixed = np.zeros(W, bool)
    fixed[:2] = True
    stats_out = []
    step_size = max(W // 2, 1)
    for lo in range(0, F - W + 1, step_size):
        idxs = list(range(lo, lo + W))
        wic = np.stack([np.linalg.inv(poses[i]) for i in idxs]).astype(np.float32)
        prob = BAProblem(
            poses=jnp.asarray(wic),
            points=points,
            obs_uv=jnp.asarray(seq.uv[lo : lo + W]),
            obs_lm=jnp.asarray(obs_lm[lo : lo + W]),
            obs_valid=jnp.asarray(obs_valid[lo : lo + W]),
            point_valid=point_valid,
            fixed=jnp.asarray(fixed),
        )
        prob2, stats = solve_j(prob)
        new_wic = np.asarray(prob2.poses)
        # graceful degradation: a window whose solve diverged (non-finite)
        # is skipped — its frames keep the tracked poses
        if np.all(np.isfinite(new_wic)):
            for k, i in enumerate(idxs):
                if not fixed[k]:
                    poses[i] = np.linalg.inv(new_wic[k])
            new_pts = np.asarray(prob2.points)
            ok = np.isfinite(new_pts).all(axis=1)
            points = jnp.asarray(
                np.where(ok[:, None], new_pts, np.asarray(points))
            )
            skipped = False
        else:
            skipped = True
        stats_out.append(
            {"window": lo, "chi": float(stats.chi),
             "inliers": int(stats.num_inliers), "skipped": skipped}
        )
    return poses, np.asarray(points), stats_out
