"""Landmark-sharded distributed bundle adjustment (the flagship collective).

MegBA-style distributed Schur (SURVEY.md §5): landmarks (and the
observations that reference them) are partitioned across devices; each
device linearizes only its own observations, Schur-eliminates its landmark
blocks locally (block-diagonal => embarrassingly parallel), and contributes
a partial reduced camera system.  The ONLY cross-device traffic per
iteration is ``psum`` of the (6W)^2 + 6W reduced system — independent of
the landmark count — which XLA lowers onto ICI/DCN.  Every device then
solves the same small dense system (replicated, cheaper than sharding it)
and back-substitutes its local landmarks with zero further communication.

Scaling to 100k+ landmarks across N >= 2 hosts is a data-layout exercise:
``shard_ba_problem`` partitions observations by landmark owner on the host;
the per-iteration math is identical to the single-chip path
(tpuvo/ba/window.py — shared helpers, one code path to trust).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpuvo.ba.window import (
    BAProblem,
    BAStats,
    backsubstitute,
    finalize_reduced,
    invert_hll,
    linearize_ba,
    schur_parts,
)
from tpuvo.config import BAConfig


class ShardedBAProblem(NamedTuple):
    """BAProblem re-laid-out with a leading shard axis.

    poses:     (W, 4, 4) — replicated
    points:    (S, Ls, 3) — landmark shard per device (local index space)
    point_valid: (S, Ls)
    obs_uv:    (S, W, Np, 2) — observations owned by each shard
    obs_lm:    (S, W, Np) int32 — LOCAL landmark indices
    obs_valid: (S, W, Np)
    fixed:     (W,) — replicated
    lm_perm:   (S * Ls,) global landmark id of each (shard, slot) — host-side
               bookkeeping for scattering results back
    """

    poses: jnp.ndarray
    points: jnp.ndarray
    point_valid: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_valid: jnp.ndarray
    fixed: jnp.ndarray
    lm_perm: np.ndarray


def shard_ba_problem(problem: BAProblem, n_shards: int, obs_pad_to: int | None = None) -> ShardedBAProblem:
    """Host-side partitioner: contiguous landmark blocks -> shards, and each
    observation moves to its landmark's owner (re-padded per (shard, frame))."""
    poses = np.asarray(problem.poses)
    points = np.asarray(problem.points)
    pvalid = np.asarray(problem.point_valid)
    obs_uv = np.asarray(problem.obs_uv)
    obs_lm = np.asarray(problem.obs_lm)
    obs_valid = np.asarray(problem.obs_valid)
    W, N = obs_lm.shape
    L = points.shape[0]
    Ls = -(-L // n_shards)
    L_pad = Ls * n_shards

    pts_pad = np.zeros((L_pad, 3), points.dtype)
    pts_pad[:L] = points
    pv_pad = np.zeros(L_pad, bool)
    pv_pad[:L] = pvalid

    owner = obs_lm // Ls          # (W, N) shard of each observation
    local = obs_lm - owner * Ls   # local landmark slot

    # per-(shard, frame) packing
    if obs_pad_to is None:
        obs_pad_to = 0
        for s in range(n_shards):
            for f in range(W):
                obs_pad_to = max(obs_pad_to, int(((owner[f] == s) & obs_valid[f]).sum()))
        obs_pad_to = max(8, obs_pad_to)
    s_uv = np.zeros((n_shards, W, obs_pad_to, 2), obs_uv.dtype)
    s_lm = np.zeros((n_shards, W, obs_pad_to), np.int32)
    s_valid = np.zeros((n_shards, W, obs_pad_to), bool)
    for s in range(n_shards):
        for f in range(W):
            rows = np.nonzero((owner[f] == s) & obs_valid[f])[0][:obs_pad_to]
            n = len(rows)
            s_uv[s, f, :n] = obs_uv[f, rows]
            s_lm[s, f, :n] = local[f, rows]
            s_valid[s, f, :n] = True

    return ShardedBAProblem(
        poses=jnp.asarray(poses),
        points=jnp.asarray(pts_pad.reshape(n_shards, Ls, 3)),
        point_valid=jnp.asarray(pv_pad.reshape(n_shards, Ls)),
        obs_uv=jnp.asarray(s_uv),
        obs_lm=jnp.asarray(s_lm),
        obs_valid=jnp.asarray(s_valid),
        fixed=jnp.asarray(np.asarray(problem.fixed)),
        lm_perm=np.arange(L_pad),
    )


def _local_step(poses, points, point_valid, obs_uv, obs_lm, obs_valid, fixed,
                K, width, height, cfg: BAConfig, axis: str):
    """Per-shard BA iteration body (runs under shard_map)."""
    local = BAProblem(
        poses=poses, points=points, obs_uv=obs_uv, obs_lm=obs_lm,
        obs_valid=obs_valid, point_valid=point_valid, fixed=fixed,
    )
    Hpp, bp, Hll, bl, Wfl, stats = linearize_ba(local, K, width, height, cfg)
    S_c, b_c, _ = schur_parts(Hpp, bp, Hll, bl, Wfl, cfg.damping)

    # THE collective: combine partial reduced systems across landmark shards
    S = jax.lax.psum(S_c, axis)
    b_red = jax.lax.psum(b_c, axis)

    S, b_red = finalize_reduced(S, b_red, fixed, cfg.damping)
    c, low = jax.scipy.linalg.cho_factor(S)
    dx_p = jax.scipy.linalg.cho_solve((c, low), -b_red).reshape(-1, 6)

    Hll_inv = invert_hll(Hll, cfg.damping)
    dx_l = backsubstitute(Hll_inv, bl, Wfl, dx_p)

    from tpuvo.ops import lie

    new_poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx_p, poses)
    new_poses = jnp.where(fixed[:, None, None], poses, new_poses)
    touched = Hll[:, 0, 0] + Hll[:, 1, 1] + Hll[:, 2, 2] > 0
    upd = point_valid & touched
    new_points = jnp.where(upd[:, None], points + dx_l, points)

    stats = BAStats(
        chi=jax.lax.psum(stats.chi, axis),
        num_inliers=jax.lax.psum(stats.num_inliers, axis),
        num_obs=jax.lax.psum(stats.num_obs, axis),
    )
    return new_poses, new_points, stats


def sharded_ba_step(mesh, sp: ShardedBAProblem, K, width, height, cfg: BAConfig,
                    axis: str = "lm"):
    """One distributed BA iteration over the mesh."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )
    def step(poses, points, point_valid, obs_uv, obs_lm, obs_valid, fixed):
        new_poses, new_points, stats = _local_step(
            poses, points[0], point_valid[0], obs_uv[0], obs_lm[0],
            obs_valid[0], fixed, K, width, height, cfg, axis,
        )
        return new_poses, new_points[None], stats

    poses, points, stats = step(
        sp.poses, sp.points, sp.point_valid, sp.obs_uv, sp.obs_lm,
        sp.obs_valid, sp.fixed,
    )
    return sp._replace(poses=poses, points=points), stats


def sharded_ba_solve(mesh, sp: ShardedBAProblem, K, width, height, cfg: BAConfig,
                     axis: str = "lm"):
    """cfg.iterations distributed BA steps under one jit."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )
    def solve(poses, points, point_valid, obs_uv, obs_lm, obs_valid, fixed):
        def body(_, carry):
            ps, pt, _ = carry
            ps2, pt2, stats = _local_step(
                ps, pt, point_valid[0], obs_uv[0], obs_lm[0], obs_valid[0],
                fixed, K, width, height, cfg, axis,
            )
            return ps2, pt2, stats

        dummy = BAStats(jnp.float32(0), jnp.int32(0), jnp.int32(0))
        ps, pt, stats = jax.lax.fori_loop(
            0, cfg.iterations, body, (poses, points[0], dummy)
        )
        return ps, pt[None], stats

    poses, points, stats = solve(
        sp.poses, sp.points, sp.point_valid, sp.obs_uv, sp.obs_lm,
        sp.obs_valid, sp.fixed,
    )
    return sp._replace(poses=poses, points=points), stats


def gather_points(sp: ShardedBAProblem, L: int):
    """Collect the sharded landmark estimates back to a (L, 3) array."""
    pts = np.asarray(sp.points).reshape(-1, 3)
    return pts[:L]
