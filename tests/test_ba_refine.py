"""Windowed BA refinement over tracked trajectories (full-BA configs)."""

import numpy as np
import pytest

from tpuvo.config import BAConfig, EngineConfig
from tpuvo.data import synthetic
from tpuvo.engine.ba_refine import refine_trajectory
from tpuvo.engine.eval import evaluate, metrics_dict
from tpuvo.engine.vo import run_sequence


def test_refine_improves_noisy_synthetic():
    cfg = EngineConfig(mode="fixed")
    world = synthetic.make_world(21, n_landmarks=900, xy_extent=9.0)
    gt = synthetic.make_planar_trajectory(30, step=0.25, turn=0.03, seed=21)
    seq = synthetic.render_sequence(world, gt, cfg, pixel_noise=0.4, seed=21)
    state, logs, poses, diag = run_sequence(seq, cfg)
    m0 = metrics_dict(evaluate(poses, gt, cfg))

    ba_cfg = BAConfig(window=10, iterations=8)
    poses2, points2, stats = refine_trajectory(state, seq, poses, cfg, ba_cfg)
    m1 = metrics_dict(evaluate(poses2, gt, cfg))
    assert np.isfinite(m1["ate_rmse"])
    # refinement must not degrade, and typically improves, the trajectory
    assert m1["ate_rmse"] <= m0["ate_rmse"] * 1.1
    assert len(stats) >= 4
    assert all(np.isfinite(s["chi"]) for s in stats)


def test_refine_real_sequence_prefix(sequence):
    cfg = EngineConfig(mode="fixed")
    sub = type(sequence)(*[np.asarray(a)[:40] for a in sequence])
    state, logs, poses, diag = run_sequence(sub, cfg)
    m0 = metrics_dict(evaluate(poses, sub.gt_pose, cfg))
    poses2, points2, stats = refine_trajectory(
        state, sub, poses, cfg, BAConfig(window=10, iterations=6)
    )
    m1 = metrics_dict(evaluate(poses2, sub.gt_pose, cfg))
    assert np.isfinite(m1["ate_rmse"])
    assert m1["ate_rmse"] <= m0["ate_rmse"] * 1.2


def test_kitti_like_long_sequence():
    """BASELINE config 4 stand-in: long forward-motion sequence, deeper
    scene, tracking + windowed BA."""
    cfg = EngineConfig(mode="fixed")
    rng_world = synthetic.make_world(
        31, n_landmarks=3000, xy_extent=120.0, z_range=(0.0, 8.0)
    )
    gt = synthetic.make_kitti_like_trajectory(60, step=1.0, seed=31)
    seq = synthetic.render_sequence(rng_world, gt, cfg, pixel_noise=0.3, seed=31)
    # enough observations along the way
    assert seq.n_obs.min() >= 8
    cfg = cfg.replace(map_capacity=2048)
    state, logs, poses, diag = run_sequence(seq, cfg)
    m = metrics_dict(evaluate(poses, gt, cfg))
    assert np.isfinite(m["ate_rmse"])
    assert m["ate_rmse"] < 12.0  # 60 m travel, monocular scale drift allowed
    # windowed BA is LOCAL smoothing: anchored to the drifted prefix it
    # cannot repair global monocular drift (that needs pose-graph/loop
    # closure), but it must stay finite and not blow the trajectory up
    poses2, points2, stats = refine_trajectory(
        state, seq, poses, cfg,
        BAConfig(window=10, iterations=5, huber_threshold=500.0),
    )
    m2 = metrics_dict(evaluate(poses2, gt, cfg))
    assert np.isfinite(m2["ate_rmse"])
    assert m2["ate_rmse"] < 3.0 * m["ate_rmse"]
    assert sum(s["skipped"] for s in stats) <= len(stats) // 2
