"""SLAM-mode tracking (engine/slam.py): interleaved local BA.

The regression this layer exists for: plain frame-to-frame tracking
collapses monocular scale on KITTI-scale motion (~1 m/frame) — the
per-frame scale handoff is an un-damped multiplicative feedback.  Local
window BA replaces it with a multi-view handoff.  No reference
counterpart (the reference never revisits a pose).
"""

import numpy as np
import pytest

from tpuvo.config import BAConfig, EngineConfig, PICPConfig
from tpuvo.data import synthetic
from tpuvo.engine.eval import evaluate, metrics_dict
from tpuvo.engine.slam import run_sequence_slam
from tpuvo.engine.vo import run_sequence


def _kitti_fixture(n_frames=60, seed=7):
    cfg = EngineConfig(mode="fixed", n_frames=n_frames, map_capacity=8192,
                       fuse_frame_matchers=True,
                       picp=PICPConfig(convergence_threshold=1e-4),
                       ba=BAConfig(window=10, iterations=8,
                                   max_landmarks=8192))
    gt = synthetic.make_loop_trajectory(200, step=1.0, seed=seed)[:n_frames]
    extent = float(np.abs(gt[:, :2]).max()) + 15.0
    world = synthetic.make_world(seed, n_landmarks=10000, xy_extent=extent,
                                 z_range=(0.0, 8.0))
    seq = synthetic.render_sequence(world, gt, cfg, pixel_noise=0.3,
                                    seed=seed)
    gt_cam = np.stack(
        [np.asarray(synthetic.camera_pose_from_gt(g, cfg)) for g in gt])
    return cfg, gt, seq, gt_cam


def _path_len(poses):
    t = np.asarray(poses)[:, :3, 3]
    return float(np.linalg.norm(np.diff(t, axis=0), axis=1).sum())


@pytest.mark.slow
def test_slam_holds_scale_where_plain_tracking_collapses():
    cfg, gt, seq, gt_cam = _kitti_fixture()
    gt_path = _path_len(gt_cam)

    _, _, poses_plain, _ = run_sequence(seq, cfg)
    _, _, poses_slam, diag = run_sequence_slam(seq, cfg)

    plain_frac = _path_len(poses_plain) / gt_path
    slam_frac = _path_len(poses_slam) / gt_path
    assert int(diag["n_local_ba_runs"]) > 10
    # plain tracking collapses (measured ~0.5); SLAM must hold >= 80%
    # of the true path length and clearly beat plain tracking
    assert slam_frac > 0.8
    assert slam_frac > plain_frac + 0.1

    m_plain = metrics_dict(evaluate(np.asarray(poses_plain), gt, cfg))
    m_slam = metrics_dict(evaluate(np.asarray(poses_slam), gt, cfg))
    assert m_slam["ate_rmse"] < 0.5 * m_plain["ate_rmse"]


@pytest.mark.slow
def test_slam_nondegrading_on_easy_sequence():
    """Slow, well-conditioned motion: SLAM mode must not hurt."""
    cfg = EngineConfig(mode="fixed", n_frames=40, map_capacity=4096,
                       fuse_frame_matchers=True,
                       ba=BAConfig(window=10, iterations=8,
                                   max_landmarks=4096))
    gt = synthetic.make_planar_trajectory(40, step=0.2, turn=0.02, seed=5)
    world = synthetic.make_world(5, n_landmarks=2000, xy_extent=12.0)
    seq = synthetic.render_sequence(world, gt, cfg, pixel_noise=0.2, seed=5)
    _, _, poses_plain, _ = run_sequence(seq, cfg)
    _, _, poses_slam, _ = run_sequence_slam(seq, cfg)
    m_plain = metrics_dict(evaluate(np.asarray(poses_plain), gt, cfg))
    m_slam = metrics_dict(evaluate(np.asarray(poses_slam), gt, cfg))
    assert np.isfinite(m_slam["ate_rmse"])
    assert m_slam["ate_rmse"] <= m_plain["ate_rmse"] * 1.25 + 0.02


@pytest.mark.slow
def test_slam_real_sequence_nondegrading(sequence):
    """Bundled 121-frame dataset: SLAM mode stays within the reference
    accuracy envelope (BASELINE.md: mean 0.210)."""
    cfg = EngineConfig(mode="fixed")
    _, _, poses, _ = run_sequence_slam(sequence, cfg)
    m = metrics_dict(evaluate(np.asarray(poses), sequence.gt_pose, cfg))
    assert np.isfinite(m["ate_rmse"])
    assert m["trans_err_mean"] < 0.25


@pytest.mark.slow
def test_slam_strided_window_tracks():
    """Keyframe-strided local window (local_ba_stride=2): same fixture as
    the scale-holding test; the strided variant must also hold scale and
    stay in the same accuracy regime as the contiguous window."""
    cfg, gt, seq, gt_cam = _kitti_fixture(n_frames=60)
    cfg2 = cfg.replace(local_ba_stride=2)
    _, _, poses_s1, _ = run_sequence_slam(seq, cfg)
    _, _, poses_s2, d2 = run_sequence_slam(seq, cfg2)
    assert int(d2["n_local_ba_runs"]) > 5
    m1 = metrics_dict(evaluate(np.asarray(poses_s1), gt, cfg))
    m2 = metrics_dict(evaluate(np.asarray(poses_s2), gt, cfg2))
    assert np.isfinite(m2["ate_rmse"])
    # strided window sees a 2x horizon — its payoff is on LONG sequences
    # (500-frame fixture: ate_slam 15.2 -> 11.9); on this short fixture
    # keyframe-only correction leaves kink noise (measured ~1.4 vs 0.14
    # contiguous), so the bound only guards against divergence
    assert m2["ate_rmse"] < max(15.0 * m1["ate_rmse"], 2.5)


def test_slam_stride_evict_guard():
    from tpuvo.engine.slam import run_sequence_slam as slam

    cfg = EngineConfig(mode="fixed", local_ba_window=8, local_ba_stride=4,
                       local_ba_every=2, map_evict_age=20)
    world = synthetic.make_world(1, n_landmarks=200, xy_extent=8.0)
    gt = synthetic.make_planar_trajectory(6, seed=1)
    seq = synthetic.render_sequence(world, gt, cfg, seed=1)
    with pytest.raises(ValueError, match="ring"):
        slam(seq, cfg)


@pytest.mark.slow
def test_online_slam_matches_batch():
    """The streaming OnlineSLAM session must reproduce run_sequence_slam
    pose-for-pose (same jitted step function, scan vs per-frame dispatch)."""
    from tpuvo.engine.slam import OnlineSLAM
    from tpuvo.engine import vo as _vo

    cfg, gt, seq, gt_cam = _kitti_fixture(n_frames=44)
    F = seq.uv.shape[0]
    _, _, poses_ref, diag = run_sequence_slam(seq, cfg)

    s = OnlineSLAM(cfg, max_frames=F)
    s.start(_vo.frame_of(seq, 0), _vo.frame_of(seq, 1))
    for i in range(1, F):
        s.step(_vo.frame_of(seq, i))
    # scan vs per-frame dispatch compile to different XLA programs —
    # identical math, fp-level divergence only (measured max 4e-4)
    np.testing.assert_allclose(
        np.asarray(s.poses), np.asarray(poses_ref), atol=5e-3)
    assert s.n_local_ba_runs == int(diag["n_local_ba_runs"])


@pytest.mark.slow
def test_online_slam_strided():
    """Streaming session with the keyframe-strided window (the
    long-sequence profile): must match the batch strided run."""
    from tpuvo.engine.slam import OnlineSLAM
    from tpuvo.engine import vo as _vo

    cfg, gt, seq, gt_cam = _kitti_fixture(n_frames=40)
    cfg = cfg.replace(local_ba_window=8, local_ba_stride=2)
    F = seq.uv.shape[0]
    _, _, poses_ref, diag = run_sequence_slam(seq, cfg)

    s = OnlineSLAM(cfg, max_frames=F)
    s.start(_vo.frame_of(seq, 0), _vo.frame_of(seq, 1))
    for i in range(1, F):
        s.step(_vo.frame_of(seq, i))
    # scan vs per-frame programs differ at fp level; the strided BA's
    # drift-correction feedback amplifies that more than S=1 (measured
    # max 0.025 on this chaotic fixture) — identical structure, not a
    # logic divergence (BA run counts match exactly)
    np.testing.assert_allclose(
        np.asarray(s.poses), np.asarray(poses_ref), atol=0.05)
    assert s.n_local_ba_runs == int(diag["n_local_ba_runs"])
