"""Checkpoint, metrics, validation and degradation-path tests."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpuvo.config import EngineConfig, PICPConfig
from tpuvo.data import synthetic
from tpuvo.engine.state import empty_state
from tpuvo.engine.vo import bootstrap, frame_of, run_sequence, track_step
from tpuvo.utils.checkpoint import load_state, save_state
from tpuvo.utils.checks import (
    StateValidationError,
    finite_or_previous,
    validate_frame_log,
    validate_state,
)
from tpuvo.utils.metrics import MetricsLogger, log_frame_logs


def small_run():
    cfg = EngineConfig()
    world = synthetic.make_world(9, n_landmarks=500, xy_extent=7.0)
    gt = synthetic.make_planar_trajectory(10, seed=9)
    seq = synthetic.render_sequence(world, gt, cfg, seed=9)
    return run_sequence(seq, cfg), cfg, seq


def test_checkpoint_roundtrip(tmp_path):
    (state, logs, poses, diag), cfg, seq = small_run()
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state, frame_idx=9, extra={"seed": 42})
    state2, fidx, extra = load_state(path)
    assert fidx == 9
    assert int(extra["seed"]) == 42
    for a, b in zip(state, state2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from tpuvo.utils.checkpoint import OrbaxCheckpointer

    (state, logs, poses, diag), cfg, seq = small_run()
    ckpt = OrbaxCheckpointer(str(tmp_path / "orbax"), keep=2)
    ckpt.save(9, state, extra={"seed": 42})
    ckpt.save(19, state._replace(frame_idx=state.frame_idx + 10)
              if hasattr(state, "frame_idx") else state)
    assert ckpt.latest_step() == 19
    state2, extra = ckpt.restore(step=9)
    assert int(extra["seed"]) == 42
    for a, b in zip(state, state2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_validate_state_ok_and_violations():
    (state, logs, poses, diag), cfg, seq = small_run()
    validate_state(state)  # must not raise
    bad = state._replace(pose=state.pose.at[0, 0].set(jnp.nan))
    with pytest.raises(StateValidationError):
        validate_state(bad)
    report = validate_frame_log(logs)
    assert report["frames"] == 9
    assert report["non_finite_chi"] == 0


def test_finite_or_previous():
    new = jnp.array([1.0, jnp.nan])
    old = jnp.array([0.0, 0.0])
    out, ok = finite_or_previous(new, old)
    assert not bool(ok)
    assert np.allclose(np.asarray(out), [0, 0])


def test_metrics_jsonl(tmp_path):
    (state, logs, poses, diag), cfg, seq = small_run()
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path)
    log_frame_logs(logger, logs)
    logger.log({"event": "summary", "ok": True})
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 10
    assert lines[0]["event"] == "frame"
    assert lines[-1]["event"] == "summary"


def test_match_starvation_reuses_pose():
    """With min_matches_reuse_pose set, an empty map keeps the pose fixed."""
    cfg = EngineConfig(picp=PICPConfig(min_matches_reuse_pose=10))
    world = synthetic.make_world(3, n_landmarks=300)
    gt = synthetic.make_planar_trajectory(3, seed=3)
    seq = synthetic.render_sequence(world, gt, cfg, seed=3)
    state = empty_state(cfg)  # empty map -> zero matches
    f1, f2 = frame_of(seq, 1), frame_of(seq, 2)
    state2, log = track_step(state, f1, f2, cfg)
    np.testing.assert_array_equal(np.asarray(state2.pose), np.asarray(state.pose))


@pytest.mark.slow
def test_chunked_resume_matches_uninterrupted(tmp_path):
    """Crash-and-resume mid-sequence reproduces the uninterrupted
    trajectory: run 1 chunk, 'crash' (max_chunks), then resume from the
    checkpoint and compare against a straight run_sequence."""
    import jax.numpy as jnp

    from tpuvo.data import synthetic
    from tpuvo.engine.vo import run_sequence, run_sequence_chunked

    cfg = EngineConfig(mode="fixed")
    world = synthetic.make_world(13, n_landmarks=800, xy_extent=8.0)
    gt = synthetic.make_planar_trajectory(25, seed=13)
    seq = synthetic.render_sequence(world, gt, cfg, pixel_noise=0.2, seed=13)

    state_ref, logs_ref, poses_ref, _ = run_sequence(seq, cfg)

    ckpt = str(tmp_path / "vo_ckpt.npz")
    # phase 1: one 10-step chunk, then simulated crash
    _, poses_partial, step = run_sequence_chunked(
        seq, cfg, checkpoint_path=ckpt, checkpoint_every=10, max_chunks=1)
    assert step == 10
    # phase 2: resume from the checkpoint and finish
    state2, poses2, step2 = run_sequence_chunked(
        seq, cfg, checkpoint_path=ckpt, checkpoint_every=10)
    assert step2 == 24
    np.testing.assert_allclose(
        np.asarray(poses2), np.asarray(poses_ref), atol=1e-4)
    assert int(state2.map_count) == int(state_ref.map_count)
