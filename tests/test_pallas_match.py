"""Pallas matcher kernel vs the XLA oracle (interpret mode on CPU; the same
kernel compiles natively on TPU — exercised by bench/TPU runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuvo.ops.match import match_descriptors
from tpuvo.ops.pallas.match_kernel import match_descriptors_pallas


def run_both(d1, v1, d2, v2, tile_m=512):
    ref = match_descriptors(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2)
    )
    got = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2),
        tile_m=tile_m, interpret=True,
    )
    return ref, got


def test_kernel_matches_oracle_random():
    rng = np.random.default_rng(0)
    d1 = rng.uniform(-1, 1, (64, 10)).astype(np.float32)
    d2 = rng.uniform(-1, 1, (1024, 10)).astype(np.float32)
    d2[5] = d1[3] + 0.01
    d2[700] = d1[20] + 0.02   # cross-tile best
    v1 = np.ones(64, bool)
    v2 = np.ones(1024, bool)
    v2[100:130] = False
    ref, got = run_both(d1, v1, d2, v2)
    assert np.array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    m = np.asarray(ref.valid)
    assert np.array_equal(np.asarray(ref.idx)[m], np.asarray(got.idx)[m])
    np.testing.assert_allclose(
        np.asarray(ref.best), np.asarray(got.best), atol=1e-4
    )


def test_kernel_cross_tile_top2():
    d1 = np.zeros((8, 10), np.float32)
    d2 = np.ones((1024, 10), np.float32)
    d2[3] = 0.05      # tile 0 best
    d2[900] = 0.06    # tile 1 second
    ref, got = run_both(d1, np.ones(8, bool), d2, np.ones(1024, bool))
    assert int(got.idx[0]) == 3
    np.testing.assert_allclose(float(got.second[0]), float(ref.second[0]), atol=1e-5)


def test_kernel_real_data(sequence):
    s = sequence
    # frame 0 vs a 512-entry map-like set built from frame 1 + noise rows
    rng = np.random.default_rng(1)
    d2 = rng.uniform(-1, 1, (512, 10)).astype(np.float32)
    d2[: s.n_obs[1]] = s.desc[1][: s.n_obs[1]]
    v2 = np.ones(512, bool)
    ref, got = run_both(s.desc[0], s.valid[0], d2, v2)
    assert np.array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    m = np.asarray(ref.valid)
    assert np.array_equal(np.asarray(ref.idx)[m], np.asarray(got.idx)[m])


def test_in_tracker_parity(sequence):
    """Production-path parity: MatcherConfig(method='pallas') through the
    real scanned tracker vs the mxu matcher (mirrors test_pallas_picp's
    in-tracker pattern — kernel-level parity alone masked a wrong-Jacobian
    bug for two rounds).  CPU runs the kernel in interpret mode via the
    match_descriptors routing."""
    import jax.numpy as jnp

    from tpuvo.config import EngineConfig, MatcherConfig
    from tpuvo.data import load_sequence
    from tpuvo.engine import vo

    F = 40
    seq = sequence
    poses = {}
    logs = {}
    for method in ("mxu", "pallas"):
        cfg = EngineConfig(mode="fixed", n_frames=F,
                           matcher=MatcherConfig(method=method))
        sub = type(seq)(**{
            k: (v[:F] if getattr(v, "ndim", 0) >= 1 and len(v) >= F else v)
            for k, v in seq._asdict().items()})
        _, lg, p, _ = vo.run_sequence(sub, cfg)
        poses[method] = np.asarray(p)
        logs[method] = lg
    # identical match decisions frame-by-frame...
    assert np.array_equal(np.asarray(logs["mxu"].n_map_matches),
                          np.asarray(logs["pallas"].n_map_matches))
    assert np.array_equal(np.asarray(logs["mxu"].n_map_correct),
                          np.asarray(logs["pallas"].n_map_correct))
    # ...and trajectories equal to fp tolerance (same solves, same order)
    np.testing.assert_allclose(poses["pallas"], poses["mxu"], atol=1e-4)


def test_kernel_unaligned_sizes():
    rng = np.random.default_rng(2)
    d1 = rng.uniform(-1, 1, (50, 10)).astype(np.float32)   # N not 128-aligned
    d2 = rng.uniform(-1, 1, (700, 10)).astype(np.float32)  # M not tile-aligned
    d2[650] = d1[10]
    ref, got = run_both(d1, np.ones(50, bool), d2, np.ones(700, bool))
    assert np.array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    m = np.asarray(ref.valid)
    assert np.array_equal(np.asarray(ref.idx)[m], np.asarray(got.idx)[m])
