"""Fused Pallas PICP kernel vs the XLA solver (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvo.config import EngineConfig, PICPConfig
from tpuvo.ops import picp
from tpuvo.ops.pallas.picp_kernel import solve_pallas

CFG = EngineConfig()
K = CFG.K()


def make_problem(noise=0.5, pose_err=0.05, seed=0, n=128):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_picp import make_problem as mp

    pts, obs, T_gt, T0 = mp(n_pts=n, noise=noise, pose_err=pose_err, seed=seed)
    # pad to the kernel's N
    N = 128
    X = np.zeros((N, 3), np.float32); X[: len(pts)] = pts
    Z = np.zeros((N, 2), np.float32); Z[: len(obs)] = obs
    V = np.zeros(N, bool); V[: len(pts)] = True
    return X, Z, V, T_gt, T0


@pytest.mark.parametrize("kernel_thr", [3000.0, 1000.0])
def test_kernel_matches_xla_solver(kernel_thr):
    X, Z, V, T_gt, T0 = make_problem()
    cfg = PICPConfig(kernel_threshold=kernel_thr)
    ref = picp.solve(
        jnp.asarray(K), jnp.asarray(T0), jnp.asarray(X), jnp.asarray(Z),
        None, jnp.asarray(V), CFG.width, CFG.height, cfg,
    )
    got = solve_pallas(
        K, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(Z),
        None, jnp.asarray(V), CFG.width, CFG.height, cfg, interpret=True,
    )
    assert int(got.num_inliers) == int(ref.num_inliers)
    # iteration counts may differ: the rel-chi stopping rule is knife-edge
    # sensitive to reduction order at the plateau; the solution is what
    # must agree
    assert bool(got.converged) == bool(ref.converged)
    np.testing.assert_allclose(np.asarray(got.T), np.asarray(ref.T), atol=5e-3)
    assert np.isclose(float(got.chi_inliers), float(ref.chi_inliers), rtol=5e-2)


def test_kernel_with_outliers():
    X, Z, V, T_gt, T0 = make_problem(noise=0.0, pose_err=0.05, seed=1)
    rng = np.random.default_rng(1)
    bad = rng.choice(np.nonzero(V)[0], 20, replace=False)
    Z2 = Z.copy()
    Z2[bad] += rng.uniform(100, 250, (20, 2))
    cfg = PICPConfig(kernel_threshold=1000.0)
    ref = picp.solve(
        jnp.asarray(K), jnp.asarray(T0), jnp.asarray(X), jnp.asarray(Z2),
        None, jnp.asarray(V), CFG.width, CFG.height, cfg,
    )
    got = solve_pallas(
        K, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(Z2),
        None, jnp.asarray(V), CFG.width, CFG.height, cfg, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got.T), np.asarray(ref.T), atol=5e-4)
    assert int(got.num_inliers) == int(ref.num_inliers)


def test_kernel_no_valid_points_is_finite():
    X, Z, V, T_gt, T0 = make_problem()
    cfg = PICPConfig()
    got = solve_pallas(
        K, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(Z),
        None, jnp.zeros_like(jnp.asarray(V)), CFG.width, CFG.height, cfg,
        interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(got.T)))


def test_kernel_vmap_batches():
    X, Z, V, T_gt, T0 = make_problem()
    cfg = PICPConfig()
    B = 4
    bX = jnp.asarray(np.tile(X[None], (B, 1, 1)))
    bZ = jnp.asarray(np.tile(Z[None], (B, 1, 1)))
    bV = jnp.asarray(np.tile(V[None], (B, 1)))
    bT = jnp.asarray(np.tile(T0[None], (B, 1, 1)))
    got = jax.vmap(
        lambda t, x, z, v: solve_pallas(
            K, t, x, z, None, v, CFG.width, CFG.height, cfg, interpret=True
        )
    )(bT, bX, bZ, bV)
    assert got.T.shape == (B, 4, 4)
    single = solve_pallas(
        K, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(Z), None,
        jnp.asarray(V), CFG.width, CFG.height, cfg, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got.T[0]), np.asarray(single.T), atol=1e-5)


def test_kernel_iteration_parity_early_stopping():
    """The round-3 kernel dropped the (cx, cy) terms of Jp·K — a wrong
    descent direction that still passed the run-to-convergence tests
    above (at a residual-zero fixed point the J error cancels in
    J^T e = 0) while taking ~3x the iterations under the production
    rel-chi 1e-4 early stop and drifting the full tracker to ATE 1.78.
    This is the regression gate: with realistic noise and the production
    stopping rule, the kernel must converge in the SAME number of GN
    iterations as the XLA solver (+/-1 for reduction-order chi ties) and
    land on the same pose."""
    for seed in range(3):
        X, Z, V, T_gt, T0 = make_problem(noise=0.5, pose_err=0.05, seed=seed)
        cfg = PICPConfig(convergence_threshold=1e-4)
        ref = picp.solve(
            jnp.asarray(K), jnp.asarray(T0), jnp.asarray(X), jnp.asarray(Z),
            None, jnp.asarray(V), CFG.width, CFG.height, cfg,
        )
        got = solve_pallas(
            K, jnp.asarray(T0), jnp.asarray(X), jnp.asarray(Z),
            None, jnp.asarray(V), CFG.width, CFG.height, cfg, interpret=True,
        )
        assert int(ref.iterations) < cfg.max_iterations  # early stop engaged
        assert abs(int(got.iterations) - int(ref.iterations)) <= 1, (
            seed, int(got.iterations), int(ref.iterations))
        np.testing.assert_allclose(
            np.asarray(got.T), np.asarray(ref.T), atol=1e-3)
