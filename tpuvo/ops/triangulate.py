"""Batched DLT triangulation (replaces cv::triangulatePoints, cam.cpp:94-140).

The reference builds P = K·[T^-1]_(3x4) for both camera-in-world poses
(cam.cpp:108-112) and runs OpenCV's homogeneous DLT, then dehomogenizes
(cam.cpp:115-118) with **no cheirality or reprojection filtering** of the
outputs — a deliberate quirk we preserve in parity mode (a validity mask is
still returned for the ``fixed`` path and for downstream consumers that
want it).

TPU-first: each correspondence contributes a 4x4 normal matrix A^T A whose
smallest eigenvector is the homogeneous point — one vmapped ``eigh`` over
the whole batch, no per-pair host work.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuvo.ops import lie


def projection_matrix(K, camera_in_world_T):
    """P = K · [T^-1]_(3x4)  (cam.cpp:108-112)."""
    T_inv = lie.inv_se3(camera_in_world_T)
    return K @ T_inv[:3, :4]


def triangulate_dlt(P1, P2, uv1, uv2):
    """Homogeneous DLT for batches of correspondences.

    P1, P2: (3, 4) projection matrices; uv1, uv2: (N, 2) image points.
    Returns (points (N, 3), w (N,) homogeneous scale, depth-free).

    Per pair the classic system rows are u·P[2]-P[0] and v·P[2]-P[1] for
    both views; X is the smallest right singular vector of the 4x4 A.  We
    take the smallest eigenvector of A^T A instead (same vector, symmetric
    4x4 eigh vmaps cheaply on TPU).
    """
    def rows(P, uv):
        a = uv[:, 0:1] * P[2][None, :] - P[0][None, :]  # (N, 4)
        b = uv[:, 1:2] * P[2][None, :] - P[1][None, :]
        return a, b

    a1, b1 = rows(P1, uv1)
    a2, b2 = rows(P2, uv2)
    A = jnp.stack([a1, b1, a2, b2], axis=1)  # (N, 4, 4)
    AtA = jnp.einsum("nij,nik->njk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = vecs[..., 0]  # (N, 4) smallest eigenvector
    w = X[:, 3]
    # convertPointsFromHomogeneous divides unconditionally; we guard the
    # degenerate w ~ 0 case to keep NaNs out of downstream masked math.
    safe_w = jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    pts = X[:, :3] / safe_w[:, None]
    return pts, w


def triangulate_two_view(K, T1, T2, uv1, uv2):
    """Triangulate correspondences seen from camera-in-world poses T1, T2.

    Mirrors Cam::triangulatePoints (cam.cpp:94-140): builds the two
    projection matrices and runs the DLT.  Returns (points (N,3) in world
    frame, finite_mask (N,)).
    """
    P1 = projection_matrix(K, T1)
    P2 = projection_matrix(K, T2)
    pts, w = triangulate_dlt(P1, P2, uv1, uv2)
    finite = jnp.abs(w) > 1e-12
    return pts, finite


def triangulate_normalized(R, t, x1, x2):
    """DLT in normalized camera coordinates with P1=[I|0], P2=[R|t].

    Used for cheirality voting in pose recovery.  Returns (points in cam-1
    frame (N,3), depth1 (N,), depth2 (N,)).
    """
    P1 = jnp.concatenate([jnp.eye(3, dtype=x1.dtype), jnp.zeros((3, 1), x1.dtype)], 1)
    P2 = jnp.concatenate([R, t[:, None]], 1)
    pts, _ = triangulate_dlt(P1, P2, x1, x2)
    z1 = pts[:, 2]
    z2 = pts @ R[2].T + t[2]
    return pts, z1, z2
