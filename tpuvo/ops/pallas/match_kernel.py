"""Fused Pallas top-2 descriptor-distance kernel.

The matcher is the pipeline's hot op (3 brute-force matches per frame,
SURVEY.md §3.1).  The XLA path (ops/match.py) materializes the (N, M)
distance matrix and reduces it twice (argmin + masked min).  This kernel
tiles the map axis through VMEM: each grid step computes one (N, TILE_M)
distance block on the MXU (|a|^2 + |b|^2 - 2 a·b^T with the descriptor
axis zero-padded to the 128-lane width) and extracts the block's per-row
(best, argmin, second) in one pass — the full matrix never exists, so map
capacity scales to 100k+ landmarks at HBM-bandwidth speed.

Cross-tile merge is a cheap XLA reduction over n_tiles candidates
(best/second per tile), preserving the reference's first-index tie rule
because tiles partition the map in order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvo.ops.match import MatchResult

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _tile_kernel(d1_ref, n1_ref, d2_ref, mask_ref, best_ref, idx_ref, sec_ref):
    """One map tile: d1 (N, Dp), d2 tile (TILE_M, Dp), mask (1, TILE_M).

    Outputs per tile: best (1, N), idx (1, N), second (1, N).
    """
    d1 = d1_ref[:]            # (N, Dp)
    d2 = d2_ref[:]            # (TILE_M, Dp)
    n1 = n1_ref[:]            # (N, 1) squared norms of d1
    mask = mask_ref[:]        # (1, TILE_M) 1.0 valid / 0.0 invalid

    cross = jax.lax.dot_general(
        d1, d2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, TILE_M)
    n2 = jnp.sum(d2 * d2, axis=1)[None, :]  # (1, TILE_M)
    dist = n1 + n2 - 2.0 * cross
    # numeric floor: the expansion can dip slightly negative for near-equal
    # descriptors; clamping matches the direct computation's nonnegativity
    dist = jnp.maximum(dist, 0.0)
    big = jnp.float32(3.0e38)
    dist = jnp.where(mask > 0.5, dist, big)

    tile_m = dist.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)

    best = jnp.min(dist, axis=1)                       # (N,)
    # first index attaining the min (reference tie rule)
    is_best = dist == best[:, None]
    idx = jnp.min(jnp.where(is_best, col, tile_m), axis=1)
    # second-best: mask exactly the winning column, min again
    dist2 = jnp.where(col == idx[:, None], big, dist)
    second = jnp.min(dist2, axis=1)

    i = pl.program_id(0)
    best_ref[0, :] = best
    idx_ref[0, :] = idx + i * tile_m
    sec_ref[0, :] = second


def match_topk_pallas(desc1, valid1, desc2, valid2, tile_m: int = 512,
                      interpret: bool = False):
    """(best, idx, second) per desc1 row over the desc2 set, fused on TPU.

    desc1: (N, D), desc2: (M, D); N must be lane-aligned-able (padded to
    128), M is padded to a multiple of tile_m.
    """
    N, D = desc1.shape
    M = desc2.shape[0]
    Np = _round_up(max(N, 8), LANE)
    Dp = _round_up(max(D, 1), LANE)
    Mp = _round_up(M, tile_m)

    d1 = jnp.zeros((Np, Dp), jnp.float32).at[:N, :D].set(desc1)
    d2 = jnp.zeros((Mp, Dp), jnp.float32).at[:M, :D].set(desc2)
    mask = jnp.zeros((1, Mp), jnp.float32).at[0, :M].set(valid2.astype(jnp.float32))
    n1 = jnp.sum(d1 * d1, axis=1, keepdims=True)  # (Np, 1)

    n_tiles = Mp // tile_m
    grid = (n_tiles,)
    out_shape = (
        jax.ShapeDtypeStruct((n_tiles, Np), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, Np), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, Np), jnp.float32),
    )
    bests, idxs, seconds = pl.pallas_call(
        _tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(d1, n1, d2, mask)

    # cross-tile merge (n_tiles is small): winner = first tile with the min
    win = jnp.argmin(bests, axis=0)                      # (Np,)
    rows = jnp.arange(Np)
    best = bests[win, rows]
    idx = idxs[win, rows]
    others = jnp.where(
        jnp.arange(n_tiles)[:, None] == win[None, :], jnp.inf, bests
    )
    second = jnp.minimum(seconds[win, rows], jnp.min(others, axis=0))
    return best[:N], idx[:N], second[:N]


def match_descriptors_pallas(
    desc1, valid1, desc2, valid2,
    distance_threshold: float = 0.2,
    ratio_threshold: float = 0.8,
    tile_m: int = 512,
    interpret: bool = False,
) -> MatchResult:
    """Drop-in MatchResult-producing variant of ops.match.match_descriptors."""
    best, idx, second = match_topk_pallas(
        desc1, valid1, desc2, valid2, tile_m, interpret
    )
    accept = (best < distance_threshold) & (best / second < ratio_threshold) & valid1
    return MatchResult(idx=idx.astype(jnp.int32), valid=accept, best=best, second=second)
