"""Fused Pallas top-2 descriptor-distance kernel.

The matcher is the pipeline's hot op (3 brute-force matches per frame,
SURVEY.md §3.1).  The XLA path (ops/match.py) materializes the (N, M)
distance matrix in HBM and reduces it twice (argmin + masked min) — at
131k landmarks that is ~190 MB of HBM traffic per match.  This kernel
streams map tiles through VMEM: each grid step computes one (N, TILE_M)
distance block on the MXU (|a|^2 + |b|^2 - 2 a·b^T) and folds the
block's per-row (best, argmin, second) into a RUNNING top-2 accumulator
held in the output block — TPU grid steps execute sequentially over the
same output window, so the merge happens in-kernel, the full (N, M)
matrix never exists, and the only HBM traffic is the descriptors
themselves.

Layout (the round-5 fix that made the kernel actually win): descriptors
ship TRANSPOSED, (Dp, M) with the 10-dim descriptor axis padded to 16
sublanes and the map axis in the 128-wide lane dim.  The first version
padded D to 128 lanes — (M, 128) f32 = 64 MB at 131k landmarks, 8x the
useful bytes, which made the kernel HBM-bound on padding and SLOWER than
XLA.  Transposed, the map array is (16, M) = 8 MB and the contraction
runs with K=16.  Validity needs no separate mask buffer or VPU pass:
a spare padding sublane of d2t carries sqrt(1.7e38) for invalid columns,
which the distance expansion itself turns into +1.7e38.  Mosaic
block-alignment: every block's last two dims are (8k, 128k)-divisible —
d1t (16, Np), d2t tile (16, TILE_M), accumulator (8, Np) (row 0 best,
row 1 index — exact through f32 below 2^24 — row 2 second, rows 3-7
padding).

Tie semantics match the reference exactly: within a tile the first index
attaining the minimum wins, and a later tile replaces the running best
only on STRICT improvement — together, the first index over the whole
map.  Validated against the XLA oracle in tests/test_pallas_match.py
(interpret mode) and on-device across 1-64 tile grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvo.ops.match import MatchResult

LANE = 128
SUB = 8
BIG = 3.0e38


def _round_up(x, m):
    return (x + m - 1) // m * m


def _tile_kernel(d1t_ref, d2t_ref, acc_ref):
    """One map tile folded into the running top-2 accumulator.

    d1t (Dp, Np), d2t tile (Dp, TILE_M),
    acc (8, Np): row 0 best, row 1 idx (f32), row 2 second.

    Validity rides INSIDE d2t: the wrapper writes sqrt(INVALID_PENALTY)
    into a spare padding row of invalid columns, so n2 (and hence dist)
    carries +1.7e38 for them through the SAME arithmetic as the distance
    itself — no mask buffer, no extra VPU pass over the (Np, TILE_M)
    block (the kernel is VPU-bound on exactly those passes).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.full(acc_ref.shape, BIG, jnp.float32)
        acc_ref[1, :] = jnp.full((acc_ref.shape[1],), -1.0, jnp.float32)

    d1t = d1t_ref[:]          # (Dp, Np)
    d2t = d2t_ref[:]          # (Dp, TILE_M)

    # dist laid out (TILE_M, Np): the MAP axis sits in the SUBLANE dim, so
    # every top-2 reduction below runs across sublanes — the cheap VPU
    # direction (the first layout reduced across the 128-lane dim and was
    # ~7x off the VPU roofline)
    cross = jax.lax.dot_general(
        d2t, d1t,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_M, Np)
    n1 = jnp.sum(d1t * d1t, axis=0)[None, :]       # (1, Np)
    n2 = jnp.sum(d2t * d2t, axis=0)[:, None]       # (TILE_M, 1)
    dist = n1 + n2 - 2.0 * cross
    # numeric floor: the expansion can dip slightly negative for near-equal
    # descriptors; clamping matches the direct computation's nonnegativity.
    # Invalid columns arrive as ~1.7e38 through the penalty row of n2.
    dist = jnp.maximum(dist, 0.0)

    tile_m = dist.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)

    best = jnp.min(dist, axis=0)                       # (Np,)
    # first index attaining the min (reference tie rule)
    is_best = dist == best[None, :]
    idx = jnp.min(jnp.where(is_best, row, tile_m), axis=0)
    # second-best within the tile: mask exactly the winning row
    dist2 = jnp.where(row == idx[None, :], BIG, dist)
    second = jnp.min(dist2, axis=0)
    idx_g = (idx + i * tile_m).astype(jnp.float32)

    prev_best = acc_ref[0, :]
    prev_idx = acc_ref[1, :]
    prev_second = acc_ref[2, :]
    # later tile replaces only on STRICT improvement -> global first-index
    take = best < prev_best
    new_best = jnp.where(take, best, prev_best)
    new_idx = jnp.where(take, idx_g, prev_idx)
    # runner-up candidates: the displaced best and both tiles' seconds
    new_second = jnp.where(
        take,
        jnp.minimum(prev_best, second),
        jnp.minimum(prev_second, best),
    )
    acc_ref[0, :] = new_best
    acc_ref[1, :] = new_idx
    acc_ref[2, :] = new_second


def match_topk_pallas(desc1, valid1, desc2, valid2, tile_m: int = 8192,
                      interpret: bool = False):
    """(best, idx, second) per desc1 row over the desc2 set, fused on TPU.

    desc1: (N, D), desc2: (M, D); N is padded to the 128-lane width, D to
    16 sublanes (one spare sublane carries the validity penalty — see
    _tile_kernel), M to a multiple of tile_m.  One kernel, no
    post-reduction.
    """
    N, D = desc1.shape
    M = desc2.shape[0]
    Np = _round_up(max(N, 8), LANE)
    Dp = _round_up(max(D + 1, 1), 2 * SUB)
    tile_m = min(tile_m, _round_up(M, LANE))
    Mp = _round_up(M, tile_m)

    d1t = jnp.zeros((Dp, Np), jnp.float32).at[:D, :N].set(desc1.T)
    d2t = jnp.zeros((Dp, Mp), jnp.float32).at[:D, :M].set(desc2.T)
    # validity penalty row: sqrt(1.7e38) for invalid (and padded) columns
    # adds ~1.7e38 to their distance through n2 — f32-safe (< 3.4e38 max)
    pen = jnp.full((Mp,), 1.3e19, jnp.float32).at[:M].set(
        jnp.where(valid2, 0.0, 1.3e19))
    d2t = d2t.at[D, :].set(pen)

    n_tiles = Mp // tile_m
    acc = pl.pallas_call(
        _tile_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Dp, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, Np), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        interpret=interpret,
    )(d1t, d2t)

    best = acc[0, :N]
    idx = acc[1, :N].astype(jnp.int32)
    second = acc[2, :N]
    # all-invalid map: best stays BIG (never accepted); idx -1 clamps to 0
    # downstream, masked by valid=False
    return best, jnp.maximum(idx, 0), second


def match_descriptors_pallas(
    desc1, valid1, desc2, valid2,
    distance_threshold: float = 0.2,
    ratio_threshold: float = 0.8,
    tile_m: int = 8192,
    interpret: bool = False,
) -> MatchResult:
    """Drop-in MatchResult-producing variant of ops.match.match_descriptors."""
    best, idx, second = match_topk_pallas(
        desc1, valid1, desc2, valid2, tile_m, interpret
    )
    accept = (best < distance_threshold) & (best / second < ratio_threshold) & valid1
    return MatchResult(idx=idx.astype(jnp.int32), valid=accept, best=best, second=second)
