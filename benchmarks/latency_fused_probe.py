"""Honest single-stream latency probe (round 5).

Measurement rules learned the hard way on the tunneled relay:
  * the warm DISPATCH FLOOR is ~26 ms — even `x+1` under jit costs that
    much wall per synced call, so the 121-frame tracker (~31 ms) is
    ~85% relay round-trip and ~5 ms real TPU compute; every on-device
    ms cut moves the single-stream number by ~3%;
  * `block_until_ready` against an UNDRAINED enqueue backlog can return
    without waiting (bogus 600k-fps medians) — drain with np.asarray
    once after warmup, then per-rep block timing is stable;
  * medians of >=15 reps, min/max recorded.

Variants: the bench latency profile (pallas GN + fused pair matcher +
24 new-landmark slots) with full FrameLog stats vs log_stats=False
(poses-only scan outputs -> XLA DCEs the diagnostics work), across
scan_unroll {2, 4, 8}.  Prints one JSON line per variant.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tpuvo.config import EngineConfig, MatcherConfig, PICPConfig
from tpuvo.data import load_sequence
from tpuvo.engine import vo


def base_latency_cfg():
    return EngineConfig(
        mode="fixed",
        scan_unroll=4,
        fuse_frame_matchers=True,
        max_new_landmarks_per_frame=24,
        picp=PICPConfig(
            convergence_threshold=1e-4,
            backend="pallas" if jax.default_backend() != "cpu" else "xla"),
        triangulation_refine_iters=2,
    )


def measure(cfg, seq, reps):
    F = seq.uv.shape[0]
    key = jax.random.PRNGKey(42)
    f0, f1 = vo.frame_of(seq, 0), vo.frame_of(seq, 1)
    fc, fn = vo.frames_of(seq, 0, F - 1), vo.frames_of(seq, 1, F)

    def run_once():
        s, lg = vo.full_run_jit(key, f0, f1, fc, fn, cfg)
        jax.block_until_ready(lg.pose)
        return lg

    lg = run_once()                # warm (compile)
    np.asarray(lg.pose)            # DRAIN — see module docstring
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        ts.append(time.perf_counter() - t0)
    fps = sorted(F / t for t in ts)
    return {"fps_median": round(fps[len(fps) // 2], 1),
            "fps_min": round(fps[0], 1), "fps_max": round(fps[-1], 1),
            "ms_median": round(1e3 * sorted(ts)[len(ts) // 2], 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--data", default="/root/reference/data")
    args = ap.parse_args()

    cfg = base_latency_cfg()
    seq = load_sequence(args.data, cfg.n_frames)

    variants = {
        "stats_u4": cfg,
        "nostats_u4": dataclasses.replace(cfg, log_stats=False),
        "nostats_u2": dataclasses.replace(cfg, log_stats=False, scan_unroll=2),
        "nostats_u8": dataclasses.replace(cfg, log_stats=False, scan_unroll=8),
    }
    for name, c in variants.items():
        print(json.dumps({name: measure(c, seq, args.reps)}), flush=True)


if __name__ == "__main__":
    main()
