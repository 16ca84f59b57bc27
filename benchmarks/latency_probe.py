"""Single-sequence latency sweep: scan-unroll x GN-unroll on real hardware.

The tracker is latency-bound (sequential 120-frame chain of small ops); this
probe measures frames/s for each compile-time config so bench.py's latency
profile can be pinned to measured numbers rather than guesses.

Usage: python benchmarks/latency_probe.py [--reps 8]
Prints one JSON line per config.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpuvo.config import EngineConfig, PICPConfig
from tpuvo.data import load_sequence
from tpuvo.engine import vo


def measure(cfg, seq, reps):
    F = seq.uv.shape[0]
    key = jax.random.PRNGKey(42)
    f0 = vo.frame_of(seq, 0)
    f1 = vo.frame_of(seq, 1)
    fc = vo.frames_of(seq, 0, F - 1)
    fn = vo.frames_of(seq, 1, F)
    boot = jax.jit(lambda k, a, b: vo.bootstrap(k, a, b, cfg))
    tracker = vo.make_tracker(cfg)
    state0, _ = boot(key, f0, f1)
    jax.block_until_ready(state0.pose)

    def run_once():
        s, lg = tracker(state0, fc, fn)
        jax.block_until_ready(lg.pose)
        return lg

    t0 = time.perf_counter()
    lg = run_once()
    import numpy as _np
    _np.asarray(lg.pose)  # drain the relay queue (block_until_ready can no-op against a backlog)  # warm / compile
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    return {
        "fps_best": round((F - 1) / best, 1),
        "fps_median": round((F - 1) / med, 1),
        "compile_s": round(compile_s, 1),
        "mean_iters": round(float(jnp.mean(lg.iterations)), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--data", default="/root/reference/data")
    args = ap.parse_args()

    base = EngineConfig(mode="fixed", picp=PICPConfig(convergence_threshold=1e-4))
    seq = load_sequence(args.data, base.n_frames)

    configs = []
    for scan_unroll in (4, 8):
        for gn_unroll in (0, 8):
            configs.append((scan_unroll, gn_unroll))

    for scan_unroll, gn_unroll in configs:
        cfg = dataclasses.replace(
            base,
            scan_unroll=scan_unroll,
            picp=dataclasses.replace(base.picp, unrolled_rounds=gn_unroll),
        )
        res = measure(cfg, seq, args.reps)
        res.update({"scan_unroll": scan_unroll, "gn_unroll": gn_unroll,
                    "device": str(jax.devices()[0])})
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
