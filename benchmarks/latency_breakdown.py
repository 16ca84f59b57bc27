"""Stage-cost attribution for the single-sequence tracker via config deltas.

Times the full scanned tracker under config variants whose difference
isolates one stage (GN rounds, triangulation polish, matcher method), so
the serial per-frame budget can be attributed without a profiler.
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

from tpuvo.config import EngineConfig, MatcherConfig, PICPConfig
from tpuvo.data import load_sequence
from tpuvo.engine import vo


def measure(cfg, seq, reps):
    import numpy as np

    from tpuvo.engine.eval import evaluate

    F = seq.uv.shape[0]
    key = jax.random.PRNGKey(42)
    f0, f1 = vo.frame_of(seq, 0), vo.frame_of(seq, 1)
    fc, fn = vo.frames_of(seq, 0, F - 1), vo.frames_of(seq, 1, F)
    state0, _ = jax.jit(lambda k, a, b: vo.bootstrap(k, a, b, cfg))(key, f0, f1)
    tracker = vo.make_tracker(cfg)
    jax.block_until_ready(state0.pose)

    def run_once():
        s, lg = tracker(state0, fc, fn)
        jax.block_until_ready(lg.pose)
        return lg

    lg = run_once()
    import numpy as _np
    _np.asarray(lg.pose)  # drain the relay queue (block_until_ready can no-op against a backlog)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    poses = jnp.concatenate([jnp.eye(4, dtype=jnp.float32)[None], lg.pose], 0)
    res = evaluate(np.asarray(poses), seq.gt_pose, cfg)
    return med, float(jnp.mean(lg.iterations)), float(res.ate_rmse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--data", default="/root/reference/data")
    args = ap.parse_args()

    base = EngineConfig(
        mode="fixed", scan_unroll=4,
        picp=PICPConfig(convergence_threshold=1e-4),
    )
    seq = load_sequence(args.data, base.n_frames)
    F = seq.uv.shape[0] - 1

    variants = {
        "full": base,
        "gn1": dataclasses.replace(
            base, picp=dataclasses.replace(base.picp, max_iterations=1)),
        "refine0": dataclasses.replace(base, triangulation_refine_iters=0),
        "fused": dataclasses.replace(base, fuse_frame_matchers=True),
        "motion": dataclasses.replace(base, motion_model_init=True),
        "fused_motion": dataclasses.replace(
            base, fuse_frame_matchers=True, motion_model_init=True),
        "pallas_gn": dataclasses.replace(
            base, picp=dataclasses.replace(base.picp, backend="pallas")),
        "pallas_fused_motion": dataclasses.replace(
            base, fuse_frame_matchers=True, motion_model_init=True,
            picp=dataclasses.replace(base.picp, backend="pallas")),
        "unroll8": dataclasses.replace(base, scan_unroll=8),
    }
    res = {}
    for name, cfg in variants.items():
        try:
            med, iters, ate = measure(cfg, seq, args.reps)
        except Exception as e:  # e.g. pallas unsupported on this backend
            print(json.dumps({name: {"error": str(e)[:200]}}), flush=True)
            continue
        res[name] = {"ms_per_frame": round(1e3 * med / F, 4),
                     "fps": round(F / med, 1), "mean_iters": round(iters, 2),
                     "ate_rmse": round(ate, 4)}
        print(json.dumps({name: res[name]}), flush=True)

    gn_marginal = (res["full"]["ms_per_frame"] - res["gn1"]["ms_per_frame"]) / max(
        res["full"]["mean_iters"] - 1.0, 1e-9)
    print(json.dumps({
        "gn_ms_per_round": round(gn_marginal, 4),
        "gn_total_ms": round(gn_marginal * res["full"]["mean_iters"], 4),
        "refine_ms": round(res["full"]["ms_per_frame"] - res["refine0"]["ms_per_frame"], 4),
        "frame_ms": res["full"]["ms_per_frame"],
    }))


if __name__ == "__main__":
    main()
