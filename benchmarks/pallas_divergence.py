"""Find where the in-tracker Pallas PICP path diverges from the XLA path.

latency_breakdown round 4: pallas_gn runs at 3,708 fps but lands at ATE
1.78 (XLA: 0.189) with mean 12.65 GN iterations (XLA: 4.83) — yet
single-solve parity tests pass to 1.6e-6.  This probe runs BOTH trackers
over the real sequence and reports the first frame where poses or
iteration counts diverge, plus the per-frame deviation profile.

Run: python benchmarks/pallas_divergence.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpuvo.config import EngineConfig, PICPConfig
from tpuvo.data import load_sequence
from tpuvo.engine import vo


def main():
    base = EngineConfig(mode="fixed",
                        picp=PICPConfig(convergence_threshold=1e-4))
    seq = load_sequence("/root/reference/data", base.n_frames)
    F = seq.uv.shape[0]
    key = jax.random.PRNGKey(42)
    f0, f1 = vo.frame_of(seq, 0), vo.frame_of(seq, 1)
    fc, fn = vo.frames_of(seq, 0, F - 1), vo.frames_of(seq, 1, F)

    out = {}
    for name in ("xla", "pallas"):
        cfg = dataclasses.replace(
            base, picp=dataclasses.replace(base.picp, backend=name))
        state0, _ = vo.bootstrap_jit(key, f0, f1, cfg)
        state, logs = vo.scan_tracker_jit(state0, fc, fn, cfg)
        out[name] = (np.asarray(logs.pose), np.asarray(logs.iterations),
                     np.asarray(logs.num_inliers),
                     np.asarray(logs.chi_inliers))

    pa, ia, na, ca = out["xla"]
    pb, ib, nb, cb = out["pallas"]
    dev = np.linalg.norm(pa[:, :3, 3] - pb[:, :3, 3], axis=1)
    first_bad = int(np.argmax(dev > 1e-3)) if (dev > 1e-3).any() else -1
    row = {
        "bench": "pallas_picp_in_tracker_parity",
        "device": str(jax.devices()[0]),
        "first_frame_dev_gt_1e3": first_bad,
        "dev_at_first": round(float(dev[max(first_bad, 0)]), 6),
        "dev_max": round(float(dev.max()), 4),
        "mean_iters_xla": round(float(ia.mean()), 2),
        "mean_iters_pallas": round(float(ib.mean()), 2),
        "iters_xla_head": ia[:12].tolist(),
        "iters_pal_head": ib[:12].tolist(),
        "inl_xla_head": na[:12].tolist(),
        "inl_pal_head": nb[:12].tolist(),
    }
    print(json.dumps(row))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    if first_bad >= 0:
        lo = max(0, first_bad - 2)
        for i in range(lo, min(first_bad + 3, len(dev))):
            print(json.dumps({
                "frame": i, "dev": round(float(dev[i]), 6),
                "it_xla": int(ia[i]), "it_pal": int(ib[i]),
                "inl_xla": int(na[i]), "inl_pal": int(nb[i]),
                "chi_xla": round(float(ca[i]), 3),
                "chi_pal": round(float(cb[i]), 3),
            }))


if __name__ == "__main__":
    main()
