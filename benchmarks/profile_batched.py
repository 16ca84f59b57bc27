"""Op-level profile of the batched tracker: trace one rep on the device and
aggregate XLA op self-times from the xplane, grouped by fusion name.

Usage: python benchmarks/profile_batched.py [--batch 256] [--top 30]
"""

import argparse
import collections
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--data", default="/root/reference/data")
    ap.add_argument("--matcher", default="direct")
    ap.add_argument("--outdir", default="/tmp/tpuvo_trace")
    args = ap.parse_args()

    from tpuvo.config import EngineConfig, MatcherConfig, PICPConfig
    from tpuvo.data import load_sequence
    from tpuvo.engine import vo

    cfg = EngineConfig(
        mode="fixed",
        matcher=MatcherConfig(method=args.matcher),
        picp=PICPConfig(convergence_threshold=1e-4),
    )
    seq = load_sequence(args.data, 121)
    F = seq.uv.shape[0]
    key = jax.random.PRNGKey(42)
    f0, f1 = vo.frame_of(seq, 0), vo.frame_of(seq, 1)
    fc, fn = vo.frames_of(seq, 0, F - 1), vo.frames_of(seq, 1, F)
    B = args.batch

    def batched(k, bf0, bf1, bc, bn):
        s, _ = jax.vmap(lambda kk, a, b: vo.bootstrap(kk, a, b, cfg))(k, bf0, bf1)
        s, lg = jax.vmap(lambda st, c, n: vo.scan_tracker(st, c, n, cfg))(s, bc, bn)
        return lg.pose

    batched_j = jax.jit(batched)
    tile = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
    a = (jax.random.split(key, B), jax.tree.map(tile, f0), jax.tree.map(tile, f1),
         jax.tree.map(tile, fc), jax.tree.map(tile, fn))
    jax.block_until_ready(batched_j(*a))  # warm

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(batched_j(*a))

    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(args.outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        sys.exit(f"no *.xplane.pb trace found under {args.outdir} — "
                 "did the profiler run?")
    pd = ProfileData.from_file(paths[-1])
    agg = collections.Counter()
    events_total = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                # strip ONLY a trailing '.N' fusion suffix (fusion.123 ->
                # fusion); a bare rstrip of digits would also mangle names
                # like convert_f32 -> convert_f
                base = re.sub(r"\.\d+$", "", name)
                agg[base] += ev.duration_ns
                events_total += 1
    total = sum(agg.values())
    print(json.dumps({"plane_total_ms": round(total / 1e6, 3),
                      "events": events_total}))
    for name, ns in agg.most_common(args.top):
        print(f"{ns/1e6:10.3f} ms  {100*ns/total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
