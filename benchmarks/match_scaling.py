"""Matcher map-size scaling: direct vs mxu vs the fused Pallas kernel.

North star names "matching (brute-force scan -> batched Pallas top-k
descriptor kernel)" as a subsystem that changes; this benchmark records
where the kernel actually wins.  For map sizes 512 -> 100k landmarks it
times one 128-query match per method and appends the crossover record to
results.jsonl.

Methodology (relay-aware, see benchmarks/latency_fused_probe.py): a
single match dispatch sits below the ~26 ms relay floor, so each timed
unit is a jitted CHAIN of ``chain`` dependent matches (output feeds the
next query selection) — one dispatch, chain x real kernel executions;
per-match time = wall / chain.  Median of --reps, queue drained after
warmup.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tpuvo.ops.match import match_descriptors

MAP_SIZES = [512, 2048, 8192, 32768, 131072]
METHODS = ["direct", "mxu", "pallas"]
N_QUERIES = 128
DESC = 10


def make_timed_fn(method, chain):
    @jax.jit
    def run(q, valid_q, m, valid_m):
        # chain dependent matches: mix each result back into the query so
        # XLA cannot collapse the chain (the best-distance vector reorders
        # the queries' scale slightly; decisions stay nontrivial)
        def body(i, carry):
            q_c, acc = carry
            r = match_descriptors(q_c, valid_q, m, valid_m, 0.2, 0.8, method)
            q_c = q_c * (1.0 + 1e-7 * r.best[:, None])
            return q_c, acc + jnp.sum(r.idx)
        q_c, acc = jax.lax.fori_loop(0, chain, body, (q, jnp.int32(0)))
        return acc, q_c[0, 0]
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--chain", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1, 1, (N_QUERIES, DESC)).astype(np.float32))
    vq = jnp.ones((N_QUERIES,), bool)

    rows = {}
    for M in MAP_SIZES:
        m = jnp.asarray(rng.uniform(-1, 1, (M, DESC)).astype(np.float32))
        vm = jnp.ones((M,), bool)
        rows[M] = {}
        for method in METHODS:
            if method == "direct" and M > 32768:
                continue  # (N, M, D) broadcast would be 16 GB+: skip
            try:
                fn = make_timed_fn(method, args.chain)
                acc, probe = fn(q, vq, m, vm)
                np.asarray(probe)  # warm + drain
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(q, vq, m, vm)[1])
                    ts.append(time.perf_counter() - t0)
                med = sorted(ts)[len(ts) // 2]
                rows[M][method] = round(1e6 * med / args.chain, 1)  # us/match
            except Exception as e:
                rows[M][method] = f"error: {str(e)[:120]}"
            print(json.dumps({"map_size": M, "method": method,
                              "us_per_match": rows[M][method]}), flush=True)

    out = {
        "bench": "match_scaling",
        "n_queries": N_QUERIES,
        "chain": args.chain,
        "reps": args.reps,
        "us_per_match": {str(k): v for k, v in rows.items()},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
