"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: frames/s of the full VO pipeline (bootstrap + 120-frame tracking:
matching, PICP GN, triangulation, map growth) on the bundled 121-frame
sequence, measured on the available accelerator.

vs_baseline anchors against the C++ reference compiled in Release (-O3) on
this machine: 3584.35 frames/s (see BASELINE.md "Measured C++ baseline").

Two modes are measured and the throughput mode is the headline (TPU-first:
single-sequence tracking is latency-bound by the sequential GN chain, so the
chip is saturated by batching independent sequences — the same program
vmapped over a batch axis):
  * latency  — one sequence, frames/s = F / wall
  * throughput — vmap over B DISTINCT sequences (per-lane pixel noise +
    PRNG keys, so per-lane match/iteration schedules differ),
    frames/s = B*F / wall
"""

import json
import os
import sys
import time

import numpy as np

CPP_BASELINE_FPS = 3584.35


def main():
    # Persistent XLA compilation cache: bench compiles 6+ programs at
    # 30-90 s each over the relay; caching makes repeat runs start in
    # seconds AND pins the run to one compiled binary (per-compile
    # autotuning differences moved the latency median by ~10% between
    # otherwise identical runs).
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/tpuvo_jax_cache")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass  # older jax without the config knob: env var alone suffices

    from tpuvo.config import EngineConfig
    from tpuvo.data import load_sequence
    from tpuvo.data import synthetic
    from tpuvo.engine import vo
    from tpuvo.engine.eval import evaluate, metrics_dict

    from tpuvo.config import MatcherConfig

    # "fixed" mode = production default: landmark parallax gating keeps the
    # tracker robust through the sparse section on every backend (parity
    # mode reproduces the reference's fragile unfiltered map; see README).
    # Matcher "mxu_bf16" (round 5): +11% batched throughput over "direct"
    # (65.2k vs 58.6k fps at batch 256 — the bf16 cross-term matmul at the
    # MXU's native precision), decision-identical on the bundled data
    # (0 accept/index flips; the ATE/golden gates below verify every run).
    from tpuvo.config import PICPConfig

    cfg = EngineConfig(
        mode=os.environ.get("TPUVO_BENCH_MODE", "fixed"),
        fuse_frame_matchers=os.environ.get("TPUVO_BENCH_FUSED", "0") == "1",
        motion_model_init=os.environ.get("TPUVO_BENCH_MOTION", "0") == "1",
        matcher=MatcherConfig(method=os.environ.get("TPUVO_BENCH_MATCHER", "mxu_bf16")),
        # fast profile: rel-chi 1e-4 (mean 5 GN iters vs 7.6, no accuracy
        # cost); keep 2 triangulation polish iterations — dropping to 1
        # was fine on CPU but cost ~0.05 ATE on the TPU fp path.
        # GN stays a while_loop: unrolled_rounds=8 costs the batched path
        # 28% (fixed 8 rounds vs ~5 adaptive; measured 26.0k vs 36.0k fps).
        picp=PICPConfig(
            convergence_threshold=1e-4,
            unrolled_rounds=int(os.environ.get("TPUVO_BENCH_GN_UNROLL", "0")),
            # "pallas": whole GN loop as one Mosaic kernel inside the scan
            # (TPU only; see PICPConfig.backend)
            backend=os.environ.get("TPUVO_BENCH_PICP", "xla"),
        ),
        triangulation_refine_iters=int(os.environ.get("TPUVO_BENCH_REFINE", "2")),
    )
    # Dedicated LATENCY profile (round 4; each ingredient measured on the
    # real sequence via benchmarks/latency_breakdown.py):
    #   * fused pair matcher — one MXU distance matmul for both matches
    #   * Pallas PICP backend — the whole GN loop as ONE Mosaic kernel
    #     (3,688 fps vs 2,733 XLA; requires the round-4 Jp·K principal-
    #     point fix, which took in-kernel ATE from 1.78 back to 0.188)
    #   * 24 new-landmark slots (dataset peak is 21/frame — lossless)
    #   * scan_unroll=4 (XLA schedules across step bodies)
    # Accuracy of this profile is gated independently below.
    import dataclasses

    # Round-5 additions (benchmarks/latency_fused_probe.py, drained-queue
    # medians): scan_unroll 8 + poses-only scan outputs (log_stats=False,
    # XLA DCEs the diagnostics) + ONE fused bootstrap+scan dispatch =
    # median 4197 fps / min 3721 over 15 reps (vs C++ 3584.35).  The warm
    # relay dispatch floor is ~26 ms of the ~29 ms wall — real on-device
    # compute is ~3 ms (~40k fps) — so the recorded number is dominated by
    # the tunnel tax the local C++ loop does not pay, and still wins.
    from tpuvo.config import RansacConfig

    cfg_lat = dataclasses.replace(
        cfg,
        scan_unroll=int(os.environ.get("TPUVO_BENCH_SCAN_UNROLL", "8")),
        log_stats=os.environ.get("TPUVO_BENCH_LAT_STATS", "0") == "1",
        fuse_frame_matchers=os.environ.get("TPUVO_BENCH_LAT_FUSED", "1") == "1",
        # 256 RANSAC hypotheses: measured fps-neutral-to-positive with
        # identical ATE (0.1885) — half the bootstrap matmul work
        ransac=RansacConfig(num_hypotheses=int(
            os.environ.get("TPUVO_BENCH_LAT_RANSAC", "256"))),
        max_new_landmarks_per_frame=int(
            os.environ.get("TPUVO_BENCH_LAT_NEWLM", "24")),
        picp=dataclasses.replace(
            cfg.picp,
            # Mosaic kernels need real TPU hardware; CPU smoke runs of
            # this bench fall back to the XLA solver
            backend=os.environ.get(
                "TPUVO_BENCH_LAT_PICP",
                "pallas" if jax.default_backend() != "cpu" else "xla")),
    )
    data_dir = os.environ.get("TPUVO_DATA", "/root/reference/data")
    if os.path.isdir(data_dir):
        seq = load_sequence(data_dir, cfg.n_frames)
    else:  # fall back to a synthetic sequence of the same shape
        world = synthetic.make_world(0, n_landmarks=1000)
        gt = synthetic.make_planar_trajectory(cfg.n_frames)
        seq = synthetic.render_sequence(world, gt, cfg, pixel_noise=0.1)

    F = seq.uv.shape[0]
    key = jax.random.PRNGKey(42)

    f0 = vo.frame_of(seq, 0)
    f1 = vo.frame_of(seq, 1)
    frames_curr = vo.frames_of(seq, 0, F - 1)
    frames_next = vo.frames_of(seq, 1, F)

    boot = jax.jit(lambda k, a, b: vo.bootstrap(k, a, b, cfg))
    tracker = vo.make_tracker(cfg)

    # ---- accuracy gate (the bench is invalid if parity breaks) -----------
    # HARD gate, not a report: if the tracked trajectory leaves the
    # reference's error envelope (mean 0.210 / max 0.371 from
    # output/errors.txt; gate at ate<=0.25, mean<=0.30), vs_baseline is
    # zeroed so a fast-but-wrong operating point can never post a headline
    # (the round-2 failure mode).
    state0, _ = boot(key, f0, f1)
    state, logs = tracker(state0, frames_curr, frames_next)
    poses = jnp.concatenate([jnp.eye(4, dtype=jnp.float32)[None], logs.pose], 0)
    res = evaluate(np.asarray(poses), seq.gt_pose, cfg)
    acc = metrics_dict(res)
    accuracy_ok = acc["ate_rmse"] <= 0.25 and acc["trans_err_mean"] <= 0.30

    # ---- ON-HARDWARE golden gate: per-frame row-wise deviation vs the
    # reference's shipped scaled trajectory (icp_test.cpp:147-210 output).
    # ATE/mean alone is a single aggregate — a TPU-only drift localized in
    # a few frames (the r02 failure mode) can hide under it; the per-frame
    # max cannot.  Thresholds = 2x the measured CPU fixed-mode envelope
    # (dev mean 0.058 / max 0.137 vs estimated_trajectory_scaled.txt).
    golden = {}
    golden_ok = True
    ref_traj = os.path.join(
        os.path.dirname(data_dir), "output", "estimated_trajectory_scaled.txt")
    if os.path.exists(ref_traj):
        ref = np.loadtxt(ref_traj)
        est_t = res.poses_world[:, :3, 3] * res.scale
        if len(ref) == len(est_t):
            dev = np.linalg.norm(est_t[:, :2] - ref[:, 1:3], axis=1)
            golden = {
                "golden_dev_mean": round(float(dev.mean()), 4),
                "golden_dev_max": round(float(dev.max()), 4),
            }
            golden_ok = dev.mean() <= 0.12 and dev.max() <= 0.30
        else:
            # frame-count override (--frames/env): the row-wise diff is
            # undefined — skip the gate explicitly rather than crash
            golden = {"golden_gate_skipped": f"len {len(est_t)} vs ref {len(ref)}"}
    accuracy_ok = bool(accuracy_ok and golden_ok)

    # ---- latency mode ----------------------------------------------------
    # cfg_lat may enable different solver/matcher paths than the
    # throughput config, so its trajectory is gated independently — a fast
    # latency mode that breaks parity zeroes latency_vs_baseline.
    # ONE dispatch per rep (vo.full_run_jit): bootstrap + the whole scan
    # as a single compiled program — the inter-program dispatch gap of the
    # two-dispatch path was pure serial latency on the tunneled relay.
    def run_once():
        s, lg = vo.full_run_jit(key, f0, f1, frames_curr, frames_next, cfg_lat)
        jax.block_until_ready(lg.pose)
        return lg

    lg_lat = run_once()  # warm
    poses_lat = jnp.concatenate(
        [jnp.eye(4, dtype=jnp.float32)[None], lg_lat.pose], 0)
    acc_lat = metrics_dict(evaluate(np.asarray(poses_lat), seq.gt_pose, cfg_lat))
    latency_accuracy_ok = (
        acc_lat["ate_rmse"] <= 0.25 and acc_lat["trans_err_mean"] <= 0.30)
    # Per-rep spread, median as the recorded number (round 4's reps=5 mean
    # was a coin flip around 1x under the relay's ~+/-20% run-to-run noise;
    # a claim of beating the C++ core must be the median of a real sample,
    # with min/max recorded so the claim is falsifiable).
    lat_reps = int(os.environ.get("TPUVO_BENCH_LAT_REPS", "21"))
    run_once()
    run_once()  # 2 untimed reps re-warm the relay after the eval transfer
    # Measure the relay dispatch floor IN THIS RUN (a trivial jitted op,
    # same per-rep sync discipline): the tunnel's round-trip is ~26 ms of
    # the ~29 ms single-stream wall and drifts +-15% between runs with an
    # identical cached binary — recording the floor makes any latency
    # record attributable between the tunnel and the program.  The raw
    # wall number remains the recorded latency_vs_baseline.
    trivial = jax.jit(lambda x: x + 1.0)
    xf = jnp.zeros((8, 128), jnp.float32)
    np.asarray(trivial(xf))  # warm + drain
    floor_ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(xf))
        floor_ts.append(time.perf_counter() - t0)
    relay_floor_s = sorted(floor_ts)[len(floor_ts) // 2]
    lat_times = []
    for _ in range(lat_reps):
        t0 = time.perf_counter()
        run_once()
        lat_times.append(time.perf_counter() - t0)
    lat_fps_all = sorted(F / t for t in lat_times)
    fps_latency = lat_fps_all[len(lat_fps_all) // 2]  # median
    reps = 5

    # ---- throughput mode: vmapped batch of DISTINCT sequences ------------
    # Each lane gets its own pixel noise (sigma 0.25 px, detector-level) and
    # PRNG key, so matches, inlier sets and GN iteration counts differ per
    # lane — the batched while_loop runs the max-lane schedule, and the
    # number measures 256 independent streams, not one stream 256 times.
    B = int(os.environ.get("TPUVO_BENCH_BATCH", "256"))

    def batched(k, bf0, bf1, bc, bn):
        s, _ = jax.vmap(lambda kk, a, b: vo.bootstrap(kk, a, b, cfg))(k, bf0, bf1)
        s, lg = jax.vmap(lambda st, c, n: vo.scan_tracker(st, c, n, cfg))(s, bc, bn)
        return lg.pose

    batched_j = jax.jit(batched)
    tile = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
    keys = jax.random.split(key, B)

    def perturb(frames, salt):
        t = jax.tree.map(tile, frames)
        noise = 0.25 * jax.random.normal(
            jax.random.PRNGKey(1000 + salt), t.uv.shape, t.uv.dtype)
        return t._replace(uv=t.uv + noise * t.valid[..., None])

    # frame i appears as frames_next[i-1] AND frames_curr[i]: perturb the
    # full frame axis once so both views of a frame see the same pixels
    ball = perturb(vo.frames_of(seq, 0, F), 0)
    sl = lambda fr, lo, hi: jax.tree.map(lambda x: x[:, lo:hi], fr)
    bf0 = jax.tree.map(lambda x: x[:, 0], ball)
    bf1 = jax.tree.map(lambda x: x[:, 1], ball)
    bc = sl(ball, 0, F - 1)
    bn = sl(ball, 1, F)
    jax.block_until_ready(batched_j(keys, bf0, bf1, bc, bn))  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(batched_j(keys, bf0, bf1, bc, bn))
    thr_s = (time.perf_counter() - t0) / reps
    fps_throughput = B * F / thr_s

    # ---- SLAM mode (flagship beyond-reference capability), gated --------
    # 200-frame KITTI-scale loop circuit (the kitti_ba --loop fixture):
    # tracking with interleaved local BA (engine/slam.py), then the
    # loop-closure + global-BA refinement stack.  Gated like the latency
    # mode: if ATE leaves the stated envelope the SLAM numbers are zeroed,
    # so the capability can never silently regress between rounds.
    # Envelope: 2x the round-4 measured operating point (slam 0.46 /
    # refined 0.08 on this fixture).
    slam = {}
    run_slam = os.environ.get(
        "TPUVO_BENCH_SLAM", "1" if jax.default_backend() != "cpu" else "0")
    if run_slam == "1":
        from tpuvo.config import BAConfig
        from tpuvo.engine.slam import run_sequence_slam
        from tpuvo.engine.ba_refine import refine_trajectory_loop

        sf = int(os.environ.get("TPUVO_BENCH_SLAM_FRAMES", "200"))
        scap = int(os.environ.get("TPUVO_BENCH_SLAM_CAP", "8192"))
        sgt = synthetic.make_loop_trajectory(sf, step=1.0, seed=7)
        sext = float(np.abs(sgt[:, :2]).max()) + 15.0
        sworld = synthetic.make_world(7, n_landmarks=20000,
                                      xy_extent=sext, z_range=(0.0, 8.0))
        cfg_slam = EngineConfig(
            mode="fixed", n_frames=sf, map_capacity=scap,
            fuse_frame_matchers=True,
            # the 8192-slot map is the Pallas matcher's operating point
            # (3x the XLA path per match; +12% plain-tracker fps,
            # bit-identical trajectories); CPU smoke keeps the MXU path
            matcher=MatcherConfig(method=os.environ.get(
                "TPUVO_BENCH_SLAM_MATCHER",
                "pallas" if jax.default_backend() != "cpu" else "mxu")),
            picp=PICPConfig(convergence_threshold=1e-4),
            ba=dataclasses.replace(EngineConfig().ba, max_landmarks=scap),
        )
        sseq = jax.tree.map(jnp.asarray, synthetic.render_sequence(
            sworld, sgt, cfg_slam, pixel_noise=0.3, seed=7))
        state_s, logs_s, poses_slam, diag_s = run_sequence_slam(
            sseq, cfg_slam, seed=7)  # warm
        jax.block_until_ready(poses_slam)
        np.asarray(poses_slam)  # drain the relay queue before timing
        slam_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, pslam_t, _ = run_sequence_slam(sseq, cfg_slam, seed=7)
            jax.block_until_ready(pslam_t)
            slam_times.append(time.perf_counter() - t0)
        slam_fps = (sf - 1) / sorted(slam_times)[len(slam_times) // 2]
        m_slam = metrics_dict(
            evaluate(np.asarray(poses_slam), sseq.gt_pose, cfg_slam))
        gcfg = BAConfig(window=sf, iterations=15, huber_threshold=500.0,
                        max_landmarks=scap)
        t0 = time.perf_counter()
        poses_ref, _, _ = refine_trajectory_loop(
            state_s, sseq, poses_slam, cfg_slam, gcfg, n_sweeps=3)
        refine_s = time.perf_counter() - t0
        m_ref = metrics_dict(
            evaluate(np.asarray(poses_ref), sseq.gt_pose, cfg_slam))
        slam_gate_ok = (m_slam["ate_rmse"] <= 1.0 and
                        m_ref["ate_rmse"] <= 0.2)
        slam = {
            "slam_fps": round(slam_fps, 1) if slam_gate_ok else 0.0,
            "ate_slam": round(m_slam["ate_rmse"], 4),
            "ate_refined": round(m_ref["ate_rmse"], 4),
            "slam_gate_ok": bool(slam_gate_ok),
            "slam_frames": sf,
            "slam_refine_s": round(refine_s, 2),
        }

    fps = max(fps_latency, fps_throughput)
    # the headline must be gated by the accuracy of WHICHEVER mode
    # supplies it: when the latency number wins the max, a broken latency
    # profile must not post a headline either
    headline_ok = accuracy_ok and (
        fps_throughput >= fps_latency or latency_accuracy_ok)
    out = {
        "metric": "vo_frames_per_second",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / CPP_BASELINE_FPS, 3) if headline_ok else 0.0,
        "extra": {
            "accuracy_gate_ok": accuracy_ok,
            "fps_latency_1seq": round(fps_latency, 1),
            # the single-stream race vs the C++ core, gated on its own
            # config's accuracy so it can never silently regress again.
            # fps_latency_1seq is the MEDIAN of lat_reps individually
            # timed runs; min/max recorded so the claim is falsifiable.
            "latency_vs_baseline": (
                round(fps_latency / CPP_BASELINE_FPS, 3)
                if latency_accuracy_ok else 0.0),
            "latency_fps_min": round(lat_fps_all[0], 1),
            "latency_fps_max": round(lat_fps_all[-1], 1),
            "latency_reps": lat_reps,
            # tunnel-vs-program decomposition (see comment at the floor
            # measurement): on-device estimate = wall minus relay floor
            "relay_floor_ms": round(1e3 * relay_floor_s, 2),
            "fps_latency_ondevice_est": round(
                F / max(F / fps_latency - relay_floor_s, 1e-6), 1),
            "latency_accuracy_ok": latency_accuracy_ok,
            "latency_ate_rmse": round(acc_lat["ate_rmse"], 4),
            "fps_throughput_batch": round(fps_throughput, 1),
            "batch": B,
            "device": str(jax.devices()[0]),
            "ate_rmse": round(acc["ate_rmse"], 4),
            "trans_err_mean": round(acc["trans_err_mean"], 4),
            "ate_robot": round(acc["ate_robot"], 4),
            **golden,
            **slam,
            "map_count": int(state.map_count),
            "cpp_baseline_fps": CPP_BASELINE_FPS,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
