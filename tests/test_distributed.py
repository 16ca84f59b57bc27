"""Real multi-process jax.distributed path: 2 CPU processes, localhost
coordinator, one sharded BA step across the global mesh.

Everything else in the suite exercises sharding on a single-process
virtual mesh; this is the only test where ``jax.distributed.initialize``
actually runs and the psum crosses a process boundary (SURVEY.md §5
"Distributed communication backend").
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpuvo.parallel.mesh import maybe_distributed_init

    n_proc = maybe_distributed_init()
    assert n_proc == 2, f"expected 2 processes, got {n_proc}"
    assert jax.device_count() == 2
    assert jax.local_device_count() == 1

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from tpuvo.ba.window import BAProblem
    from tpuvo.config import BAConfig, EngineConfig
    from tpuvo.data import synthetic
    from tpuvo.parallel.ba_sharded import shard_ba_problem, sharded_ba_step

    # tiny synthetic BA problem (oracle correspondences via id_real),
    # sharded over the 2-process global mesh
    cfg = EngineConfig()
    world = synthetic.make_world(3, n_landmarks=64, xy_extent=6.0)
    gt = synthetic.make_planar_trajectory(6, step=0.25, seed=3)
    seq = synthetic.render_sequence(world, gt, cfg, pixel_noise=0.2, seed=3)
    wic = np.stack([
        np.linalg.inv(synthetic.camera_pose_from_gt(gt[i], cfg))
        for i in range(6)
    ]).astype(np.float32)
    prob = BAProblem(
        poses=jnp.asarray(wic),
        points=jnp.asarray(world.xyz),
        obs_uv=jnp.asarray(seq.uv),
        obs_lm=jnp.asarray(np.maximum(seq.id_real, 0)),
        obs_valid=jnp.asarray(seq.valid),
        point_valid=jnp.ones(64, bool),
        fixed=jnp.asarray([True, True, False, False, False, False]),
    )

    sp = shard_ba_problem(prob, 2)
    mesh = Mesh(np.array(jax.devices()), ("lm",))
    sp2, stats = sharded_ba_step(mesh, sp, jnp.asarray(cfg.K()),
                                 cfg.width, cfg.height, BAConfig())
    chi = float(stats.chi)
    assert np.isfinite(chi), chi
    assert np.all(np.isfinite(np.asarray(sp2.poses)))
    print(f"OK process={jax.process_index()} chi={chi:.3f}")
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_ba_step(tmp_path):
    port = _free_port()
    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        # each process contributes exactly one CPU device to the global mesh
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    }
    env_base.pop("JAX_PROCESS_ID", None)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process jax.distributed test timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "OK process=" in out
