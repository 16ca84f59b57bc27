"""Checkpoint / resume for the VO state (SURVEY.md §5: absent in the
reference, whose only persistence is the end-of-run artifact dump).

The VO state is a small pytree (pose + fixed-capacity map + counters), so a
single .npz per checkpoint is sufficient and dependency-free; the sharded
BA state reuses the same format per shard.  Orbax is available in the
environment for users who want async/multi-host checkpointing of larger
states — the npz layout here is deliberately the same tree flattening, so
swapping the backend is mechanical.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from tpuvo.engine.state import VOState


def save_state(path: str, state: VOState, frame_idx: int, extra: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {f"state_{k}": np.asarray(v) for k, v in state._asdict().items()}
    payload["frame_idx"] = np.int32(frame_idx)
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_state(path: str):
    """Returns (VOState, frame_idx, extra_dict)."""
    z = np.load(path, allow_pickle=False)
    fields = {k[len("state_"):]: z[k] for k in z.files if k.startswith("state_")}
    import jax.numpy as jnp

    state = VOState(**{k: jnp.asarray(v) for k, v in fields.items()})
    extra = {k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")}
    return state, int(z["frame_idx"]), extra


def checkpoint_every(run_step, save_path: str, every: int = 25):
    """Wrap a host-side frame loop step with periodic checkpointing."""

    def wrapped(state, frame_idx, *args, **kw):
        state, out = run_step(state, frame_idx, *args, **kw)
        if frame_idx % every == 0:
            save_state(save_path, state, frame_idx)
        return state, out

    return wrapped
