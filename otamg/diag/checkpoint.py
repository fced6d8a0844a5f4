"""Checkpoint / resume of APD solver state (SURVEY.md section 5.4: the
reference has none; warm start is its only 'resume' analogue).

State captured per outer iteration k: ``(X, V, lam, bk, key, k)`` — enough
to resume the APD loop exactly.  Uses orbax when importable, with a NumPy
``.npz`` fallback so checkpointing never becomes a hard dependency.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional

import numpy as np


class APDState(NamedTuple):
    X: Any
    V: Any
    lam: Any
    bk: Any
    key: Any
    k: int


def save_dict(path: str, step: int, tree: dict) -> str:
    """Persist a flat dict of arrays for outer-iteration ``step``."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        target = os.path.join(os.path.abspath(path), f"step_{step}")
        ckpt.save(target, dict(tree, k=np.int64(step)), force=True)
        ckpt.wait_until_finished()
        return target
    except Exception:
        target = os.path.join(path, f"step_{step}.npz")
        np.savez(target, k=step,
                 **{k: np.asarray(v) for k, v in tree.items()})
        return target


def load_dict(path: str, step: Optional[int] = None) -> dict:
    import jax.numpy as jnp

    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    npz = os.path.join(path, f"step_{step}.npz")
    if os.path.exists(npz):
        d = np.load(npz)
        out = {k: jnp.asarray(d[k]) for k in d.files if k != "k"}
        out["k"] = int(d["k"])
        return out
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    d = ckpt.restore(os.path.join(os.path.abspath(path), f"step_{step}"))
    d["k"] = int(d["k"])
    return d


def save_state(path: str, state: APDState) -> str:
    return save_dict(path, state.k, dict(X=state.X, V=state.V,
                                         lam=state.lam, bk=state.bk,
                                         key=state.key))


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            steps.append(int(name.split("_")[1].split(".")[0]))
    return max(steps) if steps else None


def load_state(path: str, step: Optional[int] = None) -> APDState:
    d = load_dict(path, step)
    return APDState(d["X"], d["V"], d["lam"], d["bk"], d["key"], d["k"])


def save_result(path: str, res) -> str:
    """Persist a finished solve (primal/dual + records)."""
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, "result.npz")
    np.savez(target, X=np.asarray(res.X), lam=np.asarray(res.lam),
             fxk=np.asarray(res.fxk), converged=res.converged,
             iters=res.iters)
    return target
