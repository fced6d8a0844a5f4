"""Checkpoint / resume of APD solver state (SURVEY.md section 5.4: the
reference has none; warm start is its only 'resume' analogue).

State captured per outer iteration k: ``(X, V, lam, bk, key, k, resk)``
— enough to resume the APD loop exactly (``resk``, the previous raw KKT
residual, feeds the restart heuristic ``Class1/APD_SsN_Class1.m:245``).

Two storage layouts:

* **Single-process**: orbax when importable, NumPy ``.npz`` fallback.
* **Multi-process (round 5)**: each process writes
  ``step_{k}.proc{pid}of{np}.npz`` holding ONLY its addressable shards
  (``jax.Array.addressable_shards``) plus index metadata; restore
  reassembles global arrays against a TEMPLATE pytree's shardings via
  ``jax.make_array_from_single_device_arrays``.  No cross-process
  gather at save or load — each controller touches its own data, which
  is what makes checkpointing work at all on non-fully-addressable
  state (a plain ``np.asarray`` of such an array is rejected by JAX).
  Requires the same process count / mesh topology at restore, which is
  the standard elastic-resume contract for sharded checkpoints.
"""

from __future__ import annotations

import glob
import json
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
    resk: Any = None  # previous raw KKT residual (restart heuristic)


def _is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def _needs_shard_io(tree: dict) -> bool:
    import jax

    return any(isinstance(v, jax.Array) and not v.is_fully_addressable
               for v in tree.values())


def _index_key(idx) -> str:
    """Canonical string key for a shard's global index (tuple of
    slices)."""
    return json.dumps([[s.start, s.stop] for s in idx])


def save_dict(path: str, step: int, tree: dict) -> str:
    """Persist a flat dict of arrays for outer-iteration ``step``."""
    os.makedirs(path, exist_ok=True)
    if _is_multiprocess() or _needs_shard_io(tree):
        return _save_sharded(path, step, tree)
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


def _save_sharded(path: str, step: int, tree: dict) -> str:
    """Per-process shard save (multi-controller safe)."""
    import jax

    pid, nproc = jax.process_index(), jax.process_count()
    data: dict[str, np.ndarray] = {}
    meta: dict[str, list] = {}
    for name, v in tree.items():
        if (isinstance(v, jax.Array) and len(v.sharding.device_set) > 1
                and v.sharding.is_fully_replicated):
            # Replicated across the mesh (duals, scalars, PRNG keys):
            # one local copy is the whole array; restore re-replicates
            # it implicitly as a jit argument.
            data[name] = np.asarray(v.addressable_shards[0].data)
        elif isinstance(v, jax.Array) and len(v.sharding.device_set) > 1:
            shards = sorted(v.addressable_shards,
                            key=lambda s: tuple(sl.start or 0
                                                for sl in s.index))
            meta[name] = []
            for si, s in enumerate(shards):
                data[f"{name}__s{si}"] = np.asarray(s.data)
                meta[name].append(_index_key(
                    tuple(slice(sl.start or 0,
                                sl.stop if sl.stop is not None
                                else v.shape[d])
                          for d, sl in enumerate(s.index))))
        else:
            data[name] = np.asarray(v)
    target = os.path.join(path, f"step_{step}.proc{pid}of{nproc}.npz")
    tmp = target + ".tmp.npz"  # savez appends .npz unless present
    np.savez(tmp, k=step, __meta__=json.dumps(meta), **data)
    os.replace(tmp, target)
    return target


def _load_sharded(path: str, step: int, template: Optional[dict]) -> dict:
    """Load this process's shard file and reassemble global arrays
    against ``template`` shardings (same process count / topology as the
    save)."""
    import jax
    import jax.numpy as jnp

    pid, nproc = jax.process_index(), jax.process_count()
    target = os.path.join(path, f"step_{step}.proc{pid}of{nproc}.npz")
    d = np.load(target)
    meta = json.loads(str(d["__meta__"]))
    out: dict[str, Any] = {"k": int(d["k"])}
    for name in set(k.split("__s")[0] for k in d.files
                    if k not in ("k", "__meta__")):
        if name not in meta:
            out[name] = jnp.asarray(d[name])
            continue
        t = (template or {}).get(name)
        if t is None:
            raise ValueError(
                f"checkpoint array '{name}' was saved sharded; restore "
                f"requires a template with its target sharding")
        sh, gshape = t.sharding, t.shape
        by_index = {idx: d[f"{name}__s{si}"]
                    for si, idx in enumerate(meta[name])}
        dmap = sh.devices_indices_map(tuple(gshape))
        arrays = []
        for dev in sh.addressable_devices:
            idx = tuple(slice(sl.start or 0,
                              sl.stop if sl.stop is not None
                              else gshape[i])
                        for i, sl in enumerate(dmap[dev]))
            arrays.append(jax.device_put(
                jnp.asarray(by_index[_index_key(idx)], t.dtype), dev))
        out[name] = jax.make_array_from_single_device_arrays(
            tuple(gshape), sh, arrays)
    return out


def _assemble_from_proc_files(files: list, template: Optional[dict]) -> dict:
    """Single-process reassembly of a multi-process checkpoint: read every
    ``step_{k}.proc{p}of{n}.npz`` and stitch each sharded array back
    together from its shard blocks' global indices.  Everything is
    addressable in one process, so the result is returned as ordinary
    arrays — device_put against ``template`` shardings when given."""
    import jax
    import jax.numpy as jnp

    out: dict[str, Any] = {}
    blocks: dict[str, list] = {}
    for f in files:
        d = np.load(f)
        meta = json.loads(str(d["__meta__"]))
        out.setdefault("k", int(d["k"]))
        for name in set(k.split("__s")[0] for k in d.files
                        if k not in ("k", "__meta__")):
            if name not in meta:
                # Replicated / unsharded: identical in every proc file.
                if name not in out:
                    out[name] = jnp.asarray(d[name])
            else:
                for si, idx_key in enumerate(meta[name]):
                    idx = tuple(slice(a, b) for a, b in json.loads(idx_key))
                    blocks.setdefault(name, []).append(
                        (idx, d[f"{name}__s{si}"]))
    for name, parts in blocks.items():
        ndim = len(parts[0][0])
        shape = tuple(max(p[0][dim].stop for p in parts)
                      for dim in range(ndim))
        arr = np.zeros(shape, parts[0][1].dtype)
        for idx, blk in parts:
            arr[idx] = blk
        t = (template or {}).get(name)
        out[name] = (jax.device_put(arr, t.sharding) if t is not None
                     else jnp.asarray(arr))
    return out


def load_dict(path: str, step: Optional[int] = None,
              template: Optional[dict] = None) -> dict:
    import jax.numpy as jnp

    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    if _is_multiprocess():
        return _load_sharded(path, step, template)
    npz = os.path.join(path, f"step_{step}.npz")
    if os.path.exists(npz):
        d = np.load(npz)
        out = {k: jnp.asarray(d[k]) for k in d.files if k != "k"}
        out["k"] = int(d["k"])
        return out
    # A single-process restore of a multi-process run's artifacts:
    # everything is addressable here, so stitch the global arrays back
    # together from ALL proc files' shard blocks (round-5 review: the
    # old probe looked for step_{k}.proc0of1.npz, a name no run writes).
    procs = sorted(glob.glob(
        os.path.join(glob.escape(path), f"step_{step}.proc*of*.npz")))
    if procs:
        return _assemble_from_proc_files(procs, template)
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    d = ckpt.restore(os.path.join(os.path.abspath(path), f"step_{step}"))
    d["k"] = int(d["k"])
    return d


def save_state(path: str, state: APDState) -> str:
    tree = dict(X=state.X, V=state.V, lam=state.lam, bk=state.bk,
                key=state.key)
    if state.resk is not None:
        tree["resk"] = state.resk
    return save_dict(path, state.k, tree)


def load_state(path: str, step: Optional[int] = None,
               template: Optional[dict] = None) -> APDState:
    d = load_dict(path, step, template)
    return APDState(d["X"], d["V"], d["lam"], d["bk"], d["key"], d["k"],
                    d.get("resk"))


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            steps.append(int(name.split("_")[1].split(".")[0]))
    return max(steps) if steps else None


def save_result(path: str, res) -> str:
    """Persist a finished solve (primal/dual + records)."""
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, "result.npz")
    np.savez(target, X=np.asarray(res.X), lam=np.asarray(res.lam),
             fxk=np.asarray(res.fxk), converged=res.converged,
             iters=res.iters)
    return target
