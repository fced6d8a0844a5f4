"""Per-collective HLO inventory + communication-volume model for the
sharded Class-1 step (round-4 verdict weak item 3: no real multi-chip
hardware is reachable, so the scaling claim is grounded in (a) the
EXACT collectives XLA inserts for the production sharding layout —
enumerated from the compiled HLO — and (b) an analytic bytes-per-
iteration model vs the v5e ICI budget).

Run (CPU, 8 virtual devices):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/r5_comm_model.py [m] [n]

Appends one JSON line to benchmarks/SCALING_comm.jsonl.
"""
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "SCALING_comm.jsonl")

_DT_BYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "pred": 1,
             "bf16": 2, "f16": 2, "s64": 8, "u64": 8, "s8": 1, "u8": 1}


def _shape_bytes(sig: str) -> int:
    """Bytes of an HLO result signature like 'f64[1048,16]' or a tuple
    '(f64[16], f32[8,4])'."""
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", sig):
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


def collective_inventory(hlo: str):
    """Count collectives and their payload bytes in an HLO module."""
    inv = collections.defaultdict(lambda: [0, 0])
    pat = re.compile(
        r"=\s*((?:\([^)]*\)|[\w\[\],]+))\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)\(", re.M)
    for sig, op in pat.findall(hlo):
        inv[op][0] += 1
        inv[op][1] += _shape_bytes(sig)
    return {k: {"sites": v[0], "bytes_per_exec_site": v[1]}
            for k, v in inv.items()}


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    ndev = len(jax.devices())

    from otamg.config import AMGOptions, APDOptions, Cycle, InnerSolver
    from otamg.dist import make_mesh, plan_sharding, shard_class1
    from otamg.opt.apd import make_class1_step
    from otamg.ot import random_class1

    prob = random_class1(jax.random.PRNGKey(0), m, n)
    mesh = make_mesh(ndev)
    sprob = shard_class1(prob, mesh)
    opts = APDOptions(inner_solver=InnerSolver.AMG,
                      amg=AMGOptions(cycle=Cycle.F, fuse_deep=True))
    step = make_class1_step(sprob, opts)

    X = jax.device_put(jnp.zeros((m, n), jnp.float64),
                       plan_sharding(mesh))
    lam = jnp.zeros(n + m, jnp.float64)
    args = (jnp.asarray(1, jnp.int32), X, X, lam,
            jnp.asarray(1.0, jnp.float64), jax.random.PRNGKey(1),
            jnp.asarray(10.0, jnp.float64),
            jnp.asarray([1.0, 1.0], jnp.float64), sprob)
    hlo = jax.jit(step).lower(*args).compile().as_text()
    inv = collective_inventory(hlo)

    # Analytic per-iteration model for the replicated-KKT layout: the
    # only cross-shard data motion is the psum closing each row-sharded
    # O(mn) operator application into the replicated (n+m) dual (plus
    # scalar reduction psums).  See SCALING.md for the derivation.
    per_apply_A = (n + m) * 8
    rec = {
        "m": m, "n": n, "devices": ndev,
        "collectives": inv,
        "model": {
            "bytes_per_apply_A_psum": per_apply_A,
            "note": "per outer iteration ~ (2 + 3*ssn) psums of the "
                    "(n+m) dual + O(10) scalar psums; the Newton solve "
                    "is replicated below level 0 by design (zero "
                    "collectives in the AMG cycle)",
        },
    }
    line = json.dumps(rec)
    print(line)
    with open(OUT, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
