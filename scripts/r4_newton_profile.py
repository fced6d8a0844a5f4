"""Decompose newton_solve_amg's ~104 ms (KERNELS_tpu, 4096-node hybrid
solve): hierarchy setup vs one W-cycle vs the full mixed-precision
he_solve, at several coarsest-level targets.

The round-4 kernel runs showed the fine-level ops are VMEM-resident and
nowhere near bandwidth-bound, so the wall time must sit in the setup
chain (strength/MIS/Galerkin/eigh per SsN iteration) and/or the W-tape's
exponential deep-level visits.  This measures which.

    OTAMG_NEWTON_STAGE={setup,cycle1,full} OTAMG_COARSE_TARGET=128 \
        python scripts/r4_newton_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from otamg.amg.hierarchy import amg_solve, setup_hierarchy
from otamg.config import AMGOptions
from otamg.hybrid.solver import (_component_info, _transform,
                                 make_hybrid_amg_solver)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "NEWTON_tpu.jsonl")


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    stage = os.environ.get("OTAMG_NEWTON_STAGE", "full")
    ct = int(os.environ.get("OTAMG_COARSE_TARGET", "128"))
    m = n = int(os.environ.get("OTAMG_SIZE", "2048"))
    density = 0.05
    platform = jax.default_backend()
    opts = AMGOptions(coarse_target=ct)
    solve_dtype = None if platform == "cpu" else "float32"
    lo = jnp.float64 if solve_dtype is None else jnp.dtype(solve_dtype)

    key = jax.random.PRNGKey(0)
    S = (jax.random.uniform(key, (m, n)) < density).astype(jnp.float64)
    p = jnp.ones((m,), jnp.float64)
    q = jnp.ones((n,), jnp.float64)
    tvec = jnp.zeros(n + m, jnp.float64)
    rhs = jax.random.normal(key, (n + m,), jnp.float64)
    bk1, tk = 1e-4, 1.0

    if stage == "full":
        solver = make_hybrid_amg_solver(p, q, opts, solve_dtype=solve_dtype)
        run = jax.jit(lambda S_, r_, k_: solver(S_, tvec, bk1, tk, r_, k_))
        dt = timeit(run, S, rhs, jax.random.PRNGKey(1))
    else:
        maxit1 = (stage == "cycle1")

        @jax.jit
        def setup_run(S_, k_):
            E, g, kdiag, _, q0 = _transform(S_, tvec, bk1, tk,
                                            jnp.zeros_like(tvec), p, q)
            labels, nsp, ncomp, last = _component_info(E, kdiag)
            qp2_t = jnp.concatenate([q * q, p * p])
            gk = (bk1 * qp2_t + kdiag / tk).astype(lo)
            lv1, dense = setup_hierarchy(E.astype(lo), g.astype(lo),
                                         jnp.asarray(1.0 / tk, lo),
                                         labels, nsp, opts, k_, gk=gk)
            if maxit1:
                import dataclasses
                o1 = dataclasses.replace(opts, maxit=1)
                r = amg_solve(lv1, dense, jnp.ones(n + m, lo),
                              jnp.zeros(n + m, lo), o1, deflated=True)
                return r.x
            return (jnp.sum(lv1.g) + jnp.sum(dense[-1].einv)
                    + jnp.sum(dense[-1].evecs))

        dt = timeit(setup_run, S, jax.random.PRNGKey(1))

    rec = dict(bench=f"newton_{stage}", coarse_target=ct, size=[m, n],
               time_ms=round(dt * 1e3, 3), platform=platform)
    line = json.dumps(rec)
    print("RESULT " + line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
