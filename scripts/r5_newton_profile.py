"""Round-5 Newton-solve profile: the fused deep correction vs the full
visit tape, at the 4096-node scale where round 4 measured the W-tape
op-count bound (~104 ms full solve, 34 ms/W-cycle,
``benchmarks/NEWTON_tpu.jsonl``).  Judge's round-5 item 2 target:
newton_full <= 60 ms at 4096 nodes with ct=128-class accuracy.

Timing discipline (CLAUDE.md measurement trap): through the axon relay
``block_until_ready`` can return before the queued chain executed — only
a host FETCH barriers reliably — so each measurement dispatches the jit
N times back-to-back and fetches a scalar once at the end, and the
reported time is the MARGINAL slope between two loop lengths (fixed
relay round trip cancels).

    OTAMG_NEWTON_STAGE={setup,cycle1,full} OTAMG_CYCLE={w,f}
    OTAMG_FUSE_DEEP={0,1} OTAMG_COARSE_TARGET=128 OTAMG_SIZE=2048
        python scripts/r5_newton_profile.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from otamg.amg.hierarchy import amg_solve, setup_hierarchy
from otamg.config import AMGOptions, Cycle
from otamg.hybrid.solver import (_component_info, _transform,
                                 make_hybrid_amg_solver)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "NEWTON_tpu.jsonl")


def fetch_time(fn, args, n):
    """Dispatch ``fn`` n times chained, barrier with ONE host fetch."""
    out = None
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return time.perf_counter() - t0


def marginal(fn, args, n1=3, n2=9):
    fetch_time(fn, args, 1)   # warm/compile
    t1 = fetch_time(fn, args, n1)
    t2 = fetch_time(fn, args, n2)
    return (t2 - t1) / (n2 - n1)


def main():
    stage = os.environ.get("OTAMG_NEWTON_STAGE", "full")
    ct = int(os.environ.get("OTAMG_COARSE_TARGET", "128"))
    m = n = int(os.environ.get("OTAMG_SIZE", "2048"))
    cyc = {"w": Cycle.W, "f": Cycle.F, "v": Cycle.V}[
        os.environ.get("OTAMG_CYCLE", "f")]
    fuse = os.environ.get("OTAMG_FUSE_DEEP", "1") == "1"
    density = 0.05
    platform = jax.default_backend()
    opts = AMGOptions(coarse_target=ct, cycle=cyc, fuse_deep=fuse)
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
        # Accuracy guard: the fused solve must still hit the he_solve
        # refinement target.
        out = run(S, rhs, jax.random.PRNGKey(1))
        res = float(jax.device_get(out.res))
        dt = marginal(run, (S, rhs, jax.random.PRNGKey(1)))
    else:
        maxit1 = (stage == "cycle1")
        res = None

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
                o1 = dataclasses.replace(opts, maxit=1)
                r = amg_solve(lv1, dense, jnp.ones(n + m, lo),
                              jnp.zeros(n + m, lo), o1, deflated=True)
                return r.x
            return (jnp.sum(lv1.g) + jnp.sum(dense[-1].einv)
                    + jnp.sum(dense[-1].evecs))

        dt = marginal(setup_run, (S, jax.random.PRNGKey(1)))

    rec = dict(bench=f"newton_{stage}", coarse_target=ct, size=[m, n],
               cycle=cyc.name, fuse_deep=fuse,
               time_ms=round(dt * 1e3, 3), platform=platform, round=5)
    if res is not None:
        rec["solve_res"] = res
    line = json.dumps(rec)
    print("RESULT " + line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
