"""Per-step timing over a SEQUENCE of APD dispatches: distinguishes
chip-slowness (flat per-step cost) from relay queue backpressure
(per-step cost inflating as consecutive dispatches pile up) from
trajectory cost growth (late iterations doing more cycles).

Runs the flagship step for k=1..N with per-step fetch (sync mode) or
with the production pipelined lag (async mode).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from otamg.config import APDOptions, InnerSolver
from otamg.opt.admm import warmup_class1
from otamg.opt.apd import make_class1_step
from otamg.ot import load_class1_mat
from otamg.ot import operators as op


def main():
    N = int(os.environ.get("OTAMG_SEQ_N", "30"))
    opts = APDOptions(inner_solver=InnerSolver.AMG, solve_dtype="float32"
                      if jax.default_backend() != "cpu" else None)
    prob = load_class1_mat("/root/reference/Class1/InputData/data1-500.mat")
    dtype = prob.C.dtype
    hi = jnp.float64

    ws = jax.jit(warmup_class1, static_argnums=1)(prob, opts.warmup.maxit)

    @jax.jit
    def _init(pr, X, lam):
        lam = lam.astype(hi)
        kx0, kl0 = op.kkt_class1(X, lam, pr.C, pr.b, pr.p, pr.q, pr.gama)
        return lam, kx0, kl0

    lam, kx0, kl0 = _init(prob, ws.X, ws.lam)
    step = make_class1_step(prob, opts)
    X, V = ws.X, ws.X
    bk = jnp.asarray(1.0, dtype)
    key = jax.random.PRNGKey(0)
    kkt_norm0 = jnp.stack([kx0, kl0]).astype(dtype)
    resk = jnp.maximum(kx0, kl0).astype(dtype)

    # warm-compile with k=1
    out = step(jnp.asarray(1, jnp.int32), X, V, lam, bk, key, resk,
               kkt_norm0, prob)
    jax.device_get(out[5].kkt_x)

    # fresh state, timed sequence with PER-STEP sync
    X, V = ws.X, ws.X
    bk = jnp.asarray(1.0, dtype)
    key = jax.random.PRNGKey(0)
    resk = jnp.maximum(kx0, kl0).astype(dtype)
    times = []
    for k in range(1, N + 1):
        t0 = time.perf_counter()
        X, V, lam2, bk, key, mtr = step(jnp.asarray(k, jnp.int32), X, V,
                                        lam, bk, key, resk, kkt_norm0,
                                        prob)
        lam = lam2
        if os.environ.get("OTAMG_SEQ_FULL_FETCH"):
            m = jax.device_get(mtr)   # full 12-leaf tuple (as record())
            kx = float(m.kkt_x)
        else:
            kx = float(jax.device_get(mtr.kkt_x))
        resk = jnp.maximum(mtr.kkt_x, mtr.kkt_l).astype(dtype)
        times.append(time.perf_counter() - t0)
        print(f"k={k:3d} dt={times[-1]*1e3:7.1f} ms ssn={int(mtr.ssn_it)} "
              f"isum={int(mtr.it_sum)} kkt_x={kx:.3e}", flush=True)
    print(f"total={sum(times):.2f}s first5={sum(times[:5]):.2f}s "
          f"last5={sum(times[-5:]):.2f}s", flush=True)


if __name__ == "__main__":
    main()
