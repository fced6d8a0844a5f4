"""Compile-time budget artifact (round-3 verdict item 8): per-program
cold-vs-warm breakdown of the flagship Class-1 500^2 loop-driver solve.

The loop driver runs exactly three compiled programs — the A-ADMM warmup,
the prologue (_init: KKT0 + objective), and the APD outer step — so the
cold-start cost decomposes into three remote-compile segments plus the
(cached) per-iteration dispatches.  Appends one line per segment to
benchmarks/COMPILE_tpu.jsonl.

    OTAMG_COARSE_TARGET=400 python scripts/r4_compile_audit.py
"""
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from otamg.config import AMGOptions, APDOptions, InnerSolver
from otamg.opt.admm import warmup_class1
from otamg.opt.apd import make_class1_step
from otamg.ot import load_class1_mat
from otamg.ot import operators as op

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "COMPILE_tpu.jsonl")


def emit(seg, dt, **kw):
    rec = dict(ts=datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
               segment=seg, seconds=round(dt, 3),
               platform=jax.default_backend(), round=4, **kw)
    line = json.dumps(rec)
    print("COMPILE " + line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    ct = os.environ.get("OTAMG_COARSE_TARGET")
    amg = AMGOptions() if ct is None else AMGOptions(coarse_target=int(ct))
    opts = APDOptions(inner_solver=InnerSolver.AMG, solve_dtype="float32"
                      if jax.default_backend() != "cpu" else None, amg=amg)
    prob = load_class1_mat("/root/reference/Class1/InputData/data1-500.mat")
    dtype = prob.C.dtype
    hi = jnp.float64
    kw = dict(coarse_target=int(ct)) if ct else {}

    t0 = time.time()
    ws = jax.jit(warmup_class1, static_argnums=1)(prob, opts.warmup.maxit)
    jax.block_until_ready(ws.X)
    emit("warmup_cold", time.time() - t0, **kw)

    @jax.jit
    def _init(pr, X, lam):
        lam = lam.astype(hi)
        kx0, kl0 = op.kkt_class1(X, lam, pr.C, pr.b, pr.p, pr.q, pr.gama)
        return kx0, kl0

    t0 = time.time()
    kx0, kl0 = jax.block_until_ready(_init(prob, ws.X, ws.lam))
    emit("init_cold", time.time() - t0, **kw)

    step = make_class1_step(prob, opts)
    X, V, lam = ws.X, ws.X, ws.lam.astype(hi)
    bk = jnp.asarray(1.0, dtype)
    key = jax.random.PRNGKey(0)
    kkt_norm0 = jnp.stack([kx0, kl0]).astype(dtype)
    resk = jnp.maximum(kx0, kl0).astype(dtype)

    t0 = time.time()
    out = step(jnp.asarray(1, jnp.int32), X, V, lam, bk, key, resk,
               kkt_norm0, prob)
    jax.block_until_ready(out[0])
    emit("step_cold", time.time() - t0, **kw)

    t0 = time.time()
    out = step(jnp.asarray(2, jnp.int32), *out[:5], resk, kkt_norm0, prob)
    jax.block_until_ready(out[0])
    emit("step_warm", time.time() - t0, **kw)


if __name__ == "__main__":
    main()
