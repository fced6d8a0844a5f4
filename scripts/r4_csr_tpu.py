"""On-chip validation of the Pallas-ELL production path: the generic AMG
with a CSR fine level (CSRLevel.matvec -> ell_spmv) must solve a sparse
SPD system on the real TPU, and the kernel must agree with the XLA
gather oracle.  Records one line to benchmarks/RESULTS_tpu.jsonl.
"""
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from otamg.amg.hierarchy import amg_solve, csr_matvec, setup_hierarchy_generic
from otamg.config import AMGOptions
from otamg.sparse import CSR
from otamg.sparse.kernels import ell_spmv, ell_spmv_xla

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "RESULTS_tpu.jsonl")


def main():
    N = int(os.environ.get("OTAMG_CSR_N", "8192"))
    rng = np.random.default_rng(0)
    # SPD sparse matrix: diagonally dominant with random off-diagonals.
    row_cap = 32
    cols = rng.integers(0, N, size=(N, row_cap - 1))
    vals = -np.abs(rng.standard_normal((N, row_cap - 1))).astype(np.float32)
    diag = np.abs(vals).sum(axis=1) + 1.0
    ell_cols = np.concatenate([np.arange(N)[:, None], cols], axis=1)
    ell_vals = np.concatenate([diag[:, None], vals], axis=1)
    indptr = jnp.asarray(np.arange(N + 1) * row_cap, jnp.int32)
    csr = CSR(shape=(N, N), indptr=indptr,
              ell_cols=jnp.asarray(ell_cols, jnp.int32),
              ell_vals=jnp.asarray(ell_vals, jnp.float32))

    x = jnp.asarray(rng.standard_normal(N), jnp.float32)

    # 1. kernel vs oracle on chip
    y_pallas = jax.jit(lambda c, v, xx: ell_spmv(c, v, xx))(
        csr.ell_cols, csr.ell_vals, x)
    y_xla = jax.jit(lambda c, v, xx: ell_spmv_xla(c, v, xx))(
        csr.ell_cols, csr.ell_vals, x)
    rel = float(jnp.linalg.norm(y_pallas - y_xla)
                / jnp.linalg.norm(y_xla))

    # 2. generic AMG solve with the CSR fine level (production consumer)
    opts = AMGOptions(bigph=False, retol=1e-5, maxit=40,
                      coarse_target=256)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)

    @jax.jit
    def solve(b_):
        lv0, rest = setup_hierarchy_generic(csr, opts,
                                            jax.random.PRNGKey(0))
        r = amg_solve(lv0, rest, b_, jnp.zeros_like(b_), opts)
        return r.x, r.iters, r.rel_res, csr_matvec(lv0, r.x)

    t0 = time.time()
    xs, iters, rel_res, Ax = solve(b)
    jax.block_until_ready(xs)
    cold = time.time() - t0
    t0 = time.time()
    xs, iters, rel_res, Ax = solve(b)
    jax.block_until_ready(xs)
    warm = time.time() - t0
    true_rel = float(jnp.linalg.norm(Ax - b) / jnp.linalg.norm(b))

    rec = dict(ts=datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
               bench="csr_amg_pallas_consumer", N=N, row_cap=row_cap,
               platform=jax.default_backend(), round=4,
               kernel_vs_oracle_rel=rel, amg_iters=int(iters),
               amg_rel_res=float(rel_res), true_rel=true_rel,
               cold_s=round(cold, 3), warm_s=round(warm, 3))
    line = json.dumps(rec)
    print("RESULT " + line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")
    assert rel < 1e-5, rel


if __name__ == "__main__":
    main()
