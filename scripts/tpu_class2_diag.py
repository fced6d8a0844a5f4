"""Diagnose the Class-2 TPU non-convergence (round-3 bench finding: all
inner solvers fail to reach KKT 1e-6 on the chip while CPU converges at
it=53 in both precisions).

    python scripts/tpu_class2_diag.py [amg|aug_pcg] [f64|fp32] [maxit]

Prints the per-iteration KKT residuals (verbose driver) so the divergence
point and failing residual component are visible.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from otamg.config import AMGOptions, APDOptions, InnerSolver
from otamg.opt.apd2 import solve_class2
from otamg.ot import load_class2_mat

inner = (sys.argv[1] if len(sys.argv) > 1 else "amg").upper()
prec = sys.argv[2] if len(sys.argv) > 2 else "fp32"
maxit = int(sys.argv[3]) if len(sys.argv) > 3 else 100
tol1 = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-10
seed = int(sys.argv[5]) if len(sys.argv) > 5 else 0

solve_dtype = "float32" if prec == "fp32" else None
prob = load_class2_mat("/root/reference/Class2/InputData/data4-500.mat",
                       dtype=jnp.float64)
opts = APDOptions(inner_solver=InnerSolver[inner], ssn_tol1=tol1,
                  solve_dtype=solve_dtype, maxit=maxit,
                  amg=AMGOptions(maxit=40, smoth=10), seed=seed,
                  feas_polish=bool(int(os.environ.get("C2_POLISH", "0"))))
res = solve_class2(prob, opts, verbose=True)
print(f"FINAL converged={res.converged} iters={res.iters} "
      f"fails={res.fail_count} platform={jax.default_backend()} "
      f"inner={inner} prec={prec}")

dump = os.environ.get("C2_DUMP")
if dump:
    import numpy as np
    np.savez(dump, X=np.asarray(res.X), y=np.asarray(res.y),
             z=np.asarray(res.z), lam=np.asarray(res.lam))
    print("dumped state to", dump)
