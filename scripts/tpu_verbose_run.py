"""Full Class-1 AMG solve on TPU with per-iteration prints, to localize
the worker kernel fault's trigger iteration."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
from otamg.config import APDOptions, InnerSolver
from otamg.opt import solve_class1
from otamg.ot import load_class1_mat

maxit = int(os.environ.get("OTAMG_MAXIT", "100"))
prob = load_class1_mat("/root/reference/Class1/InputData/data1-500.mat")
opts = APDOptions(inner_solver=InnerSolver.AMG, solve_dtype="float32",
                  maxit=maxit)
t0 = time.time()
res = solve_class1(prob, opts, verbose=True)
print(f"DONE it={int(res.iters)} conv={bool(res.converged)} "
      f"fails={int(res.fail_count)} t={time.time()-t0:.1f}s", flush=True)
