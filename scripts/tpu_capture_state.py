"""Capture the exact APD state at it=39 (fp32 path) and save it, so the
it=40 Newton system — where the fp32 AMG cycle diverges on TPU — can be
replayed in isolation."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
from otamg.config import APDOptions, InnerSolver
from otamg.opt import solve_class1
from otamg.ot import load_class1_mat

prob = load_class1_mat("/root/reference/Class1/InputData/data1-500.mat")
opts = APDOptions(inner_solver=InnerSolver.AMG, solve_dtype="float32",
                  maxit=39)
res = solve_class1(prob, opts, return_state=True)
X, V, lam, bk, key = res.state
np.savez(os.environ.get("OTAMG_STATE_OUT", "/tmp/state39.npz"),
         X=np.asarray(X), V=np.asarray(V), lam=np.asarray(lam),
         bk=np.asarray(bk), key=np.asarray(key))
print(f"saved state at it=39: bk={float(bk):.6e}", flush=True)
