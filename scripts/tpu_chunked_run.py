"""Validate the chunked Class-1 driver on the real TPU and time it
against the loop driver (the loop driver pays one relay round trip per
APD iteration; chunked amortizes 8x)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
from otamg.config import APDOptions, InnerSolver
from otamg.opt import solve_class1_chunked
from otamg.ot import load_class1_mat

inner = os.environ.get("OTAMG_INNER", "AMG")
prob = load_class1_mat("/root/reference/Class1/InputData/data1-500.mat")
opts = APDOptions(inner_solver=InnerSolver[inner], solve_dtype="float32")
res = solve_class1_chunked(prob, opts, chunk=8)   # compile + run
t0 = time.time()
res = solve_class1_chunked(prob, opts, chunk=8)   # steady state
print(f"CHUNKED inner={inner} it={int(res.iters)} conv={bool(res.converged)} "
      f"fails={int(res.fail_count)} t={time.time()-t0:.1f}s", flush=True)
