"""Round-4 TPU experiment child: ONE experiment per process (the axon
relay's worker can crash and poison a process — CLAUDE.md), cold + warm
timed, one JSON line appended to benchmarks/RESULTS_tpu.jsonl.

Experiments (VERDICT.md round-3 items 3/4/5/7):
  c1_w           control: Class-1 500^2 fixture, W-cycle, loop driver
  c1_v           Class-1 500^2, V-cycle, loop driver
  c1_fused_smoke Class-1 500^2 fused driver, maxit=6 (fault probe first)
  c1_fused       Class-1 500^2 fused driver, full
  c1_chunked     Class-1 500^2 chunked driver (chunk=8) re-measure
  c2_nopolish    Class-2 500^2 WITHOUT the feas_polish safeguard
  c2_1024        Class-2 1024^2 (generated; new scale)
  c1_1024_v      Class-1 1024^2 V-cycle (vs round-3 W at 104.8 s)
"""
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

from otamg.config import AMGOptions, APDOptions, Cycle, InnerSolver

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "RESULTS_tpu.jsonl")


def record(**kw):
    kw.setdefault("ts", datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"))
    kw.setdefault("platform", jax.default_backend())
    kw.setdefault("round", 4)
    line = json.dumps(kw)
    print("RESULT " + line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def run(name):
    solve_dtype = None if jax.default_backend() == "cpu" else "float32"
    t_setup = time.time()
    if name.startswith("c1"):
        from otamg.opt import (solve_class1, solve_class1_chunked,
                               solve_class1_fused)
        from otamg.ot import load_class1_mat, random_class1

        if "1024" in name:
            prob = random_class1(jax.random.PRNGKey(0), 1024, 1024)
        else:
            prob = load_class1_mat(
                "/root/reference/Class1/InputData/data1-500.mat")
        maxit = 6 if name.endswith("smoke") else 100
        cycle = Cycle.V if name.endswith("_v") else Cycle.W
        ct = os.environ.get("OTAMG_COARSE_TARGET")
        amg = (AMGOptions(cycle=cycle) if ct is None
               else AMGOptions(cycle=cycle, coarse_target=int(ct)))
        opts = APDOptions(inner_solver=InnerSolver.AMG, maxit=maxit,
                          solve_dtype=solve_dtype, amg=amg)
        if "fused" in name:
            solve = solve_class1_fused
        elif "chunked" in name:
            solve = lambda p, o: solve_class1_chunked(p, o, chunk=8)
        else:
            solve = solve_class1
    else:
        from otamg.opt.apd2 import solve_class2
        from otamg.ot import load_class2_mat, random_class2

        if "1024" in name:
            prob = random_class2(jax.random.PRNGKey(1), 1024, 1024,
                                 mu_frac=0.6)
        else:
            prob = load_class2_mat(
                "/root/reference/Class2/InputData/data4-500.mat")
        opts = APDOptions(inner_solver=InnerSolver.AMG, ssn_tol1=1e-10,
                          solve_dtype=solve_dtype,
                          amg=AMGOptions(maxit=40, smoth=10),
                          feas_polish=("nopolish" not in name))
        solve = solve_class2

    t0 = time.time()
    res = solve(prob, opts)
    cold_s = time.time() - t0
    out = dict(bench=f"r4_{name}", cold_s=round(cold_s, 3),
               converged=bool(res.converged), iters=int(res.iters),
               fails=int(res.fail_count),
               setup_s=round(t0 - t_setup, 3))
    if os.environ.get("OTAMG_COARSE_TARGET"):
        out["coarse_target"] = int(os.environ["OTAMG_COARSE_TARGET"])
    # Warm re-run when the cold one converged (program caching makes
    # warm re-solves cheap even at 1024^2).
    if res.converged and not name.endswith("smoke"):
        t0 = time.time()
        res2 = solve(prob, opts)
        out["warm_s"] = round(time.time() - t0, 3)
        out["warm_iters"] = int(res2.iters)
        out["warm_converged"] = bool(res2.converged)
    record(**out)
    return 0 if res.converged or name.endswith("smoke") else 1


if __name__ == "__main__":
    sys.exit(run(sys.argv[1]))
