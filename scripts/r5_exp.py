"""Round-5 TPU experiment child: ONE experiment per process (a crashed
axon worker cannot poison the next attempt), cold + up-to-3 warm solves
timed, one JSON line appended to benchmarks/RESULTS_tpu.jsonl.

Experiments (VERDICT round-5 items 2/3/4):
  c1 / c2              Class 500^2 fixtures, bench config (F, fuse_deep)
  c1_1024 / c2_1024    1024^2 warm re-measure under fuse_deep
  c1_2048 / c2_2048    2048^2 warm (c2: polish allowed, tail watched)
  c2_2048_nopolish     item 3: the solver itself must close kkt_l
  c2_2048_tail64       item 3 remedy: f64 hierarchy for the tail (the
                       solver switches to solve_dtype=None behavior via
                       tail opts — see OTAMG_TAIL_* envs)
  c1_4096 / c2_4096    item 4: the 16.7M-variable frontier, warm

Env knobs: OTAMG_FUSE_DEEP (default 1), OTAMG_WARM_SAMPLES (default 3,
500^2 only; larger sizes take 1), OTAMG_MAXIT.
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
    kw.setdefault("ts",
                  datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"))
    kw.setdefault("platform", jax.default_backend())
    kw.setdefault("round", 5)
    line = json.dumps(kw)
    print("RESULT " + line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def run(name):
    solve_dtype = None if jax.default_backend() == "cpu" else "float32"
    fuse = os.environ.get("OTAMG_FUSE_DEEP", "1") == "1"
    size = 500
    for s in (1024, 2048, 4096):
        if str(s) in name:
            size = s
    t_setup = time.time()
    if name.startswith("c1"):
        from otamg.opt import solve_class1 as solve
        from otamg.ot import load_class1_mat, random_class1

        if size == 500:
            prob = load_class1_mat(
                "/root/reference/Class1/InputData/data1-500.mat")
        else:
            prob = random_class1(jax.random.PRNGKey(0), size, size)
        amg = AMGOptions(cycle=Cycle.F, fuse_deep=fuse)
        opts = APDOptions(
            inner_solver=InnerSolver.AMG,
            maxit=int(os.environ.get("OTAMG_MAXIT", 100)),
            solve_dtype=solve_dtype, amg=amg)
    else:
        from otamg.opt.apd2 import solve_class2 as solve
        from otamg.ot import load_class2_mat, random_class2

        if size == 500:
            prob = load_class2_mat(
                "/root/reference/Class2/InputData/data4-500.mat")
        else:
            prob = random_class2(jax.random.PRNGKey(1), size, size,
                                 mu_frac=0.6)
        opts = APDOptions(
            inner_solver=InnerSolver.AMG, ssn_tol1=1e-10,
            maxit=int(os.environ.get("OTAMG_MAXIT", 100)),
            solve_dtype=solve_dtype,
            amg=AMGOptions(maxit=40, smoth=10, cycle=Cycle.F,
                           fuse_deep=fuse),
            feas_polish=("nopolish" not in name))

    t0 = time.time()
    res = solve(prob, opts)
    cold_s = time.time() - t0
    out = dict(bench=f"r5_{name}", size=size, fuse_deep=fuse,
               cold_s=round(cold_s, 3),
               converged=bool(res.converged), iters=int(res.iters),
               fails=int(res.fail_count),
               setup_s=round(t0 - t_setup, 3))
    if hasattr(res, "polished"):
        out["polished"] = bool(res.polished)
    nwarm = int(os.environ.get("OTAMG_WARM_SAMPLES",
                               "3" if size == 500 else "1"))
    if res.converged:
        warm, warm_iters = [], None
        for _ in range(nwarm):
            time.sleep(5)
            t0 = time.time()
            res2 = solve(prob, opts)
            if not res2.converged:
                break
            warm.append(round(time.time() - t0, 3))
            warm_iters = int(res2.iters)  # last CONVERGED sample only
        if warm:
            out["warm_samples"] = warm
            out["warm_s"] = min(warm)
            out["warm_median_s"] = sorted(warm)[len(warm) // 2]
            out["warm_iters"] = warm_iters
    # End-to-end roofline accounting (same model as bench.py).
    if res.converged:
        try:
            from otamg.amg.hierarchy import capacity_schedule
            from otamg.diag.roofline import (roofline_report,
                                             solve_bytes_model)

            out["ssn_total"] = int(res.ssn_itnum.sum())
            out["cycles_total"] = int(res.inner_total)
            amg = opts.amg
            caps = capacity_schedule(size, 2 * size, amg)
            gamma = {Cycle.V: 1, Cycle.W: 2, Cycle.F: 3}[amg.cycle]
            model_b = solve_bytes_model(
                size, size, int(res.iters), out["ssn_total"],
                out["cycles_total"], amg.smoth, gamma, caps, fuse)
            wall = out.get("warm_s") or cold_s
            # A cold basis includes remote-compile minutes — label it so
            # the row can't be read as a solve-efficiency claim.
            out["roofline_basis"] = "warm" if out.get("warm_s") else "cold"
            out.update(roofline_report(model_b, wall))
        except Exception as exc:
            out["roofline_error"] = repr(exc)[:200]
    record(**out)
    return 0 if res.converged else 1


if __name__ == "__main__":
    sys.exit(run(sys.argv[1]))
