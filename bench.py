"""Benchmark harness: Class-1 (+ Class-2) OT solves to the reference KKT
tolerance on the available accelerator.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...,
   "class2": {...}}

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against a fixed nominal budget for this config (60 s for the 500x500
demo-equivalent on one chip — the reference's own `toc` on the authors'
CPU is unknown; >1.0 means faster than the nominal budget).

Resilience: the axon TPU relay's worker occasionally crashes/restarts
mid-run ("TPU worker process crashed or restarted"); each attempt runs in
a fresh subprocess, every ladder entry is retried once before falling to
the next inner solver (CLAUDE.md: transient faults usually do not
reproduce), and a hung attempt is bounded by a subprocess timeout.
"""

import json
import os
import subprocess
import sys
import time

NOMINAL_BUDGET_S = 60.0
RETRY_WAIT_S = 120.0  # give a crashed TPU worker time to come back
ATTEMPT_TIMEOUT_S = 5400
# Ladders: the metric is time-to-KKT-1e-6 — solver-agnostic — so if one
# inner solver's program faults the axon worker twice, fall back to the
# next.  The flagship AMG entry is retried before any demotion.
LADDER_C1 = ["AMG", "AMG", "PCG", "PCG", "AUG_PCG"]
LADDER_C2 = ["AMG", "AMG", "AUG_PCG"]


def _bench_once(cls: str, inner: str):
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: helps CPU/local backends (the axon
    # relay recompiles regardless — CLAUDE.md).
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    platform = jax.default_backend()
    # Precision architecture (SURVEY.md hard part (f)): the APD state and
    # all O(mn) bandwidth-bound work run in f64 (emulated on TPU — cheap,
    # it's elementwise/GEMV); the FLOP-heavy AMG hierarchy runs in fp32 on
    # the MXU with exact kernel deflation + f64 iterative refinement.
    jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64
    solve_dtype = None if platform == "cpu" else "float32"

    from otamg.config import APDOptions, InnerSolver

    # Driver: the loop driver pays one relay round trip per APD iteration
    # (~0.5 s each over the axon tunnel); the chunked driver amortizes 8
    # iterations per dispatch.  Both are trajectory-identical (tested).
    driver = os.environ.get("OTAMG_BENCH_DRIVER", "loop")

    if cls == "class1":
        from otamg.opt import solve_class1, solve_class1_chunked
        from otamg.ot import load_class1_mat as load, random_class1 as rnd

        solve = (solve_class1 if driver == "loop"
                 else lambda p, o: solve_class1_chunked(p, o, chunk=8))
        path = "/root/reference/Class1/InputData/data1-500.mat"
        opts = APDOptions(inner_solver=InnerSolver[inner],
                          solve_dtype=solve_dtype)
    else:
        from otamg.opt.apd2 import solve_class2, solve_class2_chunked
        from otamg.ot import load_class2_mat as load, random_class2 as rnd

        solve = (solve_class2 if driver == "loop"
                 else lambda p, o: solve_class2_chunked(p, o, chunk=8))
        path = "/root/reference/Class2/InputData/data4-500.mat"
        opts = APDOptions(inner_solver=InnerSolver[inner],
                          ssn_tol1=1e-10, solve_dtype=solve_dtype)

    try:
        prob = load(path, dtype=dtype)
    except Exception:
        prob = rnd(jax.random.PRNGKey(0), 500, 500, dtype=dtype)

    # Warm-up run compiles everything; timed run measures steady state.
    res = solve(prob, opts)
    t0 = time.time()
    res = solve(prob, opts)
    elapsed = time.time() - t0

    ok = bool(res.converged)
    value = elapsed if ok else float("inf")
    out = {
        "metric": f"{cls}_500_time_to_kkt1e-6",
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(NOMINAL_BUDGET_S / value, 3) if ok else 0.0,
        "converged": ok,
        "iters": int(res.iters),
        "fails": int(res.fail_count),
        "platform": platform,
        "inner": inner,
        "driver": driver,
    }
    print("BENCH_RESULT " + json.dumps(out), flush=True)
    return 0 if ok else 1


def _run_ladder(cls: str, ladder):
    """Run one problem class's attempt ladder; return (result_dict|None,
    errors).  Each entry is a fresh subprocess so a TPU worker crash in one
    attempt cannot poison the next."""
    errors = []
    for attempt, inner in enumerate(ladder, 1):
        env = dict(os.environ, OTAMG_BENCH_CHILD=f"{cls}:{inner}")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=ATTEMPT_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            errors.append(f"{inner}: timeout after {ATTEMPT_TIMEOUT_S}s")
            print(f"bench[{cls}] attempt {attempt}/{len(ladder)} "
                  f"(inner={inner}) timed out", file=sys.stderr, flush=True)
            time.sleep(RETRY_WAIT_S)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_RESULT "):
                result = json.loads(line[len("BENCH_RESULT "):])
                if attempt > 1:
                    print(f"bench[{cls}]: NOTE result uses attempt "
                          f"{attempt} (inner={inner}); earlier attempts "
                          f"failed: {' | '.join(errors)[-300:]}",
                          file=sys.stderr, flush=True)
                if result.get("converged"):
                    return result, errors
                errors.append(f"{inner}: ran but converged=false")
                break
        else:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            errors.append(f"{inner}: rc={proc.returncode} "
                          + " | ".join(tail)[-300:])
            print(f"bench[{cls}] attempt {attempt}/{len(ladder)} "
                  f"(inner={inner}) failed (rc={proc.returncode}): "
                  f"{' | '.join(tail)}", file=sys.stderr, flush=True)
        if attempt < len(ladder):
            time.sleep(RETRY_WAIT_S)
    return None, errors


def main():
    if os.environ.get("OTAMG_BENCH_CHILD"):
        cls, inner = os.environ["OTAMG_BENCH_CHILD"].split(":")
        return _bench_once(cls, inner)

    out, errs1 = _run_ladder("class1", LADDER_C1)
    if out is None:
        out = {
            "metric": "class1_500_time_to_kkt1e-6",
            "value": float("inf"), "unit": "s", "vs_baseline": 0.0,
            "converged": False, "error": " | ".join(errs1)[-500:],
        }
    out2, errs2 = _run_ladder("class2", LADDER_C2)
    out["class2"] = out2 if out2 is not None else {
        "converged": False, "error": " | ".join(errs2)[-300:]}

    print(json.dumps(out))
    return 0 if out.get("converged") else 1


if __name__ == "__main__":
    sys.exit(main())
