"""Benchmark harness: Class-1 (+ Class-2) OT solves to the reference KKT
tolerance on the available accelerator.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...,
   "class2": {...}}

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against a fixed nominal budget for this config (60 s for the 500x500
demo-equivalent on one chip — the reference's own `toc` on the authors'
CPU is unknown; >1.0 means faster than the nominal budget).

Budget discipline (round-3 redesign): remote axon compiles take minutes
with sporadic ~250 s stalls (CLAUDE.md), so the harness runs under a HARD
total wall-clock deadline (default 55 min, env OTAMG_BENCH_DEADLINE_S).
Per-attempt subprocess timeouts are derived from the remaining budget, a
finished measurement is persisted to benchmarks/BENCH_partial.json the
moment it lands, and a SIGALRM guard guarantees the final JSON line is
printed before the deadline even if an attempt wedges.  Each child does ONE
timed solve (cold, compile included) and only re-times a warm solve when
its own remaining budget allows — so a slow compile can no longer cost two
full solves.

Resilience: the axon TPU relay's worker occasionally crashes/restarts
mid-run ("TPU worker process crashed or restarted"); each attempt runs in
a fresh subprocess so a crash cannot poison the next, and the flagship AMG
entry is retried once before demoting to the next inner solver.
"""

import json
import os
import signal
import subprocess
import sys
import time

NOMINAL_BUDGET_S = 60.0
DEADLINE_S = float(os.environ.get("OTAMG_BENCH_DEADLINE_S", 3300))
RETRY_WAIT_S = 60.0       # give a crashed TPU worker time to come back
FINAL_RESERVE_S = 20.0    # held back for the final JSON print
MIN_ATTEMPT_S = 240.0     # don't launch an attempt with less than this
# Ladders: the metric is time-to-KKT-1e-6 — solver-agnostic — so if one
# inner solver's program faults the axon worker twice, fall back to the
# next.  The flagship AMG entry is retried before any demotion.
LADDER_C1 = ["AMG", "AMG", "PCG"]
LADDER_C2 = ["AMG", "AMG", "AUG_PCG"]
# Class 1 may use at most this fraction of the total budget before class 2
# gets its turn (a converged class-1 result short-circuits the ladder, so
# this only binds when class 1 is failing repeatedly).
C1_BUDGET_FRAC = 0.55

PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "BENCH_partial.json")

T0 = time.time()


def _remaining() -> float:
    return DEADLINE_S - (time.time() - T0)


def _bench_once(cls: str, inner: str):
    import jax
    import jax.numpy as jnp

    child_deadline = float(os.environ.get("OTAMG_BENCH_CHILD_DEADLINE", 0))

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

    from otamg.config import AMGOptions, APDOptions, Cycle, InnerSolver

    # Driver: the loop driver pays one relay round trip per APD iteration
    # (~0.34 s each over the axon tunnel) but its many small cached
    # programs schedule better than one monolithic chunked program
    # (round-2 measurement: chunk=8 was 2.6x slower on chip).
    driver = os.environ.get("OTAMG_BENCH_DRIVER", "loop")

    # Fused deep correction (round 5): one precomputed matrix per Newton
    # solve, one GEMV per cycle — replaces the op-count-bound deep visit
    # chain.  Trajectory-pinned (it=58/53 with the flag on).
    fuse_deep = os.environ.get("OTAMG_BENCH_FUSE_DEEP", "1") == "1"

    if cls == "class1":
        from otamg.opt import solve_class1, solve_class1_chunked
        from otamg.ot import load_class1_mat as load, random_class1 as rnd

        solve = (solve_class1 if driver == "loop"
                 else lambda p, o: solve_class1_chunked(p, o, chunk=8))
        path = "/root/reference/Class1/InputData/data1-500.mat"
        # F-cycle: identical trajectories to the reference W at every
        # tested size/precision (it=58 here) with a linear-in-depth
        # visit tape — measured 12% faster at 500^2 and 1.9x at 1024^2
        # on the chip (round 4).
        amg = AMGOptions(cycle=Cycle.F, fuse_deep=fuse_deep)
        opts = APDOptions(inner_solver=InnerSolver[inner],
                          solve_dtype=solve_dtype, amg=amg)
    else:
        from otamg.opt.apd2 import solve_class2, solve_class2_chunked
        from otamg.ot import load_class2_mat as load, random_class2 as rnd

        solve = (solve_class2 if driver == "loop"
                 else lambda p, o: solve_class2_chunked(p, o, chunk=8))
        path = "/root/reference/Class2/InputData/data4-500.mat"
        # Class-2 AMG budget maxit=40/smoth=10 (Class2/APD_SsN_Class2.m:
        # 80-81) — omitting it ran the weaker Class-1 budget, which the
        # fp32 TPU path cannot absorb (round-3 bench: converged=false).
        amg = AMGOptions(maxit=40, smoth=10, cycle=Cycle.F,
                         fuse_deep=fuse_deep)
        # feas_polish OFF by default since round 5: the fused-deep
        # trajectory converges unpolished ON THE CHIP at 500^2 (it=53,
        # matching CPU f64 exactly), 2048^2 and 4096^2 — the round-4
        # tail-stall is gone.  OTAMG_BENCH_POLISH=1 re-arms the
        # safeguard.
        opts = APDOptions(
            inner_solver=InnerSolver[inner], ssn_tol1=1e-10,
            solve_dtype=solve_dtype, amg=amg,
            feas_polish=os.environ.get("OTAMG_BENCH_POLISH", "0") == "1")

    try:
        prob = load(path, dtype=dtype)
    except Exception:
        prob = rnd(jax.random.PRNGKey(0), 500, 500, dtype=dtype)

    # Cold run: compile + solve, always timed so we have SOME number even
    # if the budget ends here.
    t0 = time.time()
    res = solve(prob, opts)
    cold_s = time.time() - t0
    ok = bool(res.converged)
    value, warm = cold_s, []

    # Warm samples (round-5 redesign, VERDICT item 1): ONE warm sample
    # from a 7.9-71 s relay-noise distribution is not evidence.  Take >=3
    # (up to 5 when the spread is bad and budget allows), with a short
    # cooldown between samples for relay-queue hygiene, and report
    # median + min + max + all samples.
    COOLDOWN_S = float(os.environ.get("OTAMG_BENCH_COOLDOWN", 10))
    want = int(os.environ.get("OTAMG_BENCH_WARM_SAMPLES", 3))
    res_best = res
    while ok and child_deadline:
        have = len(warm)
        spread_bad = (have >= 2 and min(warm) > 0
                      and max(warm) / min(warm) > 2.0)
        if have >= want and not (spread_bad and have < want + 2):
            break
        # Budget guard: first sample bounded by cold time (warm ~ cold
        # minus compile); later samples by the fastest warm seen.
        est = (max(90.0, 1.2 * cold_s - 60.0) if not warm
               else max(60.0, 2.0 * min(warm) + COOLDOWN_S))
        if child_deadline - time.time() <= est:
            break
        if warm:
            time.sleep(COOLDOWN_S)
        t0 = time.time()
        res2 = solve(prob, opts)
        dt = time.time() - t0
        if bool(res2.converged):
            warm.append(dt)
            if dt <= min(warm):
                res_best = res2
        else:
            break  # a non-converged warm solve: report the cold result

    if warm:
        res = res_best
        value = sorted(warm)[len(warm) // 2] if len(warm) % 2 \
            else 0.5 * (sorted(warm)[len(warm) // 2 - 1]
                        + sorted(warm)[len(warm) // 2])

    value = value if ok else float("inf")
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
        "fuse_deep": fuse_deep,
        "cold_s": round(cold_s, 3),
        "warm_samples": [round(w, 3) for w in warm],
        "warm_s": round(min(warm), 3) if warm else None,
        "warm_median_s": round(value, 3) if warm else None,
        "warm_spread": (round(max(warm) / min(warm), 2)
                        if warm and min(warm) > 0 else None),
    }
    # End-to-end roofline accounting (VERDICT item 6): modelled HBM
    # bytes from the solve's own counters / measured wall time.  Only
    # meaningful against a WARM wall time — the cold number includes
    # minutes of remote compilation, which would deflate model_gbps ~10x
    # with nothing marking the row as compile-inflated.
    if ok and warm:
        try:
            from otamg.amg.hierarchy import capacity_schedule
            from otamg.diag.roofline import (roofline_report,
                                             solve_bytes_model)

            m, mn_n = int(prob.p.shape[0]), int(prob.q.shape[0])
            caps = capacity_schedule(m, m + mn_n, amg)
            gamma = {Cycle.V: 1, Cycle.W: 2, Cycle.F: 3}[amg.cycle]
            model_b = solve_bytes_model(
                m, mn_n, int(res.iters), int(res.ssn_itnum.sum()),
                int(res.inner_total), amg.smoth, gamma, caps, fuse_deep)
            out.update(roofline_report(model_b, value))
        except Exception as exc:  # never let accounting kill the bench
            out["roofline_error"] = repr(exc)[:200]
    print("BENCH_RESULT " + json.dumps(out), flush=True)
    return 0 if ok else 1


def _persist_partial(state: dict):
    try:
        os.makedirs(os.path.dirname(PARTIAL_PATH), exist_ok=True)
        with open(PARTIAL_PATH, "w") as f:
            json.dump(state, f)
            f.write("\n")
    except OSError:
        pass


def _run_ladder(cls: str, ladder, budget_end: float, state: dict):
    """Run one problem class's attempt ladder; return (result_dict|None,
    errors).  Each entry is a fresh subprocess so a TPU worker crash in one
    attempt cannot poison the next.  `budget_end` is an absolute epoch
    deadline for this class; the global deadline still dominates."""
    errors = []
    for attempt, inner in enumerate(ladder, 1):
        now = time.time()
        left = min(budget_end - now, _remaining() - FINAL_RESERVE_S)
        if left < MIN_ATTEMPT_S:
            errors.append(f"{inner}: skipped (only {left:.0f}s budget left)")
            break
        child_deadline = now + left
        env = dict(os.environ,
                   OTAMG_BENCH_CHILD=f"{cls}:{inner}",
                   OTAMG_BENCH_CHILD_DEADLINE=f"{child_deadline:.1f}")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=left)
        except subprocess.TimeoutExpired as te:
            # A timed-out child may still have printed a cold result
            # before wedging on the warm re-time — salvage it.
            stdout = (te.stdout or b"")
            if isinstance(stdout, bytes):
                stdout = stdout.decode(errors="replace")
            salvaged = _extract_result(stdout)
            if salvaged is not None and salvaged.get("converged"):
                salvaged["note"] = "salvaged from timed-out child"
                return salvaged, errors
            errors.append(f"{inner}: timeout after {left:.0f}s")
            print(f"bench[{cls}] attempt {attempt}/{len(ladder)} "
                  f"(inner={inner}) timed out", file=sys.stderr, flush=True)
            continue
        result = _extract_result(proc.stdout)
        if result is not None:
            if attempt > 1:
                print(f"bench[{cls}]: NOTE result uses attempt "
                      f"{attempt} (inner={inner}); earlier attempts "
                      f"failed: {' | '.join(errors)[-300:]}",
                      file=sys.stderr, flush=True)
            if result.get("converged"):
                return result, errors
            errors.append(f"{inner}: ran but converged=false")
        else:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            errors.append(f"{inner}: rc={proc.returncode} "
                          + " | ".join(tail)[-300:])
            print(f"bench[{cls}] attempt {attempt}/{len(ladder)} "
                  f"(inner={inner}) failed (rc={proc.returncode}): "
                  f"{' | '.join(tail)}", file=sys.stderr, flush=True)
            # Only crashed workers need recovery time; a clean non-converge
            # does not.
            if attempt < len(ladder) and _remaining() > 2 * MIN_ATTEMPT_S:
                time.sleep(min(RETRY_WAIT_S, max(0.0, _remaining() / 10)))
    return None, errors


def _extract_result(stdout: str):
    for line in (stdout or "").splitlines():
        if line.startswith("BENCH_RESULT "):
            try:
                return json.loads(line[len("BENCH_RESULT "):])
            except json.JSONDecodeError:
                return None
    return None


_FINAL = {"printed": False, "out": None}


def _finalize(*_args):
    """Print the final JSON line exactly once (normal path or SIGALRM)."""
    if _FINAL["printed"]:
        return
    _FINAL["printed"] = True
    out = _FINAL["out"] or {
        "metric": "class1_500_time_to_kkt1e-6",
        "value": float("inf"), "unit": "s", "vs_baseline": 0.0,
        "converged": False, "error": "deadline hit before any result",
    }
    print(json.dumps(out), flush=True)
    if _args:  # called as a signal handler: exit now
        sys.stdout.flush()
        os._exit(0 if out.get("converged") else 1)


def main():
    if os.environ.get("OTAMG_BENCH_CHILD"):
        cls, inner = os.environ["OTAMG_BENCH_CHILD"].split(":")
        return _bench_once(cls, inner)

    # Hard guarantee: whatever happens, a JSON line lands before DEADLINE_S.
    signal.signal(signal.SIGALRM, _finalize)
    signal.alarm(max(1, int(DEADLINE_S - FINAL_RESERVE_S / 2)))

    out, errs1 = _run_ladder("class1", LADDER_C1,
                             T0 + C1_BUDGET_FRAC * DEADLINE_S, _FINAL)
    if out is None:
        out = {
            "metric": "class1_500_time_to_kkt1e-6",
            "value": float("inf"), "unit": "s", "vs_baseline": 0.0,
            "converged": False, "error": " | ".join(errs1)[-500:],
        }
    _FINAL["out"] = out
    _persist_partial(out)

    out2, errs2 = _run_ladder("class2", LADDER_C2, T0 + DEADLINE_S, _FINAL)
    out["class2"] = out2 if out2 is not None else {
        "converged": False, "error": " | ".join(errs2)[-300:]}
    _FINAL["out"] = out
    _persist_partial(out)

    signal.alarm(0)
    _finalize()
    return 0 if out.get("converged") else 1


if __name__ == "__main__":
    sys.exit(main())
