"""Kernel-level roofline benchmarks (BASELINE target: SpMV/SpGEMM >= 70%
of roofline nnz/s; plus V/W-cycle and SsN-solve timings).

Prints one JSON line per benchmark.  Run on the target accelerator:

    python benchmarks/kernels.py [--size 2048] [--density 0.05]
                                 [--only NAME] [--out FILE]

``--only`` runs a single benchmark (subprocess isolation: the axon TPU
worker can crash on one program without poisoning the rest — see
``run_kernels_isolated.py``); ``--out`` appends the JSON lines to a file
as they land.

Roofline model: SpMV is bandwidth-bound; the streamed traffic for the
structured bipartite operator is the E matrix (4 bytes/entry fp32), for
ELL it is vals+cols (8 bytes/nnz).  v5e HBM peak ~819 GB/s.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


HBM_GBPS = {"tpu": 819.0, "cpu": 50.0}

BENCHES = ["bipartite_masked_gemv", "ell_spmv_xla", "ell_spmv_pallas",
           "galerkin_gemm", "newton_solve_amg"]


def timeit(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--density", type=float, default=0.05)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--only", choices=BENCHES,
                    help="run a single benchmark")
    ap.add_argument("--out", help="append result JSON lines to this file")
    args = ap.parse_args()

    def want(name):
        return args.only is None or args.only == name

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass

    platform = jax.default_backend()
    bw = HBM_GBPS.get("tpu" if platform != "cpu" else "cpu", 100.0)
    m = n = args.size
    key = jax.random.PRNGKey(0)

    out_fh = open(args.out, "a") if args.out else None

    def emit(rec):
        rec["platform"] = platform
        rec["size_arg"] = args.size
        line = json.dumps(rec)
        print(line, flush=True)
        if out_fh:
            out_fh.write(line + "\n")
            out_fh.flush()

    # Shared inputs.
    kS, kv = jax.random.split(key)
    S = (jax.random.uniform(kS, (m, n)) < args.density).astype(jnp.float32)
    v = jax.random.normal(kv, (n,), jnp.float32)

    # --- structured bipartite GEMV (the fine-level smoothing op) ---
    if want("bipartite_masked_gemv"):
        @jax.jit
        def e_gemv(S, v):
            return S @ v

        dt = timeit(e_gemv, S, v, n=args.reps)
        bytes_moved = m * n * 4
        nnz = float(jnp.sum(S))
        emit({
            "bench": "bipartite_masked_gemv",
            "size": [m, n], "time_ms": dt * 1e3,
            "GBps": bytes_moved / dt / 1e9,
            "roofline_frac": bytes_moved / dt / 1e9 / bw,
            "effective_nnz_per_s": nnz / dt,
        })

    # --- ELL SpMV: XLA path and Pallas kernel ---
    from otamg.sparse import CSR, ell_spmv, ell_spmv_xla

    row_cap = max(8, int(args.density * n * 2))
    dense = S * jax.random.normal(key, (m, n), jnp.float32)
    csr = CSR.from_dense(dense, row_cap=row_cap)
    x = jax.random.normal(kv, (n,), jnp.float32)
    ell_bytes = m * row_cap * 8  # vals f32 + cols i32

    if want("ell_spmv_xla"):
        spmv_x = jax.jit(lambda c, vl, xx: ell_spmv_xla(c, vl, xx))
        dt = timeit(spmv_x, csr.ell_cols, csr.ell_vals, x, n=args.reps)
        emit({
            "bench": "ell_spmv_xla", "size": [m, row_cap],
            "time_ms": dt * 1e3, "GBps": ell_bytes / dt / 1e9,
            "roofline_frac": ell_bytes / dt / 1e9 / bw,
            "nnz_per_s": m * row_cap / dt,
        })

    if want("ell_spmv_pallas") and platform != "cpu":
        spmv_p = jax.jit(lambda c, vl, xx: ell_spmv(c, vl, xx))
        try:
            dt = timeit(spmv_p, csr.ell_cols, csr.ell_vals, x,
                        n=args.reps)
            emit({
                "bench": "ell_spmv_pallas", "size": [m, row_cap],
                "time_ms": dt * 1e3, "GBps": ell_bytes / dt / 1e9,
                "roofline_frac": ell_bytes / dt / 1e9 / bw,
                "nnz_per_s": m * row_cap / dt,
            })
        except Exception as e:  # Mosaic may reject gathers on some gens
            emit({"bench": "ell_spmv_pallas", "error": str(e)[:200]})

    # --- Galerkin GEMM (level-1 -> 2 triple product piece) ---
    if want("galerkin_gemm"):
        W = jnp.abs(dense).T  # (n, m)

        @jax.jit
        def galerkin(S, W):
            return (S @ W)

        dt = timeit(galerkin, S, W, n=max(3, args.reps // 4))
        flops = 2.0 * m * n * m
        emit({
            "bench": "galerkin_gemm", "size": [m, n, m],
            "time_ms": dt * 1e3, "TFLOPs": flops / dt / 1e12,
        })

    # --- one full Newton solve (hierarchy setup + W-cycles) ---
    if want("newton_solve_amg"):
        from otamg.config import AMGOptions
        from otamg.hybrid import make_hybrid_amg_solver

        p = jnp.ones((m,), jnp.float64)
        q = jnp.ones((n,), jnp.float64)
        solver = make_hybrid_amg_solver(
            p, q, AMGOptions(),
            solve_dtype=None if platform == "cpu" else "float32")
        tvec = jnp.zeros(n + m, jnp.float64)
        rhs = jax.random.normal(key, (n + m,), jnp.float64)
        S64 = S.astype(jnp.float64)

        run = jax.jit(lambda S_, r_, k_: solver(S_, tvec, 1e-4, 1.0,
                                                r_, k_))
        dt = timeit(run, S64, rhs, jax.random.PRNGKey(1),
                    n=max(3, args.reps // 4))
        emit({
            "bench": "newton_solve_amg", "size": [n + m],
            "density": args.density, "time_ms": dt * 1e3,
        })

    if out_fh:
        out_fh.close()


if __name__ == "__main__":
    main()
