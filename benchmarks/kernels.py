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

BENCHES = ["bipartite_masked_gemv", "bip_gemv_loop", "bip_sweep_loop",
           "ell_spmv_xla", "ell_spmv_pallas",
           "galerkin_gemm", "newton_solve_amg"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--density", type=float, default=0.05)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--only", choices=BENCHES,
                    help="run a single benchmark")
    ap.add_argument("--out", help="append result JSON lines to this file")
    ap.add_argument("--coarse-target", type=int, default=None,
                    help="AMG coarsest-level target size for "
                         "newton_solve_amg (default: AMGOptions default)")
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

    # MARGINAL in-program timing.  Two axon-relay pitfalls (round-4
    # probes, scripts/r4_loop_probe.py): (a) block_until_ready can
    # return before a queued chain has executed — only a host FETCH of
    # the result is a reliable barrier; (b) each dispatch carries a
    # fixed ~25-40 ms relay round trip, so per-iter cost must be the
    # SLOPE between two loop lengths, not total/K.
    def marginal_time(make_fn, fargs, K1=40, K2=200, reps=3):
        f1, f2 = make_fn(K1), make_fn(K2)

        def t(fn):
            import numpy as _np

            _np.asarray(jax.device_get(fn(*fargs)))  # warm (compile)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _np.asarray(jax.device_get(fn(*fargs)))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t(f1), t(f2)
        slope = max((t2 - t1) / (K2 - K1), 1e-12)
        return slope, t1 - K1 * slope

    # Shared inputs.
    kS, kv = jax.random.split(key)
    S = (jax.random.uniform(kS, (m, n)) < args.density).astype(jnp.float32)
    v = jax.random.normal(kv, (n,), jnp.float32)

    # --- structured bipartite GEMV (the fine-level smoothing op),
    # single-direction chain ---
    if want("bipartite_masked_gemv"):
        def make_gemv(K):
            @jax.jit
            def chain(S, v):
                def body(_, v):
                    y = S @ v
                    return y / jnp.max(jnp.abs(y))

                return jax.lax.fori_loop(0, K, body, v)

            return chain

        dt, overhead = marginal_time(make_gemv, (S, v))
        bytes_moved = m * n * 4
        nnz = float(jnp.sum(S))
        emit({
            "bench": "bipartite_masked_gemv",
            "size": [m, n], "time_ms": dt * 1e3,
            "dispatch_overhead_ms": overhead * 1e3,
            "GBps": bytes_moved / dt / 1e9,
            "roofline_frac": bytes_moved / dt / 1e9 / bw,
            "effective_nnz_per_s": nnz / dt,
        })

    # --- chained dual GEMV inside ONE program: the DEVICE bandwidth of
    # the masked-dense operator, free of per-dispatch relay latency (the
    # single-dispatch bipartite_masked_gemv above under-reads when ~30 us
    # of relay dispatch sits on a ~25 us GEMV; round-3 verdict item 1) ---
    if want("bip_gemv_loop"):
        def make_chain(K):
            @jax.jit
            def gemv_chain(S, v):
                def body(_, v):
                    y = S @ v      # (m,)
                    z = S.T @ y    # (n,)  — dependent, cannot be hoisted
                    return z / jnp.max(jnp.abs(z))

                return jax.lax.fori_loop(0, K, body, v)

            return gemv_chain

        dt, overhead = marginal_time(make_chain, (S, v))
        bytes_moved = 2 * m * n * 4    # E read once per direction
        emit({
            "bench": "bip_gemv_loop", "size": [m, n],
            "time_ms": dt * 1e3, "dispatch_overhead_ms": overhead * 1e3,
            "GBps": bytes_moved / dt / 1e9,
            "roofline_frac": bytes_moved / dt / 1e9 / bw,
        })

    # --- the PRODUCTION fine-level smoothing sweep (projected block-GS,
    # hierarchy._projected_smooth_bip), K sweeps in one program.  Traffic
    # = 2 E reads per sweep — the Gauss-Seidel data-dependency floor ---
    if want("bip_sweep_loop"):
        from otamg.amg.hierarchy import (BipartiteLevel,
                                         _projected_smooth_bip)

        N = m + n
        g = 1.0 + jax.random.uniform(key, (N,), jnp.float32)
        labels = jnp.zeros(N, jnp.int32)
        nsp = jnp.ones(N, bool)
        W = jnp.zeros((n, m), jnp.float32)  # unused by the smoother body
        lv = BipartiteLevel(
            S, g, jnp.float32(0.25), W, labels, nsp,
            jnp.ones(N, jnp.float32), jnp.ones(N, jnp.float32),
            S @ jnp.ones((n,), jnp.float32),
            S.T @ jnp.ones((m,), jnp.float32))
        r = jax.random.normal(key, (N,), jnp.float32)

        def make_smooth(K):
            return jax.jit(lambda lv, r: _projected_smooth_bip(
                lv, None, r, K, False, N, False, True))

        dt, overhead = marginal_time(make_smooth, (lv, r))
        bytes_moved = 2 * m * n * 4
        emit({
            "bench": "bip_sweep_loop", "size": [m, n],
            "time_ms": dt * 1e3, "dispatch_overhead_ms": overhead * 1e3,
            "GBps": bytes_moved / dt / 1e9,
            "roofline_frac": bytes_moved / dt / 1e9 / bw,
        })

    # --- ELL SpMV: XLA path and Pallas kernel ---
    from otamg.sparse import CSR, ell_spmv, ell_spmv_xla

    row_cap = max(8, int(args.density * n * 2))
    dense = S * jax.random.normal(key, (m, n), jnp.float32)
    csr = CSR.from_dense(dense, row_cap=row_cap)
    x = jax.random.normal(kv, (n,), jnp.float32)
    ell_bytes = m * row_cap * 8  # vals f32 + cols i32

    def ell_chain(spmv, K):
        @jax.jit
        def chain(c, vl, xx):
            def body(_, xx):
                y = spmv(c, vl, xx)
                return y / jnp.max(jnp.abs(y))

            return jax.lax.fori_loop(0, K, body, xx)

        return chain

    if want("ell_spmv_xla"):
        dt, overhead = marginal_time(
            lambda K: ell_chain(ell_spmv_xla, K),
            (csr.ell_cols, csr.ell_vals, x))
        emit({
            "bench": "ell_spmv_xla", "size": [m, row_cap],
            "time_ms": dt * 1e3, "dispatch_overhead_ms": overhead * 1e3,
            "GBps": ell_bytes / dt / 1e9,
            "roofline_frac": ell_bytes / dt / 1e9 / bw,
            "nnz_per_s": m * row_cap / dt,
        })

    if want("ell_spmv_pallas") and platform != "cpu":
        try:
            dt, overhead = marginal_time(
                lambda K: ell_chain(ell_spmv, K),
                (csr.ell_cols, csr.ell_vals, x))
            emit({
                "bench": "ell_spmv_pallas", "size": [m, row_cap],
                "time_ms": dt * 1e3,
                "dispatch_overhead_ms": overhead * 1e3,
                "GBps": ell_bytes / dt / 1e9,
                "roofline_frac": ell_bytes / dt / 1e9 / bw,
                "nnz_per_s": m * row_cap / dt,
            })
        except Exception as e:  # Mosaic may reject gathers on some gens
            emit({"bench": "ell_spmv_pallas", "error": str(e)[:200]})

    # --- Galerkin GEMM (level-1 -> 2 triple product piece) ---
    if want("galerkin_gemm"):
        W0 = jnp.abs(dense).T  # (n, m)

        def make_galerkin(K):
            @jax.jit
            def chain(S, W):
                def body(_, W):
                    G = S @ W                      # (m, m)
                    return (G / jnp.max(jnp.abs(G)))[:n, :]

                return jax.lax.fori_loop(0, K, body, W)

            return chain

        dt, overhead = marginal_time(make_galerkin, (S, W0), K1=5, K2=25)
        flops = 2.0 * m * n * m
        emit({
            "bench": "galerkin_gemm", "size": [m, n, m],
            "time_ms": dt * 1e3, "dispatch_overhead_ms": overhead * 1e3,
            "TFLOPs": flops / dt / 1e12,
        })

    # --- one full Newton solve (hierarchy setup + W-cycles) ---
    if want("newton_solve_amg"):
        from otamg.config import AMGOptions
        from otamg.hybrid import make_hybrid_amg_solver

        p = jnp.ones((m,), jnp.float64)
        q = jnp.ones((n,), jnp.float64)
        amg_opts = (AMGOptions() if args.coarse_target is None
                    else AMGOptions(coarse_target=args.coarse_target))
        solver = make_hybrid_amg_solver(
            p, q, amg_opts,
            solve_dtype=None if platform == "cpu" else "float32")
        tvec = jnp.zeros(n + m, jnp.float64)
        rhs = jax.random.normal(key, (n + m,), jnp.float64)
        S64 = S.astype(jnp.float64)

        def make_newton(K):
            @jax.jit
            def chain(S_, r_, k_):
                def body(_, r):
                    sol = solver(S_, tvec, 1e-4, 1.0, r, k_)
                    z = sol.zeta
                    return (z / jnp.linalg.norm(z)).astype(r.dtype)

                return jax.lax.fori_loop(0, K, body, r_)

            return chain

        dt, overhead = marginal_time(
            make_newton, (S64, rhs, jax.random.PRNGKey(1)), K1=1, K2=5)
        emit({
            "bench": "newton_solve_amg", "size": [n + m],
            "density": args.density, "time_ms": dt * 1e3,
            "dispatch_overhead_ms": overhead * 1e3,
            "coarse_target": args.coarse_target,
        })

    if out_fh:
        out_fh.close()


if __name__ == "__main__":
    main()
