"""Bisect the axon-TPU kernel fault in the AMG path.

The full AMG inner solver deterministically crashes the axon TPU worker
("TPU worker process crashed or restarted ... kernel fault") while the
PCG/AUG_PCG programs run clean.  This harness runs progressively larger
pieces of the AMG program, one per STEP, so a driver can run each step in
a fresh process (a worker crash kills the process and stalls the relay,
so steps must be isolated):

  OTAMG_BISECT_STEP=<name> python scripts/tpu_bisect.py

Steps (cumulative program size):
  components  label-propagation components on the bipartite mask
  strength    strength-of-connection + MIS coarsening of one dense level
  setup       full jit(setup_hierarchy) on a realistic masked operator
  cycle1      setup + amg_solve with maxit=1 (one W-cycle)
  cycle30     setup + amg_solve with the reference maxit=30
  he          build_he_solver + one mixed-precision he_solve
  apd2it      full solve_class1, AMG inner, maxit=2
  apd10it     full solve_class1, AMG inner, maxit=10
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_state(m=500, n=500, density=0.3, seed=0):
    """Synthetic (S, tvec, bk1, tk, p, q, rhs) shaped like a mid-run SsN
    state: S an active-set mask of ~density, tvec the complement-ish
    indicator, small bk1."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    S = (jax.random.uniform(k1, (m, n)) < density).astype(jnp.float64)
    tvec = (jax.random.uniform(k2, (n + m,)) < 0.5).astype(jnp.float64)
    p = jax.random.uniform(k3, (m,), minval=0.5, maxval=1.5)
    q = jax.random.uniform(k4, (n,), minval=0.5, maxval=1.5)
    bk1 = jnp.asarray(1e-3, jnp.float64)
    tk = jnp.asarray(1.0, jnp.float64)
    rhs = jnp.ones(n + m, jnp.float64)
    return S, tvec, bk1, tk, p, q, rhs


def main():
    step = os.environ.get("OTAMG_BISECT_STEP", "components")
    jax.config.update("jax_enable_x64", True)
    platform = jax.devices()[0].platform
    print(f"[bisect:{step}] platform={platform}", flush=True)
    t0 = time.time()

    from otamg.config import AMGOptions, APDOptions, InnerSolver
    from otamg.hybrid.solver import _component_info, _transform, \
        build_he_solver

    lo = jnp.float32
    S, tvec, bk1, tk, p, q, rhs = make_state()

    if step == "components":
        E, g, kdiag, f, q0 = _transform(S, tvec, bk1, tk, rhs, p, q)
        labels, nsp, ncomp, _last = jax.jit(_component_info)(E, kdiag)
        jax.block_until_ready(labels)
        print(f"[bisect:{step}] OK ncomp={int(ncomp)} "
              f"t={time.time() - t0:.1f}s", flush=True)
        return 0

    if step == "strength":
        from otamg.amg.graph import mis_dense, strength_dense

        E, g, kdiag, f, q0 = _transform(S, tvec, bk1, tk, rhs, p, q)
        A = (jnp.diag(g) - _pad_bip(E) / tk).astype(lo)

        @jax.jit
        def run(A, key):
            active = jnp.ones(A.shape[0], bool)
            Sv = strength_dense(A, active)
            return mis_dense(Sv >= 0.25, active, key)

        isC, isF = run(A, jax.random.PRNGKey(1))
        jax.block_until_ready(isC)
        print(f"[bisect:{step}] OK numC={int(jnp.sum(isC))} "
              f"t={time.time() - t0:.1f}s", flush=True)
        return 0

    if step in ("setup", "cycle1", "cycle30"):
        from otamg.amg.hierarchy import amg_solve, setup_hierarchy

        E, g, kdiag, f, q0 = _transform(S, tvec, bk1, tk, rhs, p, q)
        labels, nsp, ncomp, _last = _component_info(E, kdiag)
        opts = AMGOptions(maxit=(1 if step == "cycle1" else 30))

        if step == "setup":
            @jax.jit
            def run(E, g, labels, nsp, key):
                return setup_hierarchy(E.astype(lo), g.astype(lo),
                                       jnp.asarray(1.0 / tk, lo),
                                       labels, nsp, opts, key)

            lv1, dense = run(E, g, labels, nsp, jax.random.PRNGKey(1))
            jax.block_until_ready(lv1.E)
            print(f"[bisect:{step}] OK levels={1 + len(dense)} "
                  f"t={time.time() - t0:.1f}s", flush=True)
            return 0

        @jax.jit
        def run(E, g, f, labels, nsp, key):
            lv1, dense = setup_hierarchy(E.astype(lo), g.astype(lo),
                                         jnp.asarray(1.0 / tk, lo),
                                         labels, nsp, opts, key)
            guess = jnp.zeros_like(f, dtype=lo)
            return amg_solve(lv1, dense, f.astype(lo), guess, opts)

        res = run(E, g, f, labels, nsp, jax.random.PRNGKey(1))
        jax.block_until_ready(res.x)
        print(f"[bisect:{step}] OK iters={int(res.iters)} "
              f"rel={float(res.rel_res):.2e} t={time.time() - t0:.1f}s",
              flush=True)
        return 0

    if step == "he":
        opts = AMGOptions()

        @jax.jit
        def run(S, tvec, bk1, tk, rhs, key):
            k1, k2 = jax.random.split(key)
            he_solve, ncomp, _last = build_he_solver(
                S, tvec, bk1, tk, p, q, opts, "float32", 10,
                rhs.dtype, k1)
            return he_solve(rhs, k2)

        zeta, iters, rel = run(S, tvec, bk1, tk, rhs,
                               jax.random.PRNGKey(1))
        jax.block_until_ready(zeta)
        print(f"[bisect:{step}] OK iters={int(iters)} "
              f"rel={float(rel):.2e} t={time.time() - t0:.1f}s", flush=True)
        return 0

    if step in ("apd2it", "apd10it"):
        from otamg.opt import solve_class1
        from otamg.ot import load_class1_mat

        prob = load_class1_mat(
            "/root/reference/Class1/InputData/data1-500.mat")
        opts = APDOptions(inner_solver=InnerSolver.AMG,
                          solve_dtype="float32",
                          maxit=(2 if step == "apd2it" else 10))
        res = solve_class1(prob, opts)
        print(f"[bisect:{step}] OK it={int(res.iters)} "
              f"conv={bool(res.converged)} t={time.time() - t0:.1f}s",
              flush=True)
        return 0

    print(f"[bisect] unknown step {step}", file=sys.stderr)
    return 2


def _pad_bip(E):
    """Dense symmetric bipartite adjacency [[0, E^T], [E, 0]]."""
    m, n = E.shape
    z1 = jnp.zeros((n, n), E.dtype)
    z2 = jnp.zeros((m, m), E.dtype)
    return jnp.block([[z1, E.T], [E, z2]])


if __name__ == "__main__":
    sys.exit(main())
