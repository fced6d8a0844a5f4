"""Distributed correctness: 1-chip vs N-chip results must agree (SURVEY.md
section 4, distributed test tier).  Runs on the 8-device virtual CPU mesh
from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otamg.config import APDOptions, InnerSolver
from otamg.dist import make_mesh, shard_class1
from otamg.opt import solve_class1
from otamg.ot import operators as op
from otamg.ot import random_class1


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_operators_match(mesh):
    prob = random_class1(jax.random.PRNGKey(0), 32, 24)
    sp = shard_class1(prob, mesh)
    X = jax.random.normal(jax.random.PRNGKey(1), (32, 24), jnp.float64)
    Xs = jax.device_put(X, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("x", None)))
    got = jax.jit(op.apply_A)(Xs, sp.p, sp.q)
    want = op.apply_A(X, prob.p, prob.q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12)
    y = jax.random.normal(jax.random.PRNGKey(2), (24 + 32,), jnp.float64)
    gotT = jax.jit(op.apply_At)(y, sp.p, sp.q)
    wantT = op.apply_At(y, prob.p, prob.q)
    np.testing.assert_allclose(np.asarray(gotT), np.asarray(wantT),
                               rtol=1e-12)


def test_explicit_dist_solve_matches_implicit(mesh):
    """The flag-selected explicit-collectives assembly path
    (``APDOptions.explicit_dist`` -> ``transform_sharded`` inside
    ``build_he_solver``) must reproduce the implicit-partitioner solve
    exactly (same seeds, same trajectory)."""
    prob = random_class1(jax.random.PRNGKey(43), 32, 24)
    base = APDOptions(inner_solver=InnerSolver.AMG, maxit=40)
    res_imp = solve_class1(shard_class1(prob, mesh), base)
    res_exp = solve_class1(
        shard_class1(prob, mesh),
        APDOptions(inner_solver=InnerSolver.AMG, maxit=40,
                   explicit_dist=True))
    assert res_exp.converged == res_imp.converged
    assert res_exp.iters == res_imp.iters
    np.testing.assert_allclose(res_exp.kkt_l, res_imp.kkt_l, rtol=1e-6,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(res_exp.X),
                               np.asarray(res_imp.X), rtol=1e-8,
                               atol=1e-12)


@pytest.mark.parametrize("inner", [InnerSolver.PCG, InnerSolver.AMG])
def test_solve_1chip_vs_8chip(mesh, inner):
    """The full APD solve must produce the same trajectory on a sharded
    problem as on a single device (identical math, collective-inserted)."""
    prob = random_class1(jax.random.PRNGKey(42), 32, 24)
    opts = APDOptions(inner_solver=inner, maxit=40)
    res1 = solve_class1(prob, opts)
    res8 = solve_class1(shard_class1(prob, mesh), opts)
    assert res1.converged == res8.converged
    # trajectories agree to fp64 roundoff (reduction orders may differ)
    np.testing.assert_allclose(res8.kkt_l, res1.kkt_l, rtol=1e-6,
                               atol=1e-10)
    np.testing.assert_allclose(res8.fxk[-1], res1.fxk[-1], rtol=1e-9)


def test_spmv_allgather_matches(mesh):
    from otamg.sparse import CSR
    rng = np.random.default_rng(3)
    N = 64
    A = rng.standard_normal((N, N))
    A[rng.uniform(size=(N, N)) >= 0.2] = 0.0
    csr = CSR.from_dense(jnp.asarray(A), row_cap=N)
    x = jnp.asarray(rng.standard_normal(N))
    from otamg.dist import spmv_allgather
    got = spmv_allgather(mesh, csr.ell_cols, csr.ell_vals, x)
    np.testing.assert_allclose(np.asarray(got), A @ np.asarray(x),
                               rtol=1e-12, atol=1e-12)


def test_spmv_halo_banded(mesh):
    from otamg.sparse import CSR
    rng = np.random.default_rng(4)
    N, halo = 64, 3
    A = np.zeros((N, N))
    for i in range(N):
        lo, hi = max(0, i - halo), min(N, i + halo + 1)
        A[i, lo:hi] = rng.standard_normal(hi - lo)
    csr = CSR.from_dense(jnp.asarray(A), row_cap=2 * halo + 1)
    x = jnp.asarray(rng.standard_normal(N))
    from otamg.dist import spmv_halo
    got = spmv_halo(mesh, csr.ell_cols, csr.ell_vals, x, halo=halo)
    np.testing.assert_allclose(np.asarray(got), A @ np.asarray(x),
                               rtol=1e-12, atol=1e-12)


def test_distributed_assembly_matches_replicated(mesh):
    """Explicit shard_map assembly (psum + all_gather) must reproduce the
    replicated transform/ASAt diagonals exactly."""
    from otamg.dist import asat_diags_sharded, transform_sharded
    from otamg.hybrid.solver import _transform
    from otamg.ot import operators as op

    rng = np.random.default_rng(7)
    m, n = 40, 24
    p = jnp.asarray(rng.uniform(0.5, 1.5, m))
    q = jnp.asarray(rng.uniform(0.5, 1.5, n))
    S = jnp.asarray((rng.uniform(size=(m, n)) < 0.3).astype(np.float64))
    tvec = jnp.asarray((rng.uniform(size=n + m) < 0.5).astype(np.float64))
    bk1, tk = 1e-3, 0.8

    d1, d2 = asat_diags_sharded(mesh, S, p, q)
    d1_ref, d2_ref = op.asat_diags(S, p, q)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_ref),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_ref),
                               rtol=1e-13)

    E, g, kdiag = transform_sharded(mesh, S, tvec, bk1, tk, p, q)
    E_ref, g_ref, kdiag_ref, _, _ = _transform(S, tvec, bk1, tk,
                                               jnp.zeros(n + m), p, q)
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_ref),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(kdiag), np.asarray(kdiag_ref),
                               rtol=1e-13)


def test_sharded_solve_inserts_collectives(mesh):
    """The implicitly-partitioned product path must actually communicate:
    compiling apply_A on a row-sharded plan has to produce an all-reduce
    (the ``X^T p`` contraction over the sharded axis)."""
    prob = random_class1(jax.random.PRNGKey(0), 32, 24)
    sp = shard_class1(prob, mesh)
    X = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (32, 24), jnp.float64),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("x", None)))
    compiled = jax.jit(op.apply_A).lower(X, sp.p, sp.q).compile()
    hlo = compiled.as_text()
    assert ("all-reduce" in hlo) or ("all-gather" in hlo), \
        "sharded apply_A compiled without any collective"


def test_galerkin_sharded_matches_dense(mesh):
    """Distributed P^T A P (local GEMMs + one psum) vs the dense triple
    product."""
    from otamg.dist import galerkin_sharded

    rng = np.random.default_rng(8)
    N, c = 64, 24
    A = rng.standard_normal((N, N))
    A = (A + A.T) / 2
    Pr = rng.standard_normal((N, c))
    got = galerkin_sharded(mesh, jnp.asarray(A), jnp.asarray(Pr))
    want = Pr.T @ A @ Pr
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11,
                               atol=1e-11)


def test_spgemm_rowsharded_matches_dense(mesh):
    """Distributed ELL x ELL product: the (duplicate-preserving) output
    ELL must represent A @ B exactly (checked by densification)."""
    from otamg.dist import spgemm_rowsharded
    from otamg.sparse import CSR

    rng = np.random.default_rng(9)
    N = 64
    A = rng.standard_normal((N, N)) * (rng.uniform(size=(N, N)) < 0.1)
    B = rng.standard_normal((N, N)) * (rng.uniform(size=(N, N)) < 0.1)
    ca = CSR.from_dense(jnp.asarray(A), row_cap=16)
    cb = CSR.from_dense(jnp.asarray(B), row_cap=16)
    cc, cv, need = spgemm_rowsharded(mesh, ca.ell_cols, ca.ell_vals,
                                     cb.ell_cols, cb.ell_vals)
    # Uncapped: `need` is the exact capacity a compaction would require —
    # at least the true worst-row nnz (plus possibly the padding group).
    assert int(need) >= int(np.max(((A @ B) != 0).sum(axis=1)))
    dense = np.zeros((N, N))
    rows = np.broadcast_to(np.arange(N)[:, None], cc.shape)
    np.add.at(dense, (rows.ravel(), np.asarray(cc).ravel()),
              np.asarray(cv).ravel())
    np.testing.assert_allclose(dense, A @ B, rtol=1e-11, atol=1e-11)


def test_spgemm_rowsharded_compaction_chain(mesh):
    """With ``out_cap``, duplicate columns are merged locally so a chained
    (Galerkin-style) product keeps bounded capacity: the 2-chain product
    A @ A @ A stays within 2x the true max row nnz instead of growing as
    rcA * rcB per hop (round-2 verdict item 8)."""
    from otamg.dist import spgemm_rowsharded
    from otamg.sparse import CSR

    rng = np.random.default_rng(11)
    N = 64
    A = rng.standard_normal((N, N)) * (rng.uniform(size=(N, N)) < 0.08)
    ca = CSR.from_dense(jnp.asarray(A), row_cap=16)

    A2 = A @ A
    A3 = A2 @ A
    true_cap = int(np.max((A3 != 0).sum(axis=1)))
    out_cap = max(2 * true_cap, 2 * int(np.max((A2 != 0).sum(axis=1))))

    cc, cv, need = spgemm_rowsharded(mesh, ca.ell_cols, ca.ell_vals,
                                     ca.ell_cols, ca.ell_vals,
                                     out_cap=out_cap)
    assert cc.shape[1] <= out_cap < 16 * 16
    assert int(need) <= out_cap  # no truncation at this capacity
    cc2, cv2, need2 = spgemm_rowsharded(mesh, cc, cv, ca.ell_cols,
                                        ca.ell_vals, out_cap=out_cap)
    assert cc2.shape[1] <= out_cap
    assert int(need2) <= out_cap

    dense = np.zeros((N, N))
    rows = np.broadcast_to(np.arange(N)[:, None], cc2.shape)
    np.add.at(dense, (rows.ravel(), np.asarray(cc2).ravel()),
              np.asarray(cv2).ravel())
    np.testing.assert_allclose(dense, A3, rtol=1e-11, atol=1e-11)


def test_ell_row_sum_duplicates_exact_fit_padding():
    """Round-5 review: a row with padding slots plus EXACTLY ``out_cap``
    real distinct columns must keep every real column.  The padding
    group's gid=-1 must be remapped to a genuinely out-of-bounds index:
    JAX normalizes negative scatter indices BEFORE the ``mode="drop"``
    check, so -1 otherwise wraps to slot ``out_cap - 1`` and can clobber
    the last real column (scatter order with duplicate indices is
    implementation-defined — it happened to be benign on CPU)."""
    from otamg.dist.assembly import ell_row_sum_duplicates

    cols = jnp.asarray([[0, 0, 3, 5, 7, 9]])
    vals = jnp.asarray([[0.0, 0.0, 1.0, 2.0, 3.0, 4.0]])
    oc, ov, need = ell_row_sum_duplicates(cols, vals, out_cap=4)
    assert int(need) == 4  # exact fit: must NOT flag overflow
    got = {(int(c), float(v))
           for c, v in zip(np.asarray(oc)[0], np.asarray(ov)[0])}
    assert got == {(3, 1.0), (5, 2.0), (7, 3.0), (9, 4.0)}


def test_spgemm_rowsharded_overflow_flagged(mesh):
    """A too-tight ``out_cap`` must be DETECTED (round-3 advisor item):
    ``cap_needed > out_cap`` whenever real merged entries were dropped —
    a silent truncation would hand AMG a wrong coarse operator."""
    from otamg.dist import spgemm_rowsharded
    from otamg.sparse import CSR

    rng = np.random.default_rng(13)
    N = 64
    A = rng.standard_normal((N, N)) * (rng.uniform(size=(N, N)) < 0.2)
    ca = CSR.from_dense(jnp.asarray(A), row_cap=24)
    true_cap = int(np.max(((A @ A) != 0).sum(axis=1)))
    tight = max(2, true_cap // 2)  # deliberately undersized
    cc, cv, need = spgemm_rowsharded(mesh, ca.ell_cols, ca.ell_vals,
                                     ca.ell_cols, ca.ell_vals,
                                     out_cap=tight)
    assert int(need) > tight
    assert int(need) >= true_cap  # and it reports the capacity to retry with
