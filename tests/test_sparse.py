"""Sparse container and kernel tests vs dense/scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otamg.sparse import BSR, COO, CSR, ell_spmv, spgemm


def rand_sparse(rng, nr, nc, density):
    A = rng.standard_normal((nr, nc))
    A[rng.uniform(size=(nr, nc)) >= density] = 0.0
    return A


@pytest.mark.parametrize("nr,nc,density", [(13, 9, 0.3), (32, 32, 0.1),
                                           (8, 20, 0.0), (5, 5, 1.0)])
def test_coo_roundtrip_matvec(nr, nc, density):
    rng = np.random.default_rng(0)
    A = rand_sparse(rng, nr, nc, density)
    coo = COO.from_dense(jnp.asarray(A), capacity=nr * nc)
    np.testing.assert_allclose(np.asarray(coo.to_dense()), A, atol=1e-14)
    x = rng.standard_normal(nc)
    np.testing.assert_allclose(np.asarray(coo.matvec(jnp.asarray(x))),
                               A @ x, rtol=1e-12, atol=1e-12)
    y = rng.standard_normal(nr)
    np.testing.assert_allclose(np.asarray(coo.rmatvec(jnp.asarray(y))),
                               A.T @ y, rtol=1e-12, atol=1e-12)
    At = coo.transpose()
    np.testing.assert_allclose(np.asarray(At.to_dense()), A.T, atol=1e-14)


def test_coo_tight_capacity_and_jit():
    rng = np.random.default_rng(1)
    A = rand_sparse(rng, 16, 12, 0.2)
    cap = int((A != 0).sum()) + 3
    f = jax.jit(lambda M: COO.from_dense(M, capacity=cap).matvec(
        jnp.ones(12)))
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(A))),
                               A @ np.ones(12), rtol=1e-12)


def test_coo_sum_duplicates():
    rows = jnp.asarray([2, 0, 2, 1, 0, 0], jnp.int32)
    cols = jnp.asarray([1, 0, 1, 2, 0, 0], jnp.int32)
    vals = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 99.0])
    coo = COO((3, 3), rows, cols, vals, jnp.int32(5))  # last entry invalid
    out = coo.sum_duplicates()
    D = np.zeros((3, 3))
    D[2, 1] = 4.0
    D[0, 0] = 7.0
    D[1, 2] = 4.0
    np.testing.assert_allclose(np.asarray(out.to_dense()), D, atol=1e-14)
    assert int(out.nnz) == 3


@pytest.mark.parametrize("nr,nc,density,row_cap", [(13, 9, 0.3, 9),
                                                   (40, 30, 0.15, 12)])
def test_csr_roundtrip_matvec(nr, nc, density, row_cap):
    rng = np.random.default_rng(2)
    A = rand_sparse(rng, nr, nc, density)
    csr = CSR.from_dense(jnp.asarray(A), row_cap=row_cap)
    np.testing.assert_allclose(np.asarray(csr.to_dense()), A, atol=1e-14)
    x = rng.standard_normal(nc)
    np.testing.assert_allclose(np.asarray(csr.matvec(jnp.asarray(x))),
                               A @ x, rtol=1e-12, atol=1e-12)
    sq = rand_sparse(rng, nc, nc, density) + np.eye(nc)
    csq = CSR.from_dense(jnp.asarray(sq))
    np.testing.assert_allclose(np.asarray(csq.diag()), np.diag(sq),
                               rtol=1e-12)


def test_csr_from_coo():
    rng = np.random.default_rng(3)
    A = rand_sparse(rng, 11, 7, 0.4)
    coo = COO.from_dense(jnp.asarray(A))
    csr = CSR.from_coo(coo, row_cap=7)
    np.testing.assert_allclose(np.asarray(csr.to_dense()), A, atol=1e-14)


@pytest.mark.parametrize("bs", [2, 4])
def test_bsr_matvec(bs):
    rng = np.random.default_rng(4)
    nr = nc = 4 * bs
    A = rand_sparse(rng, nr, nc, 0.3)
    bsr = BSR.from_dense(jnp.asarray(A), bs=bs)
    np.testing.assert_allclose(np.asarray(bsr.to_dense()), A, atol=1e-14)
    x = rng.standard_normal(nc)
    np.testing.assert_allclose(np.asarray(bsr.matvec(jnp.asarray(x))),
                               A @ x, rtol=1e-12, atol=1e-12)


def test_spgemm_vs_dense():
    rng = np.random.default_rng(5)
    A = rand_sparse(rng, 12, 9, 0.3)
    B = rand_sparse(rng, 9, 14, 0.3)
    Ac = COO.from_dense(jnp.asarray(A))
    Bc = CSR.from_dense(jnp.asarray(B), row_cap=14)
    C = spgemm(Ac, Bc, out_capacity=12 * 14)
    np.testing.assert_allclose(np.asarray(C.to_dense()), A @ B,
                               rtol=1e-12, atol=1e-12)


def test_pallas_ell_spmv_interpret():
    """Pallas kernel vs the XLA path (interpret mode on CPU)."""
    rng = np.random.default_rng(6)
    A = rand_sparse(rng, 70, 50, 0.2)
    csr = CSR.from_dense(jnp.asarray(A, dtype=jnp.float32), row_cap=50)
    x = jnp.asarray(rng.standard_normal(50), jnp.float32)
    got = ell_spmv(csr.ell_cols, csr.ell_vals, x, block_rows=32,
                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), A @ np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    # and with a truncating row_cap, against the ELL view's own matvec
    csr16 = CSR.from_dense(jnp.asarray(A, dtype=jnp.float32), row_cap=16)
    got16 = ell_spmv(csr16.ell_cols, csr16.ell_vals, x, block_rows=32,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got16),
                               np.asarray(csr16.matvec(x)),
                               rtol=1e-4, atol=1e-4)


def test_pallas_ell_spmv_multitile_interpret():
    """Exercise the Pallas kernel's multi-tile logic (interpret mode):
    cap > 128 makes nt > 1 (the pl.when t==0 init + cross-tile output
    accumulation), n > 128 makes nc > 1 (the fori_loop masked-gather sweep
    over 128-lane source chunks), with non-multiple-of-128 padding on both
    axes — none of which the small cases above reach (round-2 advisor
    finding)."""
    rng = np.random.default_rng(42)
    n = 300
    A = rand_sparse(rng, 200, n, 0.45)       # max row nnz < 150 w.h.p.
    csr = CSR.from_dense(jnp.asarray(A, dtype=jnp.float32), row_cap=150)
    # rows may truncate at row_cap; compare against the ELL view itself
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    got = ell_spmv(csr.ell_cols, csr.ell_vals, x, block_rows=64,
                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(csr.matvec(x)),
                               rtol=1e-4, atol=1e-4)


def test_ell_spmv_out_of_range_padding_agreement():
    """Both SpMV paths must zero-fill out-of-range padding columns, so a
    caller that violates the col-0/val-0 invariant gets identical results
    from the XLA and Pallas paths."""
    from otamg.sparse.kernels import ell_spmv_xla

    cols = jnp.asarray([[0, 5, 999], [2, 998, 997]], jnp.int32)
    vals = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], jnp.float32)
    x = jnp.arange(6, dtype=jnp.float32)
    ref = jnp.asarray([2.0 * 5.0, 4.0 * 2.0])   # OOB slots contribute 0
    np.testing.assert_allclose(np.asarray(ell_spmv_xla(cols, vals, x)),
                               np.asarray(ref), rtol=1e-6)
    got = ell_spmv(cols, vals, jnp.pad(x, (0, 194)),  # n=200 > cap=3
                   block_rows=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_asat_coo_vs_dense():
    from otamg.sparse import asat_coo
    rng = np.random.default_rng(7)
    m, n = 9, 7
    p = rng.uniform(0.5, 2.0, m)
    q = rng.uniform(0.5, 2.0, n)
    s = (rng.uniform(size=m * n) > 0.5).astype(float)
    S = s.reshape((m, n), order="F")
    A1 = np.kron(np.eye(n), p[None, :])
    A2 = np.kron(q[None, :], np.eye(m))
    A = np.vstack([A1, A2])
    H0 = A @ np.diag(s) @ A.T
    coo = asat_coo(jnp.asarray(S), jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(coo.to_dense()), H0,
                               rtol=1e-12, atol=1e-12)
    nnz_true = (H0 != 0).sum()
    assert int(coo.nnz) == nnz_true


def test_spgemm_tight_capacity():
    """Regression: tight out_capacity must not displace real entries with
    spurious zero-valued groups from padded B slots."""
    rng = np.random.default_rng(5)
    A = rand_sparse(rng, 12, 9, 0.3)
    B = rand_sparse(rng, 9, 14, 0.3)
    true_nnz = int(((A @ B) != 0).sum())
    Ac = COO.from_dense(jnp.asarray(A))
    Bc = CSR.from_dense(jnp.asarray(B), row_cap=14)
    C = spgemm(Ac, Bc, out_capacity=true_nnz)
    np.testing.assert_allclose(np.asarray(C.to_dense()), A @ B,
                               rtol=1e-12, atol=1e-12)
    assert int(C.nnz) == true_nnz
