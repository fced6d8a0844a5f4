"""Hybrid Newton-system solvers (layer L4).

Reference ``Hybrid_AMG.m`` / ``Hybrid_twogrid.m`` / ``aug_PCG.m``: transform
the SsN Jacobian system ``He zeta = z`` (``He = bk1 I + (T + H0)/tk``) by
the similarity ``Q0 = diag(q, -p)`` into ``Ae u = f`` with

    ``Ae = bk1 Q + (K + A0)/tk``,  ``A0 = Q0 H0 Q0``,  ``K = Q0 T Q0``,

where ``A0`` is the graph Laplacian of the *bipartite active-set graph*
with edge weights ``w_ij = p_i^2 q_j^2 s_ij`` (off-diagonal block
``-diag(q^2) Y^T diag(p^2)``; diagonal = incident edge-weight sums).  So in
matrix terms ``Ae = diag(g) - E/tk`` with ``E_ij = p_i^2 q_j^2 s_ij`` and
``g = bk1 [q^2; p^2] + (k + a0diag)/tk`` — exactly the structured form
:mod:`otamg.amg.hierarchy` is built around.

TPU-first redesign of the component dispatch (``Hybrid_AMG.m:27-91``):
instead of permuting per-component submatrices out of the matrix and
running one AMG per large component plus a direct solve on gathered small
ones, we label components on-device (label propagation replaces
``dmperm``), and solve *all* components simultaneously in one masked
hierarchy whose kernel-projected smoothing and interpolation normalization
act per component through the labels.  Same math, no data-dependent shapes,
no sequential component loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from otamg.amg.graph import connected_components_bipartite
from otamg.amg.hierarchy import amg_solve, setup_hierarchy
from otamg.config import AMGOptions, PCGOptions
from otamg.krylov.pcg import pcg
from otamg.opt.newton import NewtonSolveResult, NewtonSolver


def _transform(S, tvec, bk1, tk, rhs, p, q):
    """Shared Q0-transform pieces (``Hybrid_AMG.m:16-24``)."""
    p2 = p * p
    q2 = q * q
    q0 = jnp.concatenate([q, -p])
    qp2 = jnp.concatenate([q2, p2])
    E = (p2[:, None] * q2[None, :]) * S
    a0diag = jnp.concatenate([jnp.sum(E, axis=0), jnp.sum(E, axis=1)])
    kdiag = qp2 * tvec
    g = bk1 * qp2 + (kdiag + a0diag) / tk
    f = q0 * rhs
    return E, g, kdiag, f, q0


def _component_info(E, kdiag):
    """Component labels + per-component near-singularity flags
    (``Hybrid_AMG.m:33-40,60-66``: a component is near-singular iff the
    ``K`` diagonal vanishes on it)."""
    N = kdiag.shape[0]
    labels = connected_components_bipartite(E)
    ksum = jax.ops.segment_sum(kdiag, labels, num_segments=N)
    nsp = ksum[labels] == 0
    ncomp = jnp.sum(labels == jnp.arange(N, dtype=labels.dtype)
                    ).astype(jnp.int32)
    return labels, nsp, ncomp


def make_hybrid_amg_solver(p: jax.Array, q: jax.Array,
                           opts: AMGOptions,
                           twogrid: bool = False) -> NewtonSolver:
    """Newton solver via the hybrid AMG path (``inner_solver=4``; with
    ``twogrid=True`` the two-level variant of ``Hybrid_twogrid.m`` /
    ``twogrid_bigph.m`` — one coarse level, Jacobi-PCG coarse correction
    capped at 100 iterations, ``twogrid_bigph.m:98-99``)."""
    if twogrid:
        opts = AMGOptions(
            retol=opts.retol, bigph=opts.bigph, maxit=opts.maxit,
            theta=opts.theta, smoth=opts.smoth, cycle=opts.cycle,
            isnsp=opts.isnsp, inter=opts.inter, max_levels=2,
            coarsen_ratio=opts.coarsen_ratio,
            coarse_pcg=PCGOptions(retol=1e-11, maxit=100))

    def solve(S, tvec, bk1, tk, rhs, key) -> NewtonSolveResult:
        E, g, kdiag, f, q0 = _transform(S, tvec, bk1, tk, rhs, p, q)
        labels, nsp, ncomp = _component_info(E, kdiag)
        k_guess, k_setup = jax.random.split(key)
        # Random initial guess scaled as the reference's
        # ``bk1*tk*rand`` (Hybrid_AMG.m:69).
        guess = bk1 * tk * jax.random.uniform(k_guess, f.shape,
                                              dtype=f.dtype)
        lv1, dense = setup_hierarchy(E, g, 1.0 / tk, labels, nsp, opts,
                                     k_setup)
        r = amg_solve(lv1, dense, f, guess, opts)
        return NewtonSolveResult(q0 * r.x, r.iters, r.rel_res, ncomp,
                                 jnp.int32(0))

    return solve


def make_aug_pcg_solver(p: jax.Array, q: jax.Array,
                        opts: PCGOptions) -> NewtonSolver:
    """Nullspace-augmented PCG (``aug_PCG.m``, ``inner_solver=3``).

    Solves the bordered system ``[[Y^T QK Y, Y^T QK], [QK Y, Ae]]`` where
    ``Y`` is the component indicator matrix — realized matrix-free through
    segment reductions on the component labels, with the coarse unknowns
    carried at their component-root positions of an N-padded vector.
    """
    n = q.shape[0]

    def solve(S, tvec, bk1, tk, rhs, key) -> NewtonSolveResult:
        del key
        E, g, kdiag, f, q0 = _transform(S, tvec, bk1, tk, rhs, p, q)
        N = g.shape[0]
        labels, _, ncomp = _component_info(E, kdiag)
        roots = labels == jnp.arange(N, dtype=labels.dtype)
        qp2 = jnp.concatenate([q * q, p * p])
        qk = bk1 * qp2 + kdiag / tk  # diag of QK = bk1*Q + K/tk
        inv_tk = 1.0 / tk

        def ae_mv(v):
            v1, v2 = v[:n], v[n:]
            o1 = g[:n] * v1 - inv_tk * (E.T @ v2)
            o2 = g[n:] * v2 - inv_tk * (E @ v1)
            return jnp.concatenate([o1, o2])

        def aug_mv(x):
            U, u = x[:N], x[N:]
            Yu = U[labels]  # (Y U) expanded to nodes
            top = jax.ops.segment_sum(qk * (Yu + u), labels,
                                      num_segments=N)
            top = jnp.where(roots, top, U)  # identity on padding rows
            bot = qk * Yu + ae_mv(u)
            return jnp.concatenate([top, bot])

        seg_qk = jax.ops.segment_sum(qk, labels, num_segments=N)
        diag_top = jnp.where(roots, seg_qk, 1.0)
        diag_aug = jnp.concatenate([diag_top, g])
        aug_f = jnp.concatenate(
            [jnp.where(roots,
                       jax.ops.segment_sum(f, labels, num_segments=N),
                       0.0), f])
        r = pcg(aug_mv, aug_f, lambda v: v / diag_aug,
                retol=opts.retol, maxit=opts.maxit)
        U, u = r.x[:N], r.x[N:]
        zeta = q0 * (U[labels] + u)
        return NewtonSolveResult(zeta, r.iters, r.res, ncomp, jnp.int32(0))

    return solve


def make_direct_solver(p: jax.Array, q: jax.Array) -> NewtonSolver:
    """Dense direct solve of ``Jk zeta = rhs`` (``inner_solver=1``,
    ``Class1/APD_SsN_Class1.m:143-145``) — materializes the (n+m)^2 KKT
    matrix; Cholesky on the MXU.  Intended for oracles/small systems."""
    n = q.shape[0]
    m = p.shape[0]

    def solve(S, tvec, bk1, tk, rhs, key) -> NewtonSolveResult:
        del key
        from otamg.ot import operators as op

        d1, d2 = op.asat_diags(S, p, q)
        off = (q[:, None] * S.T) * p[None, :]  # diag(q) Y^T diag(p), (n,m)
        H0 = jnp.block([[jnp.diag(d1), off], [off.T, jnp.diag(d2)]])
        Jk = bk1 * jnp.eye(n + m, dtype=S.dtype) \
            + (jnp.diag(tvec) + H0) / tk
        zeta = jax.scipy.linalg.solve(Jk, rhs, assume_a="pos")
        one = jnp.int32(1)
        return NewtonSolveResult(zeta, one, jnp.asarray(0.0, S.dtype),
                                 jnp.int32(0), jnp.int32(0))

    return solve
