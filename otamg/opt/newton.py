"""Newton-system solvers for the SsN subproblem (bridging layers L6 and L4).

Each SsN step solves the generalized-Jacobian system

.. math::

    J_k \\zeta = -F_k,\\qquad
    J_k = b_{k+1} I + \\tfrac{1}{t_k}\\bigl(\\mathrm{diag}(t) + A\\,
    \\mathrm{diag}(s)\\,A^T\\bigr)

(reference ``Class1/APD_SsN_Class1.m:143-147``).  A solver is a closure

    ``solve(S, tvec, bk1, tk, rhs, key) -> NewtonSolveResult``

with ``S`` the ``(m, n)`` active-set mask and ``tvec`` the ``(n+m,)``
diagonal (zero for Class 1, ``Class1/APD_SsN_Class1.m:140``).  Solvers in
this module are the Krylov family (``inner_solver`` 2 of the reference
menu, ``Class1/APD_SsN_Class1.m:66-71``); the AMG/hybrid family lives in
:mod:`otamg.hybrid`.

The default here improves on the reference's ``inner_solver=2``: instead of
assembling the sparse ``Jk`` it applies it matrix-free through two masked
GEMVs (:func:`otamg.ot.operators.apply_asat`) with the closed-form Jacobi
diagonal — the operator form the reference left dead in ``ASAtz.m``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from otamg.config import PCGOptions
from otamg.krylov.pcg import pcg
from otamg.ot import operators as op


class NewtonSolveResult(NamedTuple):
    zeta: jax.Array
    iters: jax.Array      # iteration count of the inner solver
    res: jax.Array        # relative residual reached
    ncomp: jax.Array      # info[0]: number of graph components (0 if n/a)
    last: jax.Array       # info[1]: last large-component index (0 if n/a)


NewtonSolver = Callable[..., NewtonSolveResult]


def make_pcg_solver(p: jax.Array, q: jax.Array,
                    opts: PCGOptions = PCGOptions()) -> NewtonSolver:
    """Matrix-free PCG on ``Jk`` (reference ``inner_solver=2`` with the
    ``ASAtz`` operator twist; Jacobi is the reference default
    preconditioner, ``PCG.m:23``).

    ``opts.precd`` selects NONE, JACOBI or BI_SSOR — the three menu
    entries (``PCG.m:34-66``) that admit a matrix-free form on the
    bipartite block structure ``Jk = [[V, U], [U^T, T]]`` (``V``/``T``
    diagonal, ``U = diag(q) Y^T diag(p) / tk``).  SSOR/ICHOL need the
    assembled matrix; use :func:`otamg.krylov.pcg.pcg_matrix` for those.
    """
    from otamg.config import Preconditioner

    if opts.precd in (Preconditioner.SSOR, Preconditioner.ICHOL):
        raise ValueError(
            f"{opts.precd} needs the assembled matrix; the matrix-free "
            "Newton PCG supports NONE/JACOBI/BI_SSOR (use pcg_matrix for "
            "SSOR/ICHOL)")
    n = q.shape[0]
    _P = jax.lax.Precision.HIGHEST

    def solve(S, tvec, bk1, tk, rhs, key=None) -> NewtonSolveResult:
        del key
        d1, d2 = op.asat_diags(S, p, q)
        diag = bk1 + (tvec + jnp.concatenate([d1, d2])) / tk

        def matvec(v):
            return bk1 * v + (tvec * v
                              + op.apply_asat(v, S, p, q, d1, d2)) / tk

        if opts.precd == Preconditioner.NONE:
            precond = lambda r: r
        elif opts.precd == Preconditioner.BI_SSOR:
            # Explicit bipartite-SSOR inverse (``PCG.m:55-66``), matrix-
            # free: the off-diagonal block application is two masked GEMVs.
            omega = opts.omega
            scale = omega * (2.0 - omega)
            invV = 1.0 / diag[:n]
            invT = 1.0 / diag[n:]

            def U_mv(r2):   # (m,) -> (n,)
                return q * jnp.matmul(S.T, p * r2, precision=_P) / tk

            def Ut_mv(r1):  # (n,) -> (m,)
                return p * jnp.matmul(S, q * r1, precision=_P) / tk

            def precond(r):
                r1, r2 = r[:n], r[n:]
                t = Ut_mv(invV * r1)
                p1 = (invV * r1
                      + omega ** 2 * invV * U_mv(invT * t)
                      - omega * invV * U_mv(invT * r2))
                p2 = -omega * invT * t + invT * r2
                return scale * jnp.concatenate([p1, p2])
        else:
            precond = lambda v: v / diag

        r = pcg(matvec, rhs, precond, retol=opts.retol, maxit=opts.maxit)
        zero = jnp.int32(0)
        return NewtonSolveResult(r.x, r.iters, r.res, zero, zero)

    return solve
