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
    """Matrix-free Jacobi-PCG on ``Jk`` (reference ``inner_solver=2`` with
    the ``ASAtz`` operator twist; Jacobi is the reference default
    preconditioner, ``PCG.m:23``)."""

    def solve(S, tvec, bk1, tk, rhs, key=None) -> NewtonSolveResult:
        del key
        d1, d2 = op.asat_diags(S, p, q)
        diag = bk1 + (tvec + jnp.concatenate([d1, d2])) / tk

        def matvec(v):
            return bk1 * v + (tvec * v
                              + op.apply_asat(v, S, p, q, d1, d2)) / tk

        r = pcg(matvec, rhs, lambda v: v / diag,
                retol=opts.retol, maxit=opts.maxit)
        zero = jnp.int32(0)
        return NewtonSolveResult(r.x, r.iters, r.res, zero, zero)

    return solve
