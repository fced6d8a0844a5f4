"""Determinism and finite-guard tests (SURVEY.md section 5.2: the build's
substitute for race detection — seeded randomness must make whole solves
reproducible)."""

import jax
import numpy as np

from otamg.config import APDOptions, InnerSolver
from otamg.opt import solve_class1
from otamg.ot import random_class1


def test_solve_bitwise_deterministic():
    prob = random_class1(jax.random.PRNGKey(9), 20, 16)
    opts = APDOptions(inner_solver=InnerSolver.AMG, maxit=15,
                      kkt_tol=1e-30, seed=123)
    r1 = solve_class1(prob, opts)
    r2 = solve_class1(prob, opts)
    np.testing.assert_array_equal(np.asarray(r1.X), np.asarray(r2.X))
    np.testing.assert_array_equal(np.asarray(r1.lam), np.asarray(r2.lam))
    np.testing.assert_array_equal(r1.kkt_l, r2.kkt_l)


def test_different_seed_different_randomness_same_answer():
    """Seeds change MIS tie-breaks and initial guesses but not the
    converged answer (tolerance-based reproducibility, SURVEY.md hard
    part (e))."""
    prob = random_class1(jax.random.PRNGKey(10), 20, 16)
    r1 = solve_class1(prob, APDOptions(inner_solver=InnerSolver.AMG,
                                       seed=1))
    r2 = solve_class1(prob, APDOptions(inner_solver=InnerSolver.AMG,
                                       seed=2))
    assert r1.converged and r2.converged
    np.testing.assert_allclose(r1.fxk[-1], r2.fxk[-1], rtol=1e-7)


def test_all_metrics_finite():
    prob = random_class1(jax.random.PRNGKey(11), 16, 12)
    res = solve_class1(prob, APDOptions(inner_solver=InnerSolver.AMG))
    assert np.isfinite(res.kkt_x).all()
    assert np.isfinite(res.kkt_l).all()
    assert np.isfinite(res.fxk).all()
