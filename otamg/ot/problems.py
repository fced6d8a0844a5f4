"""Problem containers, ``.mat`` ingest and synthetic generators.

The reference ships two fixtures (``Class1/InputData/data1-500.mat``,
``Class2/InputData/data4-500.mat``) and loads them with MATLAB ``load``
(``Class1/APD_SsN_Class1.m:27``, ``Class2/APD_SsN_Class2.m:20``); the
1000x1000 variants are stripped from the snapshot, so :func:`random_class1`
/ :func:`random_class2` regenerate problems of any size following the
commented recipes in the drivers (``Class2/APD_SsN_Class2.m:13-18``:
uniform cost, uniform marginals, unit weights, ``mu = rand * min(<r,q>,
<l,p>)``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Class1Problem:
    """OT / assignment / capacity-constrained transport:
    ``min <c,x> s.t. A x = b, 0 <= x <= gama``
    (reference ``Class1/APD_SsN_Class1.m:1-11``).

    ``C`` and ``Gama`` are the ``(m, n)`` matrix forms of the vectorised
    ``c``/``gama`` (MATLAB vec is column-major).  ``b = [r; l]`` with the
    ``n``-block first.
    """

    C: Any      # (m, n) cost
    r: Any      # (n,) column marginal
    l: Any      # (m,) row marginal
    p: Any      # (m,) row weights
    q: Any      # (n,) column weights
    gama: Any   # scalar or (m, n) capacity (inf = plain OT)

    @property
    def m(self) -> int:
        return self.C.shape[0]

    @property
    def n(self) -> int:
        return self.C.shape[1]

    @property
    def b(self):
        return jnp.concatenate([self.r, self.l])

    def astype(self, dtype):
        cast = lambda a: jnp.asarray(a, dtype=dtype)
        return Class1Problem(C=cast(self.C), r=cast(self.r), l=cast(self.l),
                             p=cast(self.p), q=cast(self.q),
                             gama=cast(self.gama))


# Problems are jit-traceable pytrees so the solvers can take them as
# ARGUMENTS instead of closing over them — required for multi-process
# execution (jit closures over non-addressable global arrays are
# rejected; passing them as args is the supported path).
def _register_problem(cls, fields):
    jax.tree_util.register_dataclass(cls, data_fields=list(fields),
                                     meta_fields=[])


@dataclasses.dataclass(frozen=True)
class Class2Problem:
    """Partial OT: ``min <c,x> s.t. G x + IY y + IZ z = b, x,y,z >= 0``
    with ``G = [A; phi^T]`` and mass budget ``mu``
    (reference ``Class2/APD_SsN_Class2.m:1-8``)."""

    C: Any      # (m, n) cost
    r: Any      # (n,)
    l: Any      # (m,)
    p: Any      # (m,)
    q: Any      # (n,)
    Phi: Any    # (m, n) budget weights (the reference uses all-ones)
    mu: Any     # scalar mass budget

    @property
    def m(self) -> int:
        return self.C.shape[0]

    @property
    def n(self) -> int:
        return self.C.shape[1]

    @property
    def b(self):
        return jnp.concatenate([self.r, self.l, jnp.reshape(self.mu, (1,))])

    def astype(self, dtype):
        cast = lambda a: jnp.asarray(a, dtype=dtype)
        return Class2Problem(C=cast(self.C), r=cast(self.r), l=cast(self.l),
                             p=cast(self.p), q=cast(self.q),
                             Phi=cast(self.Phi), mu=cast(self.mu))


_register_problem(Class1Problem, ("C", "r", "l", "p", "q", "gama"))
_register_problem(Class2Problem, ("C", "r", "l", "p", "q", "Phi", "mu"))


def _unvec(x: np.ndarray, m: int, n: int) -> np.ndarray:
    """MATLAB column-major ``vec^{-1}``."""
    return np.asarray(x).reshape((m, n), order="F")


def _validate_weights(p, q) -> None:
    """Reference guard: the Q0 similarity transform divides by ``p``/``q``
    entries, so zero weights are rejected at ingest (``Hybrid_AMG.m:19``,
    ``aug_PCG.m:18``: "there exists zero elements in p or q!")."""
    if np.any(np.asarray(p) == 0) or np.any(np.asarray(q) == 0):
        raise ValueError("there exist zero elements in p or q "
                         "(reference Hybrid_AMG.m:19)")


def load_class1_mat(path: str, dtype=jnp.float64) -> Class1Problem:
    """Ingest a reference ``data1-*.mat`` fixture (keys ``c, gama, l, m, n,
    p, q, r``)."""
    import scipy.io as sio

    d = sio.loadmat(path)
    m = int(np.asarray(d["m"]).squeeze())
    n = int(np.asarray(d["n"]).squeeze())
    _validate_weights(d["p"], d["q"])
    return Class1Problem(
        C=jnp.asarray(_unvec(d["c"], m, n), dtype=dtype),
        r=jnp.asarray(d["r"].ravel(), dtype=dtype),
        l=jnp.asarray(d["l"].ravel(), dtype=dtype),
        p=jnp.asarray(d["p"].ravel(), dtype=dtype),
        q=jnp.asarray(d["q"].ravel(), dtype=dtype),
        gama=jnp.asarray(_unvec(d["gama"], m, n), dtype=dtype),
    )


def load_class2_mat(path: str, dtype=jnp.float64) -> Class2Problem:
    """Ingest a reference ``data4-*.mat`` fixture (adds ``phi, mu``)."""
    import scipy.io as sio

    d = sio.loadmat(path)
    m = int(np.asarray(d["m"]).squeeze())
    n = int(np.asarray(d["n"]).squeeze())
    _validate_weights(d["p"], d["q"])
    return Class2Problem(
        C=jnp.asarray(_unvec(d["c"], m, n), dtype=dtype),
        r=jnp.asarray(d["r"].ravel(), dtype=dtype),
        l=jnp.asarray(d["l"].ravel(), dtype=dtype),
        p=jnp.asarray(d["p"].ravel(), dtype=dtype),
        q=jnp.asarray(d["q"].ravel(), dtype=dtype),
        Phi=jnp.asarray(_unvec(d["phi"], m, n), dtype=dtype),
        mu=jnp.asarray(np.asarray(d["mu"]).squeeze(), dtype=dtype),
    )


def random_class1(key: jax.Array, m: int, n: int, dtype=jnp.float64,
                  balanced: bool = True, gama=np.inf) -> Class1Problem:
    """Synthetic OT instance matching the fixture distribution: uniform
    cost/marginals, unit weights, marginals rescaled to equal mass."""
    kc, kr, kl = jax.random.split(key, 3)
    C = jax.random.uniform(kc, (m, n), dtype=dtype)
    r = jax.random.uniform(kr, (n,), dtype=dtype)
    l = jax.random.uniform(kl, (m,), dtype=dtype)
    if balanced:
        l = l * (jnp.sum(r) / jnp.sum(l))
    return Class1Problem(C=C, r=r, l=l,
                         p=jnp.ones((m,), dtype), q=jnp.ones((n,), dtype),
                         gama=jnp.asarray(gama, dtype))


def assignment_problem(key: jax.Array, n: int,
                       dtype=jnp.float64) -> Class1Problem:
    """Assignment problem (reference header case 1,
    ``Class1/APD_SsN_Class1.m:12``): ``gama = inf, r = 1_n, l = 1_m``."""
    C = jax.random.uniform(key, (n, n), dtype=dtype)
    ones = jnp.ones((n,), dtype)
    return Class1Problem(C=C, r=ones, l=ones, p=ones, q=ones,
                         gama=jnp.asarray(np.inf, dtype))


def capacitated_problem(key: jax.Array, m: int, n: int,
                        cap_scale: float = 2.0,
                        dtype=jnp.float64) -> Class1Problem:
    """Capacity-constrained mass transport (reference header case 3,
    ``Class1/APD_SsN_Class1.m:14``): finite elementwise capacity set to
    ``cap_scale`` times the product-coupling level, so it binds."""
    base = random_class1(key, m, n, dtype=dtype)
    mass = jnp.sum(base.r)
    level = jnp.max(jnp.outer(base.l, base.r)) / mass
    return Class1Problem(C=base.C, r=base.r, l=base.l, p=base.p, q=base.q,
                         gama=jnp.full((m, n), cap_scale * level, dtype))


def random_class2(key: jax.Array, m: int, n: int, dtype=jnp.float64,
                  mu_frac: float | None = None) -> Class2Problem:
    """Synthetic partial-OT instance (recipe of
    ``Class2/APD_SsN_Class2.m:13-18``)."""
    kc, kr, kl, km = jax.random.split(key, 4)
    C = jax.random.uniform(kc, (m, n), dtype=dtype)
    r = jax.random.uniform(kr, (n,), dtype=dtype)
    l = jax.random.uniform(kl, (m,), dtype=dtype)
    p = jnp.ones((m,), dtype)
    q = jnp.ones((n,), dtype)
    cap = jnp.minimum(jnp.vdot(r, q), jnp.vdot(l, p))
    frac = (jax.random.uniform(km, (), dtype=dtype)
            if mu_frac is None else jnp.asarray(mu_frac, dtype))
    return Class2Problem(C=C, r=r, l=l, p=p, q=q,
                         Phi=jnp.ones((m, n), dtype), mu=frac * cap)
