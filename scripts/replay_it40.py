"""Replay the it=40 first Newton system from a captured state: run the
fp32 hybrid AMG solve on it and report the refinement behavior."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from otamg.config import AMGOptions
from otamg.hybrid.solver import build_he_solver
from otamg.ot import load_class1_mat
from otamg.ot import operators as op

prob = load_class1_mat("/root/reference/Class1/InputData/data1-500.mat")
d = np.load(os.environ.get("OTAMG_STATE_IN", "/tmp/state39.npz"))
X = jnp.asarray(d["X"])          # fp32
V = jnp.asarray(d["V"])
lam = jnp.asarray(d["lam"])      # f64
bk = jnp.asarray(d["bk"])        # fp32 scalar
dtype = X.dtype
C, b, p, q, gama = prob.C, prob.b, prob.p, prob.q, prob.gama

k = jnp.asarray(40, jnp.int32).astype(dtype)
ak = jnp.sqrt(k ** 2 * bk)
bk1 = bk / (1 + ak)
tk = bk * (1 + ak) / ak ** 2
Wk = -C + bk * (X + ak * V) / ak ** 2
b_hi = b.astype(jnp.float64)
wlk = (bk1 * (lam - (op.apply_A(X, p, q, jnp.float64) - b_hi) / bk)
       - b_hi)
At_lam = op.apply_At(lam.astype(dtype), p, q)
Zk = (Wk - At_lam) / tk
S = jnp.logical_and(Zk >= 0, Zk <= gama).astype(dtype)
Fk = (bk1 * lam - op.apply_A(op.prox_box(Zk, gama), p, q,
                             jnp.float64).astype(jnp.float64) - wlk)
rhs = (-Fk).astype(dtype)
print(f"bk1={float(bk1):.3e} tk={float(tk):.3e} |S|={float(S.sum()):.0f} "
      f"|Fk|={float(jnp.linalg.norm(Fk)):.3e}", flush=True)

opts_kw = {}
ct = os.environ.get("OTAMG_COARSE_TARGET")
if ct:
    opts_kw["coarse_target"] = None if ct == "none" else int(ct)
amg_opts = AMGOptions(**opts_kw)
he, ncomp, _last = build_he_solver(S, jnp.zeros_like(rhs), jnp.asarray(bk1, dtype),
                            jnp.asarray(tk, dtype), p.astype(dtype),
                            q.astype(dtype), amg_opts, "float32", 10,
                            jnp.float64, jax.random.PRNGKey(7))
zeta, iters, rel = he(Fk * -1.0, jax.random.PRNGKey(8))
print(f"ncomp={int(ncomp)} he_solve: iters={int(iters)} "
      f"rel={float(rel):.3e}", flush=True)
