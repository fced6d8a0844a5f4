"""Pallas TPU kernels for the sparse layer.

The design target (BASELINE.json): SpMV at >= 70% of the roofline nnz/s.
SpMV is bandwidth-bound — the roofline is set by streaming ``vals`` +
``cols`` once — so the kernels are organized to (a) stream the ELL arrays
through VMEM in row-block tiles, (b) keep the (small) input vector
resident in VMEM across the whole grid, and (c) gather on-chip.

``ell_spmv`` is the single-chip kernel; ``ell_spmv_xla`` is the reference
XLA path used for verification and as a fallback on platforms without
Mosaic.  The distributed row-partitioned SpMV with halo exchange lives in
:mod:`otamg.dist` (shard_map + psum over replicated input vectors — the
KKT vectors of this framework are tiny, so halos degenerate to a
broadcast; the general halo kernel is staged for when matrices outgrow
replication).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ell_spmv_xla(ell_cols, ell_vals, x):
    """Reference ELL SpMV: ``y_i = sum_r vals[i,r] * x[cols[i,r]]``."""
    return jnp.sum(ell_vals * x[ell_cols], axis=1)


def _spmv_kernel(cols_ref, vals_ref, x_ref, out_ref):
    cols = cols_ref[...]
    vals = vals_ref[...]
    x = x_ref[...]
    gathered = jnp.take(x, cols, axis=0, fill_value=0)
    out_ref[...] = jnp.sum(vals * gathered, axis=1)


def ell_spmv(ell_cols: jax.Array, ell_vals: jax.Array, x: jax.Array,
             block_rows: int = 256, interpret: bool = False) -> jax.Array:
    """Pallas ELL SpMV: grid over row blocks; ``x`` stays resident in VMEM
    for every block; ``cols``/``vals`` stream through once (the roofline
    traffic)."""
    nr, cap = ell_cols.shape
    nb = -(-nr // block_rows)
    pad = nb * block_rows - nr
    if pad:
        ell_cols = jnp.pad(ell_cols, ((0, pad), (0, 0)))
        ell_vals = jnp.pad(ell_vals, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _spmv_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * block_rows,), ell_vals.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, cap), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block_rows, cap), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(x.shape, lambda i: (0,),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows,), lambda i: (i,),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(ell_cols, ell_vals, x)
    return out[:nr]


def bipartite_gs_sweep_xla(E, g, inv_tk, r1, r2):
    """One fused block Gauss-Seidel sweep on the bipartite fine level —
    the hottest smoothing op.  XLA fuses the diagonal scalings into the
    two GEMVs; kept here as the tuning point for a future fully-fused
    Pallas variant that streams ``E`` once instead of twice."""
    e1 = r1 / g[: r1.shape[0]]
    e2 = (r2 + inv_tk * (E @ e1)) / g[r1.shape[0]:]
    return e1, e2
