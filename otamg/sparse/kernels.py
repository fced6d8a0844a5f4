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
    """Reference ELL SpMV: ``y_i = sum_r vals[i,r] * x[cols[i,r]]``.

    Out-of-range padding columns gather 0 (``mode='fill'``) — the same
    semantics as the Pallas kernel's validity masking, so the two paths
    agree even for callers whose padding violates the col-0/val-0
    invariant."""
    return jnp.sum(ell_vals * jnp.take(x, ell_cols, axis=0, mode="fill",
                                       fill_value=0),
                   axis=1)


def _spmv_kernel(cols_ref, vals_ref, x_ref, out_ref, *, n_chunks):
    # Mosaic's tpu.dynamic_gather has two hardware constraints: the index
    # array must have the same shape as the operand, and the gather
    # dimension must span a single vreg (<=128 lanes).  The grid therefore
    # tiles the ELL capacity into 128-wide index tiles (grid dim t) so the
    # cols/vals blocks arrive vreg-aligned, and the kernel sweeps the
    # source vector 128 lanes at a time, accumulating masked per-chunk
    # lane gathers into the revisited output block.  HBM traffic stays
    # cols+vals streamed once (Pallas skips the DMA when the block index
    # is unchanged across t).  Compute inflates by n/128 chunks, so this
    # kernel targets moderate row lengths (the KKT systems here are
    # m+n ~ 1e3-1e4); bigger n wants a banded/sorted variant.
    t = pl.program_id(1)
    cols = cols_ref[...]
    vals = vals_ref[...]
    b = cols.shape[0]

    @pl.when(t == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # Trace with x64 off: under jax_enable_x64 take_along_axis builds
    # int64 iota indices internally, and Mosaic's i64 emulation recurses
    # past Python's stack limit during lowering.  Operands here are
    # f32/i32 regardless, so this only pins the internal index dtype.
    #
    # The chunk sweep is UNROLLED at trace time (IR grows as n/128): a
    # fori_loop + dynamic-sublane-slice variant was tried for O(1) IR but
    # the axon remote Mosaic compiler rejects it (tpu_compile_helper
    # exit 1, round-3 KERNELS_tpu run); the unrolled form is the one
    # validated on the chip (rel_err 1.5e-7 vs the XLA oracle).
    x = x_ref[...]
    with jax.enable_x64(False):
        g = jnp.zeros((b, 128), vals.dtype)
        for c in range(n_chunks):
            chunk = jnp.broadcast_to(x[c:c + 1, :], (b, 128))
            local = cols - c * 128
            valid = (local >= 0) & (local < 128)
            safe = jnp.where(valid, local, 0)
            g = jnp.where(valid,
                          jnp.take_along_axis(chunk, safe, axis=1), g)
        out_ref[...] += jnp.sum(vals * g, axis=1, keepdims=True)


def ell_spmv(ell_cols: jax.Array, ell_vals: jax.Array, x: jax.Array,
             block_rows: int = 256, interpret: bool = False) -> jax.Array:
    """Pallas ELL SpMV: grid over (row blocks, 128-wide capacity tiles);
    ``x`` stays resident in VMEM for every block; ``cols``/``vals`` stream
    through once (the roofline traffic)."""
    nr, cap = ell_cols.shape
    n = x.shape[0]
    if jax.default_backend() == "cpu" and not interpret:
        # Mosaic compiles for TPU only; CPU callers get the XLA oracle
        # (or pass interpret=True explicitly for kernel debugging).
        return ell_spmv_xla(ell_cols, ell_vals, x)
    if cap >= n:  # denser than ELL pays for
        return ell_spmv_xla(ell_cols, ell_vals, x)
    if jnp.dtype(ell_vals.dtype).itemsize == 8 or \
            jnp.dtype(x.dtype).itemsize == 8:
        return ell_spmv_xla(ell_cols, ell_vals, x)  # Mosaic has no f64
    # int64 indices (jax_enable_x64) trip Mosaic's i64 emulation into a
    # RecursionError during lowering; i32 always suffices for row lengths.
    ell_cols = ell_cols.astype(jnp.int32)
    nb = -(-nr // block_rows)
    pad = nb * block_rows - nr
    nt = -(-cap // 128)                 # cap tiles of 128 for the gather
    capp = nt * 128 - cap
    if pad or capp:
        ell_cols = jnp.pad(ell_cols, ((0, pad), (0, capp)))
        ell_vals = jnp.pad(ell_vals, ((0, pad), (0, capp)))
    nc = -(-n // 128)                   # 128-lane source chunks
    x2 = jnp.pad(x, (0, nc * 128 - n)).reshape(nc, 128)
    return _pallas_spmv(ell_cols, ell_vals, x2, nr, nb, nt, nc,
                        block_rows, interpret)


def _pallas_spmv(ell_cols, ell_vals, x2, nr, nb, nt, nc, block_rows,
                 interpret):
    # Trace the pallas_call itself with x64 OFF: under jax_enable_x64 the
    # grid/index bookkeeping picks up i64 scalars and the axon remote
    # Mosaic AOT helper crashes (HTTP 500, round-3 KERNELS_tpu run); the
    # operands are f32/i32 either way, so the context only pins internal
    # index dtypes.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_spmv_kernel, n_chunks=nc),
            out_shape=jax.ShapeDtypeStruct((nb * block_rows, 1),
                                           ell_vals.dtype),
            grid=(nb, nt),
            in_specs=[
                pl.BlockSpec((block_rows, 128), lambda i, t: (i, t),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM),
                pl.BlockSpec((block_rows, 128), lambda i, t: (i, t),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM),
                pl.BlockSpec(x2.shape, lambda i, t: (0, 0),
                             memory_space=pl.ANY if interpret
                             else pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, 1), lambda i, t: (i, 0),
                                   memory_space=pl.ANY if interpret
                                   else pltpu.VMEM),
            interpret=interpret,
        )(ell_cols, ell_vals, x2)
    return out[:nr, 0]
