"""Pallas TPU kernels for the hot compute path.

The minimizer scan is a long chain of elementwise u32 ops over [B, L] arrays;
running it as one Pallas kernel keeps every intermediate in VMEM — one HBM
read of the codes and one write of the outputs, with the Mosaic compiler
scheduling the whole chain on the VPU (instead of trusting XLA fusion to
avoid materialising ~20 temporaries).

The kernel body literally reuses the pure-jnp implementation from
ops/minimizers.py — all its primitives (shifts, selects, doubling scans)
lower in Mosaic. `interpret=True` runs it on CPU for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .minimizers import MinimizerParams, WindowMinimizers, window_minimizers_impl
from .u64 import U64


def _scan_kernel(codes_ref, hi_ref, lo_ref, valid_ref, start_ref, distinct_ref, *, params):
    wm = window_minimizers_impl(codes_ref[:], params)
    hi_ref[:] = wm.minimizer.hi
    lo_ref[:] = wm.minimizer.lo
    valid_ref[:] = wm.valid.astype(jnp.uint8)
    start_ref[:] = wm.span_start.astype(jnp.uint8)
    distinct_ref[:] = wm.distinct.astype(jnp.uint8)


@partial(jax.jit, static_argnums=(1, 2, 3))
def window_minimizers_pallas(
    codes: jnp.ndarray,
    params: MinimizerParams,
    rows_per_block: int = 8,
    interpret: bool = False,
) -> WindowMinimizers:
    """Pallas version of window_minimizers; identical outputs."""
    params.validate()
    b, l = codes.shape
    rows_per_block = min(rows_per_block, b)
    grid = (pl.cdiv(b, rows_per_block),)
    spec = pl.BlockSpec((rows_per_block, l), lambda i: (i, 0))
    out_shapes = [
        jax.ShapeDtypeStruct((b, l), jnp.uint32),
        jax.ShapeDtypeStruct((b, l), jnp.uint32),
        jax.ShapeDtypeStruct((b, l), jnp.uint8),
        jax.ShapeDtypeStruct((b, l), jnp.uint8),
        jax.ShapeDtypeStruct((b, l), jnp.uint8),
    ]
    hi, lo, valid, start, distinct = pl.pallas_call(
        partial(_scan_kernel, params=params),
        grid=grid,
        in_specs=[spec],
        out_specs=[spec] * 5,
        out_shape=out_shapes,
        interpret=interpret,
    )(codes)
    return WindowMinimizers(
        minimizer=U64(hi, lo),
        valid=valid.astype(bool),
        span_start=start.astype(bool),
        distinct=distinct.astype(bool),
    )
