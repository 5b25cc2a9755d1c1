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
    # Mosaic can't lower i8 vector comparisons ("Target does not support
    # this comparison" on vector<...xi8> cmpi); widen codes to i32 at entry
    # so every compare in the scan chain is 32-bit.
    wm = window_minimizers_impl(codes_ref[:].astype(jnp.int32), params)
    hi_ref[:] = wm.minimizer.hi
    lo_ref[:] = wm.minimizer.lo
    # masks leave the kernel as i32 selects: Mosaic rejects the i1->i8/i32
    # vreg bitcasts that .astype() on a bool vector produces
    one, zero = jnp.int32(1), jnp.int32(0)
    valid_ref[:] = jnp.where(wm.valid, one, zero)
    start_ref[:] = jnp.where(wm.span_start, one, zero)
    distinct_ref[:] = jnp.where(wm.distinct, one, zero)


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
        jax.ShapeDtypeStruct((b, l), jnp.int32),
        jax.ShapeDtypeStruct((b, l), jnp.int32),
        jax.ShapeDtypeStruct((b, l), jnp.int32),
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


# ---------------------------------------------------------------------------
# Experimental: block-DMA index probe
# ---------------------------------------------------------------------------

import jax.numpy as _jnp
import numpy as _np
from jax.experimental.pallas import tpu as pltpu

PROBE_BLOCK = 128  # keys per DMA block (1 KB of key limbs)


def build_fence(keys_hi: _np.ndarray, keys_lo: _np.ndarray, block: int = PROBE_BLOCK):
    """VMEM-resident fence: the first key of every `block`-aligned run of the
    sorted key array (padded with the max key). N/block entries — ~64K u64
    for an 8M-key shard, comfortably within VMEM."""
    n = len(keys_hi)
    n_blocks = -(-n // block)
    idx = _np.minimum(_np.arange(n_blocks) * block, n - 1)
    return keys_hi[idx].astype(_np.uint32), keys_lo[idx].astype(_np.uint32), n_blocks


def _probe_kernel(
    q_hi_ref, q_lo_ref, fence_hi_ref, fence_lo_ref, keys_hi_hbm, keys_lo_hbm,
    taxa_hbm, out_ref, scratch_hi, scratch_lo, scratch_tax, sems, *, n_keys, block
):
    """For each query in the block: binary-search the fence (VMEM) for its
    key block, DMA the block's keys + taxa from HBM, and scan it vectorised.
    DMAs are pipelined across a small slot ring."""
    nq = q_hi_ref.shape[0]
    n_blocks = fence_hi_ref.shape[0]
    n_slots = scratch_hi.shape[0]

    def fence_search(qh, ql):
        # last fence entry <= query  (entries sorted ascending)
        lo = jnp.int32(0)
        hi = jnp.int32(n_blocks)
        # ceil(log2(n_blocks)) rounds; static bound
        rounds = max(1, int(_np.ceil(_np.log2(max(2, n_blocks)))))
        def body(_, carry):
            lo, hi = carry
            mid = (lo + hi + 1) // 2
            m = jnp.minimum(mid, n_blocks - 1)
            fh = fence_hi_ref[m]
            fl = fence_lo_ref[m]
            le = (fh < qh) | ((fh == qh) & (fl <= ql))
            return jax.lax.cond(
                le & (mid < n_blocks), lambda: (mid, hi), lambda: (lo, mid - 1)
            )
        lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
        return lo

    def start_dma(qi, slot):
        qh = q_hi_ref[qi]
        ql = q_lo_ref[qi]
        b = fence_search(qh, ql)
        start = b * block
        pltpu.make_async_copy(
            keys_hi_hbm.at[pl.ds(start, block)], scratch_hi.at[slot], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            keys_lo_hbm.at[pl.ds(start, block)], scratch_lo.at[slot], sems.at[slot, 1]
        ).start()
        pltpu.make_async_copy(
            taxa_hbm.at[pl.ds(start, block)], scratch_tax.at[slot], sems.at[slot, 2]
        ).start()
        return start

    def wait_dma(slot, start):
        pltpu.make_async_copy(
            keys_hi_hbm.at[pl.ds(start, block)], scratch_hi.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            keys_lo_hbm.at[pl.ds(start, block)], scratch_lo.at[slot], sems.at[slot, 1]
        ).wait()
        pltpu.make_async_copy(
            taxa_hbm.at[pl.ds(start, block)], scratch_tax.at[slot], sems.at[slot, 2]
        ).wait()

    # warm up the slot ring
    starts0 = jnp.zeros((n_slots,), jnp.int32)
    def warm(i, starts):
        s = start_dma(jnp.minimum(i, nq - 1), i)
        return starts.at[i].set(s)
    starts0 = jax.lax.fori_loop(0, n_slots, warm, starts0)

    def body(qi, starts):
        slot = qi % n_slots
        wait_dma(slot, starts[slot])
        qh = q_hi_ref[qi]
        ql = q_lo_ref[qi]
        kh = scratch_hi[slot]
        kl = scratch_lo[slot]
        tx = scratch_tax[slot]
        eq = (kh == qh) & (kl == ql)
        taxon = jnp.max(jnp.where(eq, tx, 0))
        out_ref[qi] = taxon
        nxt = qi + n_slots
        s = jax.lax.cond(
            nxt < nq, lambda: start_dma(nxt, slot), lambda: starts[slot]
        )
        return starts.at[slot].set(s)

    jax.lax.fori_loop(0, nq, body, starts0)


def lookup_taxa_dma(
    keys_hi, keys_lo, taxa, fence_hi, fence_lo, q_hi, q_lo,
    block: int = PROBE_BLOCK, n_slots: int = 8, interpret: bool = False
):
    """EXPERIMENTAL Pallas probe: per-query block DMA instead of per-round
    gathers. Correctness is locked by tests in interpret mode; compiled-path
    benchmarking against the gather-based probe is pending real-TPU access
    (see STATUS.md). Misses return 0.
    """
    n_keys = keys_hi.shape[0]
    nq = q_hi.shape[0]
    kernel = partial(_probe_kernel, n_keys=n_keys, block=block)
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # queries hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # queries lo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fence hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fence lo
            pl.BlockSpec(memory_space=pl.ANY),  # keys hi (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # keys lo (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # taxa (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq,), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_slots, block), jnp.uint32),
            pltpu.VMEM((n_slots, block), jnp.uint32),
            pltpu.VMEM((n_slots, block), jnp.int32),
            pltpu.SemaphoreType.DMA((n_slots, 3)),
        ],
        interpret=interpret,
    )(q_hi, q_lo, fence_hi, fence_lo, keys_hi, keys_lo, taxa)
