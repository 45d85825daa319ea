"""Pallas block-fetch kernels: per-macroblock 2D gathers via DMA.

XLA lowers per-row composite gathers poorly on TPU (~25 ms for 8160 16x16
blocks at 1080p). These kernels issue one strided DMA per block from the
plane (kept in ANY/HBM) into the VMEM output tile, with scalar-prefetched
block coordinates, overlapping many DMAs per grid step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fetch_kernel(tile, bh, bw, bx_ref, by_ref, plane_ref, out_ref, sems):
    i = pl.program_id(0)

    def dma(t):
        k = i * tile + t
        return pltpu.make_async_copy(
            plane_ref.at[pl.ds(by_ref[k], bh), pl.ds(bx_ref[k], bw)],
            out_ref.at[t], sems.at[t])

    for t in range(tile):
        dma(t).start()
    for t in range(tile):
        dma(t).wait()


@functools.partial(jax.jit, static_argnames=("bh", "bw", "tile"))
def fetch_blocks(plane, bx, by, *, bh, bw, tile=16):
    """Gathers (N, bh, bw) windows from `plane` at clipped (bx, by)."""
    height, width = plane.shape
    n = bx.shape[0]
    assert n % tile == 0, (n, tile)
    bx = jnp.clip(bx, 0, width - bw).astype(jnp.int32)
    by = jnp.clip(by, 0, height - bh).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile, bh, bw), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((tile,))],
    )
    return pl.pallas_call(
        functools.partial(_fetch_kernel, tile, bh, bw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, bh, bw), plane.dtype),
    )(bx, by, plane)


def _fetch3_kernel(tile, bh, bw, slot_ref, bx_ref, by_ref, stack_ref,
                   out_ref, sems):
    i = pl.program_id(0)

    def dma(t):
        k = i * tile + t
        return pltpu.make_async_copy(
            stack_ref.at[slot_ref[k], pl.ds(by_ref[k], bh), pl.ds(bx_ref[k], bw)],
            out_ref.at[t], sems.at[t])

    for t in range(tile):
        dma(t).start()
    for t in range(tile):
        dma(t).wait()


@functools.partial(jax.jit, static_argnames=("bh", "bw", "tile"))
def fetch_blocks_ring(stack, slot, bx, by, *, bh, bw, tile=16):
    """Gathers (N, bh, bw) windows from a (R, H, W) ring `stack` with a
    per-block ring slot index."""
    _, height, width = stack.shape
    n = bx.shape[0]
    assert n % tile == 0, (n, tile)
    bx = jnp.clip(bx, 0, width - bw).astype(jnp.int32)
    by = jnp.clip(by, 0, height - bh).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile, bh, bw), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((tile,))],
    )
    return pl.pallas_call(
        functools.partial(_fetch3_kernel, tile, bh, bw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, bh, bw), stack.dtype),
    )(slot.astype(jnp.int32), bx, by, stack)
