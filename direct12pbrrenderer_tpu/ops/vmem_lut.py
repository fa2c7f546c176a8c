"""VMEM lookup-table primitive — the proven foundation of the round-2
software texture cache.

Per-pixel random lookups into a VMEM-resident table, implemented as segmented
lane-wise `dynamic_gather`s: the table is split into 128-entry segments; each
segment is broadcast across sublanes and gathered with
`jnp.take_along_axis(axis=1)` (which Mosaic lowers to `tpu.dynamic_gather`),
then selected by segment id. All taps of a tile are batched into one big
sublane block so the per-op overhead amortizes.

Measured on the v5e (device-resident data, forced readback): the equivalent
of 675 tiles x 10 texture taps x 3072 pixels against 4096-entry tables runs
in **~47 ms**, vs ~730 ms for the same taps as XLA HBM gathers — with the
table staged per tile (the texture-cache region DMA), this is the mechanism
that removes the renderer's dominant cost. See docs/PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 128  # dynamic_gather lane width


def lut_lookup(table_seg, idx):
    """In-kernel helper: table_seg (n_seg, 128) flat table; idx (..., 128)
    int32 flat indices in [0, n_seg*128) -> gathered values, same shape as idx.

    Call from inside a Pallas kernel with VMEM-resident operands."""
    n_seg = table_seg.shape[0]
    seg = idx >> 7
    lane = idx & (SEG - 1)
    acc = jnp.zeros(idx.shape, table_seg.dtype)
    for s in range(n_seg):
        x = jnp.broadcast_to(table_seg[s, :][None, :], idx.shape)
        g = jnp.take_along_axis(x, lane, axis=1)
        acc = jnp.where(seg == s, g, acc)
    return acc


def _kernel(table_ref, idx_ref, out_ref):
    out_ref[0] = lut_lookup(table_ref[:, :], idx_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_lut_lookup(table, idx, interpret: bool = False):
    """(n_seg, 128) table, (n_blocks, rows, 128) indices -> gathered values.

    Standalone driver for tests/benchmarks; production use inlines
    `lut_lookup` into the texture-cache kernel after the region DMA."""
    n_blocks, rows, lanes = idx.shape
    assert lanes == SEG
    return pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct(idx.shape, table.dtype),
        in_specs=[
            pl.BlockSpec(table.shape, lambda t: (0, 0)),
            pl.BlockSpec((1, rows, lanes), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda t: (t, 0, 0)),
        interpret=interpret,
    )(table, idx)
