"""Pallas TPU kernel: feature-sparse local refinement.

The local pyramid refinement sums, per candidate, F small
(window x window) blocks of the space-to-depth response maps
(ops/similarity.py ``similarity_local_sparse``).  XLA lowers the vmapped
dynamic slices to a gather; this kernel streams the data instead:

- one grid program per candidate;
- per feature, a double-buffered async DMA brings the window ROWS of the
  feature's s2d channel from HBM into VMEM as a full (window, 128)-lane
  block (lane-aligned, unlike a 16-wide column slice);
- a dynamic ``pltpu.roll`` shifts the wanted columns to lane 0 and the
  VPU accumulates;
- block addresses arrive via scalar prefetch so every DMA is issued a
  feature ahead of its use.

The s2d maps' lane dimension is padded to a multiple of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


_ROW_ALIGN = 32  # HBM DMA row offsets must be tile-aligned


def _refine_kernel(window, num_feats, wbp, cidx_ref, by_ref, bx_ref, maps_hbm, out_ref):
    k = pl.program_id(0)
    rows = window + _ROW_ALIGN

    def body(scratch, acc, sem):
        def get_dma(slot, f):
            by_al = (by_ref[k, f] // _ROW_ALIGN) * _ROW_ALIGN
            return pltpu.make_async_copy(
                maps_hbm.at[cidx_ref[k, f], pl.ds(by_al, rows), :],
                scratch.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()
        acc[:] = jnp.zeros_like(acc)

        def loop(f, _):
            slot = f % 2

            @pl.when(f + 1 < num_feats)
            def _():
                get_dma((f + 1) % 2, f + 1).start()

            get_dma(slot, f).wait()
            vals = scratch[slot].astype(jnp.int32)
            dby = by_ref[k, f] % _ROW_ALIGN
            # roll with positive shifts only (left-shift by s == roll by n-s)
            shifted = pltpu.roll(
                pltpu.roll(vals, wbp - bx_ref[k, f], 1), rows - dby, 0
            )
            acc[:] = acc[:] + shifted[:window, :]
            return 0

        jax.lax.fori_loop(0, num_feats, loop, 0)
        out_ref[0] = acc[:, :window].astype(jnp.float32)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, rows, wbp), jnp.uint8),
        acc=pltpu.VMEM((window, wbp), jnp.int32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t", "window"))
def similarity_local_sparse_pallas(
    response_maps: jnp.ndarray,
    feats_sel: jnp.ndarray,
    valid_sel: jnp.ndarray,
    origins: jnp.ndarray,
    t: int,
    window: int = 16,
    scale: jnp.ndarray = None,
):
    """Drop-in for ops.similarity.similarity_local_sparse (same contract:
    returns (scores (K, window, window) f32, counts (K,) int32))."""
    from sixdpose_tpu.ops.similarity import _s2d_maps

    k, f = feats_sel.shape[:2]
    c = response_maps.shape[0]
    maps = _s2d_maps(response_maps, t)
    hb, wb = maps.shape[1:]
    # Pad: zero channel for invalid features, window rows below, and the
    # lane dim up to a multiple of 128 with window extra columns so the
    # roll window never wraps into data.
    wbp = -(-(wb + window) // _LANES) * _LANES
    rows_pad = -(-(hb + window + _ROW_ALIGN + 1) // _ROW_ALIGN) * _ROW_ALIGN
    pads = jnp.pad(maps, ((0, 1), (0, rows_pad - hb), (0, wbp - wb)))
    zero_ch = c * t * t

    x = feats_sel[..., 0].astype(jnp.float32)
    y = feats_sel[..., 1].astype(jnp.float32)
    if scale is not None:
        x = jnp.round(x * scale[:, None])
        y = jnp.round(y * scale[:, None])
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    ch = feats_sel[..., 2]
    ok = valid_sel & (xi >= 0) & (yi >= 0)
    cprime = ch * (t * t) + (yi % t) * t + (xi % t)
    by = origins[:, 0:1] // t + yi // t
    bx = origins[:, 1:2] // t + xi // t
    ok = ok & (by < hb) & (bx < wb)
    cprime = jnp.where(ok, cprime, zero_ch).astype(jnp.int32)
    by = jnp.clip(by, 0, hb - 1).astype(jnp.int32)
    bx = jnp.clip(bx, 0, wb - 1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, window, window), lambda kk, *_: (kk, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    scores = pl.pallas_call(
        functools.partial(_refine_kernel, window, f, wbp),
        out_shape=jax.ShapeDtypeStruct((k, window, window), jnp.float32),
        grid_spec=grid_spec,
    )(cprime, by, bx, pads)
    return scores, jnp.sum(ok, axis=1).astype(jnp.int32)
