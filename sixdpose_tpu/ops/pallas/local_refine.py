"""Pallas TPU kernel: feature-sparse local refinement.

The local pyramid refinement sums, per candidate, F small
(window x window) blocks of the space-to-depth response maps
(ops/similarity.py ``similarity_local_sparse``).  XLA lowers the vmapped
dynamic slices to a gather; this kernel streams the data instead:

- one grid program per candidate;
- per feature, a deep-pipelined async DMA brings the window rows of the
  feature's s2d channel from HBM into VMEM;
- a dynamic ``pltpu.roll`` shifts the wanted rows/columns into place and
  the VPU accumulates;
- block addresses arrive via scalar prefetch so DMAs are issued
  ``_NBUF - 1`` features ahead of their use.

The loop is DMA-bound, so bytes per feature matter most.  Two layout
tricks cut the fetch from (48, 256) to (32, 128) bytes:

- ROW PAIRING: HBM row offsets must be 32-aligned for int8 tiles, so a
  16-row window straddling an alignment boundary needs 48 rows.  We keep
  TWO copies of the maps, the second shifted down 16 rows, and pick the
  copy whose alignment puts the window inside 32 rows (selection is pure
  index arithmetic on the prefetched scalars).
- LANE MASKING: instead of zero-padding the lane dim to wb + window (to
  keep the column roll from wrapping into data), fetch the natural
  128-lane tile and zero the wrapped columns with an iota mask after the
  roll — exact zero-pad semantics at 128 lanes.

Each program also runs only to its candidate's REAL feature count
(feature masks pad at the end), and inactive candidates (dead top-K
slots with score < 0) skip the loop entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROW_ALIGN = 32  # HBM DMA row offsets must be tile-aligned (int8 tiles)
_ROWS = 32  # rows fetched per feature (window + 16-row copy selection)
_NBUF = 8  # DMA pipeline depth: hides scattered-row HBM latency
_SHIFTS = 8  # v2: int32 row-shifted copies (f32 tile sublane alignment)


def _refine_kernel(
    window, wbp, wb, nf_ref, cidx_ref, rs_ref, rr_ref, bx_ref, maps_hbm,
    out_ref, scratch, acc, sem,
):
    k = pl.program_id(0)
    num_feats = nf_ref[k]  # dynamic per-candidate trip count

    def get_dma(slot, f):
        # rs_ref holds the 32-row block index; multiply here so Mosaic
        # can prove the row offset is tile-aligned.
        return pltpu.make_async_copy(
            maps_hbm.at[
                cidx_ref[k, f], pl.ds(rs_ref[k, f] * _ROW_ALIGN, _ROWS), :
            ],
            scratch.at[slot],
            sem.at[slot],
        )

    acc[:] = jnp.zeros_like(acc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (window, wbp), 1)

    @pl.when(num_feats > 0)
    def _():
        for j in range(_NBUF - 1):
            @pl.when(j < num_feats)
            def _():
                get_dma(j % _NBUF, j).start()

        def loop(f, _):
            slot = f % _NBUF

            @pl.when(f + _NBUF - 1 < num_feats)
            def _():
                get_dma((f + _NBUF - 1) % _NBUF, f + _NBUF - 1).start()

            get_dma(slot, f).wait()
            bx = bx_ref[k, f]
            # Row selection must be a roll: Mosaic only allows 8-aligned
            # dynamic sublane slice offsets, and the window offset within
            # the fetch is arbitrary in [0, 16).  The roll runs in int32
            # (int16 would pack 2x per vreg but Mosaic's rotate only
            # supports 32-bit lanes).
            vals = scratch[slot].astype(jnp.int32)
            shifted = pltpu.roll(
                pltpu.roll(vals, wbp - bx, 1), rr_ref[k, f], 0
            )[:window, :]
            # Zero columns past the data or wrapped around the tile (exact
            # zero-pad semantics without padding the lane dim).
            shifted = jnp.where(lane < wb - bx, shifted, 0)
            acc[:] = acc[:] + shifted
            return 0

        jax.lax.fori_loop(0, num_feats, loop, 0)

    out_ref[0] = acc[:, :window].astype(jnp.float32)


def _refine_kernel_v2(
    window, wbp, wb, nf_ref, cidx_ref, blk_ref, bx_ref, maps_hbm,
    out_ref, scratch, acc, sem,
):
    """v2 body: maps are pre-converted int32 with _SHIFTS row-shifted
    copies, so each feature's 16 wanted rows arrive as ONE aligned
    (window, wbp) fetch — no row roll, no uint8->int32 convert.  Only
    the (window, wbp) column roll + mask + add remain on the VPU
    (~2.5x less vector work per feature than v1's (32, wbp) pipeline)."""
    k = pl.program_id(0)
    num_feats = nf_ref[k]

    def get_dma(slot, f):
        # blk_ref holds the 8-row block index; multiply here so Mosaic
        # can prove the sublane offset is tile-aligned for int32.
        return pltpu.make_async_copy(
            maps_hbm.at[
                cidx_ref[k, f], pl.ds(blk_ref[k, f] * _SHIFTS, window), :
            ],
            scratch.at[slot],
            sem.at[slot],
        )

    acc[:] = jnp.zeros_like(acc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (window, wbp), 1)

    @pl.when(num_feats > 0)
    def _():
        for j in range(_NBUF - 1):
            @pl.when(j < num_feats)
            def _():
                get_dma(j % _NBUF, j).start()

        def loop(f, _):
            slot = f % _NBUF

            @pl.when(f + _NBUF - 1 < num_feats)
            def _():
                get_dma((f + _NBUF - 1) % _NBUF, f + _NBUF - 1).start()

            get_dma(slot, f).wait()
            bx = bx_ref[k, f]
            shifted = pltpu.roll(scratch[slot], wbp - bx, 1)
            # Zero columns past the data or wrapped around the tile.
            shifted = jnp.where(lane < wb - bx, shifted, 0)
            acc[:] = acc[:] + shifted
            return 0

        jax.lax.fori_loop(0, num_feats, loop, 0)

    out_ref[0] = acc[:, :window].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("t", "window"))
def similarity_local_sparse_pallas_v2(
    response_maps: jnp.ndarray,
    feats_sel: jnp.ndarray,
    valid_sel: jnp.ndarray,
    origins: jnp.ndarray,
    t: int,
    window: int = 16,
    scale: jnp.ndarray = None,
    active: jnp.ndarray = None,
):
    """v2 layout of similarity_local_sparse_pallas (same contract).

    The s2d maps are expanded to _SHIFTS row-shifted int32 copies
    (copy s holds rows shifted UP by s), so the 16 wanted rows of any
    feature start at an 8-aligned sublane offset of exactly one copy:
    fetch = (window, wbp) int32 at offset 8*(by//8) of copy (by%8).
    Costs 32x the uint8 map bytes in HBM scratch (~160 MB at VGA/t=5 —
    per-frame temporary, rebuilt inside the jit) to remove the row roll
    and the convert from the per-feature loop, which v1 measurements
    showed to be VPU-bound at ~0.11 us/feature."""
    from sixdpose_tpu.ops.similarity import _s2d_maps

    assert window == 16, "v2 row-shift layout assumes window == 16"
    k, f = feats_sel.shape[:2]
    c = response_maps.shape[0]
    maps = _s2d_maps(response_maps, t)
    hb, wb = maps.shape[1:]
    wbp = -(-wb // _LANES) * _LANES
    # Copy s needs rows [s, s + R) of the base; fetches read
    # [8*blk, 8*blk + window) with 8*blk <= hb - 1 rounded down, so
    # R = ceil(hb/8)*8 + window keeps every read inside the copy.
    rows_r = -(-hb // _SHIFTS) * _SHIFTS + window
    base = jnp.pad(
        maps.astype(jnp.int32),
        ((0, 1), (0, rows_r + _SHIFTS - hb), (0, wbp - wb)),
    )  # (c*t*t+1, R+8, wbp); extra channel = zeros for masked feats
    shifted_copies = jnp.concatenate(
        [base[:, s : s + rows_r, :] for s in range(_SHIFTS)], axis=0
    )  # (8*(c*t*t+1), R, wbp): copy-major so index = s*nch + cprime
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

    nch = c * t * t + 1
    cidx = (by % _SHIFTS) * nch + cprime  # copy s = by % 8, channel-major
    by_blk = by // _SHIFTS  # 8-row block index (kernel re-scales)

    rev_first = jnp.argmax(valid_sel[:, ::-1].astype(jnp.int32), axis=1)
    has_any = jnp.any(valid_sel, axis=1)
    nf_trip = jnp.where(has_any, f - rev_first, 0).astype(jnp.int32)
    if active is not None:
        nf_trip = jnp.where(active, nf_trip, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, window, window), lambda kk, *_: (kk, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, window, wbp), jnp.int32),
            pltpu.VMEM((window, wbp), jnp.int32),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    scores = pl.pallas_call(
        functools.partial(_refine_kernel_v2, window, wbp, wb),
        out_shape=jax.ShapeDtypeStruct((k, window, window), jnp.float32),
        grid_spec=grid_spec,
    )(nf_trip, cidx, by_blk, bx, shifted_copies)
    return scores, jnp.sum(ok, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("t", "window"))
def similarity_local_sparse_pallas(
    response_maps: jnp.ndarray,
    feats_sel: jnp.ndarray,
    valid_sel: jnp.ndarray,
    origins: jnp.ndarray,
    t: int,
    window: int = 16,
    scale: jnp.ndarray = None,
    active: jnp.ndarray = None,
):
    """Drop-in for ops.similarity.similarity_local_sparse (same contract:
    returns (scores (K, window, window) f32, counts (K,) int32)).

    Each program loops only to its candidate's last valid feature (banks
    pad feature masks at the end).  ``active`` optionally marks
    candidates whose output is consumed downstream; inactive ones return
    zeros without touching HBM.
    """
    from sixdpose_tpu.ops.similarity import _s2d_maps

    assert window <= 16, "row pairing assumes window <= 16"
    k, f = feats_sel.shape[:2]
    c = response_maps.shape[0]
    maps = _s2d_maps(response_maps, t)
    hb, wb = maps.shape[1:]
    wbp = -(-wb // _LANES) * _LANES
    # Rows: fetches read [row_start, row_start + _ROWS) with row_start
    # 32-aligned and <= hb - 1 + 16 (copy B); pad so all reads land in
    # zeros beyond the data.
    rows_a = -(-(hb + _ROW_ALIGN) // _ROW_ALIGN) * _ROW_ALIGN
    base = jnp.pad(
        maps, ((0, 1), (0, rows_a + 16 - hb), (0, wbp - wb))
    )  # (c*t*t+1, rows_a+16, wbp); extra channel = zeros for masked feats
    # Copy A: rows [0, rows_a); copy B: shifted down 16 rows.
    pads = jnp.concatenate([base[:, :rows_a, :], base[:, 16:, :]], axis=0)
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

    # Row pairing: pick copy A (dby < 16) or copy B (dby >= 16) so the
    # 16 wanted rows fit in one 32-row aligned fetch.
    by_blk = by // _ROW_ALIGN  # 32-row block index (kernel re-scales)
    dby = by % _ROW_ALIGN
    use_b = dby >= 16
    nch = c * t * t + 1
    cidx2 = cprime + jnp.where(use_b, nch, 0)
    roll_rows = (_ROWS - (dby & 15)) % _ROWS  # row roll amount

    # Dynamic trip count: last valid feature + 1, zeroed when inactive.
    rev_first = jnp.argmax(valid_sel[:, ::-1].astype(jnp.int32), axis=1)
    has_any = jnp.any(valid_sel, axis=1)
    nf_trip = jnp.where(has_any, f - rev_first, 0).astype(jnp.int32)
    if active is not None:
        nf_trip = jnp.where(active, nf_trip, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, window, window), lambda kk, *_: (kk, 0, 0), memory_space=pltpu.VMEM
        ),
        # Allocated once per launch (a per-program run_scoped costs tens
        # of us per grid step).
        scratch_shapes=[
            pltpu.VMEM((_NBUF, _ROWS, wbp), jnp.uint8),
            pltpu.VMEM((window, wbp), jnp.int32),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    scores = pl.pallas_call(
        functools.partial(_refine_kernel, window, wbp, wb),
        out_shape=jax.ShapeDtypeStruct((k, window, window), jnp.float32),
        grid_spec=grid_spec,
    )(nf_trip, cidx2, by_blk, roll_rows, bx, pads)
    return scores, jnp.sum(ok, axis=1).astype(jnp.int32)
