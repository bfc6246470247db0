"""Orientation spreading and response maps.

Reference behavior:

- ``spread`` (linemodLevelup.cpp:1094-1109): dst[y, x] = OR over
  src[y + r, x + c] for r, c in [0, T).  The SSE row sweeps of
  ``orUnaligned8u`` (cpp:1026-1083) become T^2 shifted bitwise-ORs that XLA
  fuses into one VPU pass.

- ``computeResponseMaps`` (cpp:1134-1203): for each orientation i, a LUT over
  the spread byte.  The active "levelup" LUT (cpp:1121, variant "1,2->0,
  3->1") is: 4 if the exact orientation bit is present, 1 if only a
  45-degree neighbor bit is present, 0 otherwise.  The stock LINEMOD LUT
  (commented at cpp:1112) tapers 4,3,2,1 with angular distance.  Instead of
  a 16-entry shuffle LUT we evaluate the response directly with bit tests —
  branch-free elementwise ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("t",))
def spread_orientations(quantized: jnp.ndarray, t: int) -> jnp.ndarray:
    """OR each orientation byte over a t x t window anchored top-left.

    Args:
      quantized: (H, W) uint8 one-hot orientation image.
      t: sampling step T.

    Returns:
      (H, W) uint8 spread image (multi-hot).
    """
    h, w = quantized.shape
    p = jnp.pad(quantized, ((0, t), (0, t)))
    out = jnp.zeros_like(quantized)
    for r in range(t):
        for c in range(t):
            out = out | p[r : r + h, c : c + w]
    return out


def _rot_bits(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Rotate the 8 orientation bits left by k (cyclic orientation space)."""
    xi = x.astype(jnp.uint8)
    return ((xi << k) | (xi >> (8 - k))).astype(jnp.uint8) if k else xi


@functools.partial(jax.jit, static_argnames=("lut",))
def compute_response_maps(spread: jnp.ndarray, lut: str = "levelup") -> jnp.ndarray:
    """Per-orientation response of a spread image.

    Args:
      spread: (H, W) uint8 multi-hot spread image.
      lut: "levelup" (active reference LUT: exact->4, 45deg->1, else 0) or
        "stock" (original LINEMOD taper: 4 - angular distance, floor 0...
        i.e. exact->4, 1 step->3, 2->2, 3->1, 4->0).

    Returns:
      (8, H, W) uint8 response maps, one per orientation bin.
    """
    s = spread
    maps = []
    for ori in range(8):
        bit = jnp.uint8(1 << ori)
        exact = (s & bit) != 0
        if lut == "binary45":
            # cxxLCHF's own LUT (lchf.cpp:450-451): exact bit OR a
            # 45-degree neighbor -> 4, everything else -> 0.
            near = (
                s
                & (
                    bit
                    | _rot_bits(jnp.uint8(1 << ori), 1)
                    | _rot_bits(jnp.uint8(1 << ori), 7)
                )
            ) != 0
            resp = jnp.where(near, 4, 0)
        elif lut == "levelup":
            adj = (s & (_rot_bits(jnp.uint8(1 << ori), 1) | _rot_bits(jnp.uint8(1 << ori), 7))) != 0
            resp = jnp.where(exact, 4, jnp.where(adj, 1, 0))
        elif lut == "stock":
            resp = jnp.zeros(s.shape, jnp.int32)
            # Distance d in bin steps contributes 4 - d (cyclic distance <= 4).
            for d in range(4, -1, -1):
                hit = (
                    (s & (_rot_bits(jnp.uint8(1 << ori), d) | _rot_bits(jnp.uint8(1 << ori), (8 - d) % 8)))
                    != 0
                )
                resp = jnp.where(hit, 4 - d, resp)
        else:
            raise ValueError(f"unknown response LUT {lut!r}")
        maps.append(resp.astype(jnp.uint8))
    return jnp.stack(maps, axis=0)
