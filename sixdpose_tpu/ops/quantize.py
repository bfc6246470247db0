"""Image quantization: color-gradient and depth-normal modalities.

Behavioral spec (reference: linemodLevelup.cpp):

Color gradient (``quantizedOrientations``/``hysteresisGradient``, cpp:350-505):
  1. 7x7 Gaussian blur (OpenCV fixed small-kernel coefficients for
     sigma=0), replicate border.
  2. 3x3 Sobel dx/dy per RGB channel on the *rounded uint8* blur output.
  3. Per pixel keep the channel with the largest squared magnitude.
  4. Orientation = atan2 in degrees, quantized into 16 bins then folded
     to 8 (bin & 7) so opposite directions share a bin.
  5. Hysteresis: where squared magnitude > weak_threshold^2, vote over the
     3x3 neighborhood's folded bins; accept the majority bin if it has
     >= 5 of 9 votes; output one-hot byte 1 << bin, else 0.
  6. Image border (1 px) carries no orientation.

Depth normal (``quantizedNormals``, cpp:729-819):
  1. For each pixel within distance_threshold, fit a plane over 8
     neighbors at radius 5 px with bilateral gating
     (|depth difference| < difference_threshold), via the closed-form
     2x2 least-squares solve of ``accumBilateral`` (cpp:698-712).
  2. Normal direction (nx, ny, nz) ~ (f*ddx, f*ddy, -det*d), f = focal
     (the reference hard-codes 1150, cpp:781-783).
  3. Quantize the normal's azimuth atan2(ny, nx) into 8 bins of 45 deg
     (nearest-bin rounding) -> byte 1 << bin.  The reference does this
     via the precomputed ``NORMAL_LUT[20][20][20]`` (normal_lut.i); here
     the bin is computed analytically, which is the same mapping without
     the 20^3 direction discretization.
  4. Degenerate fits (zero normal) and out-of-range depths -> 0.
  5. 5x5 median filter over the quantized bytes.

All functions are jit-compatible, operate on whole images, and keep
uint8/uint16 data until the float solve, so they fuse into cheap VPU code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bump when quantization BEHAVIOR changes (cache-invalidation key for
# trained banks; see benchmark.train_benchmark_bank).
QUANTIZER_VERSION = "v3-fastatan2-fixedpoint-blur"

# OpenCV's fixed 7-tap Gaussian for sigma=0 on small kernels
# (cv::getGaussianKernel small_gaussian_tab): binomial-like weights.
_GAUSS7 = np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125], dtype=np.float32)

# 5-tap kernel used by cv::pyrDown.
_PYR5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def _sep_filter2d(img: jnp.ndarray, k: np.ndarray, mode: str) -> jnp.ndarray:
    """Separable 2-D filter on an (H, W) or (H, W, C) float image."""
    r = len(k) // 2
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    else:
        squeeze = False
    pad = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode=mode)
    kx = jnp.asarray(k, img.dtype)
    # Horizontal then vertical pass as shifted adds (r<=3 => fully fused).
    h = jnp.zeros_like(pad)
    for i in range(len(k)):
        h = h + kx[i] * jnp.roll(pad, r - i, axis=1)
    v = jnp.zeros_like(h)
    for i in range(len(k)):
        v = v + kx[i] * jnp.roll(h, r - i, axis=0)
    out = v[r:-r, r:-r]
    return out[..., 0] if squeeze else out


def gaussian_blur7_u8(img: jnp.ndarray) -> jnp.ndarray:
    """7x7 Gaussian blur of a uint8 image, rounded back to uint8.

    BIT-EXACT with cv::GaussianBlur(src, 7x7, sigma=0, BORDER_REPLICATE)
    on 8-bit input: OpenCV's u8 path runs in fixed point — the sigma=0
    7-tap kernel is exactly [8,28,56,72,56,28,8]/256, both passes are
    exact integer sums (horizontal 8 fractional bits, vertical 16), and
    the final cast rounds HALF UP ((acc + 2^15) >> 16, fixedpoint.hpp),
    not half-to-even like a float pipeline.  Integer adds/shifts are also
    cheaper VPU work than float multiplies.
    """
    k256 = (8, 28, 56, 72, 56, 28, 8)  # _GAUSS7 * 256, exact
    r = 3
    if img.ndim == 2:
        x = img[..., None]
        squeeze = True
    else:
        x = img
        squeeze = False
    p = jnp.pad(x.astype(jnp.int32), ((r, r), (r, r), (0, 0)), mode="edge")
    h = jnp.zeros_like(p)
    for i, k in enumerate(k256):
        h = h + k * jnp.roll(p, r - i, axis=1)
    v = jnp.zeros_like(h)
    for i, k in enumerate(k256):
        v = v + k * jnp.roll(h, r - i, axis=0)
    out = (v[r:-r, r:-r] + (1 << 15)) >> 16
    out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    return out[..., 0] if squeeze else out


def _sobel3(img_u8: jnp.ndarray):
    """3x3 Sobel dx, dy (replicate border) on (C, H, W) uint8 -> int32.

    Channel-major so H/W stay the (sublane, lane) dims — a minor channel
    dim would pad 3 up to 128 lanes and run ~40x more memory traffic.
    """
    x = img_u8.astype(jnp.int32)
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")

    def sh(dy, dx):
        return p[:, 1 + dy : p.shape[1] - 1 + dy, 1 + dx : p.shape[2] - 1 + dx]

    # smooth = [1,2,1], diff = [-1,0,1]
    dx = (
        (sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
        - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1))
    )
    dy = (
        (sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
        - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1))
    )
    return dx, dy


def fast_atan2_deg(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV's ``fastAtan2`` polynomial in float32, degrees [0, 360).

    The reference's orientation comes from ``cv::phase`` (cpp:423), which
    is NOT IEEE atan2 but a 7th-order odd polynomial with ~0.3 deg max
    error — enough to flip ~0.01% of pixels across 22.5-deg bin
    boundaries vs exact atan2.  Since the reference behavior is the spec,
    this IS the production phase function; exactness is enumerated against
    the cv2 oracle over all int16 Sobel pairs in tests/test_quantize.py.
    """
    # Coefficients from opencv/modules/core/src/mathfuncs.cpp.
    p1 = jnp.float32(0.9997878412794807 * (180.0 / np.pi))
    p3 = jnp.float32(-0.3258083974640975 * (180.0 / np.pi))
    p5 = jnp.float32(0.1555786518463281 * (180.0 / np.pi))
    p7 = jnp.float32(-0.04432655554792128 * (180.0 / np.pi))
    eps = jnp.float32(2.220446049250313e-16)  # (float)DBL_EPSILON
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    ax, ay = jnp.abs(x), jnp.abs(y)
    c_lo = ay / (ax + eps)   # ax >= ay branch
    c_hi = ax / (ay + eps)   # ax <  ay branch
    c = jnp.where(ax >= ay, c_lo, c_hi)
    c2 = c * c
    poly = (((p7 * c2 + p5) * c2 + p3) * c2 + p1) * c
    a = jnp.where(ax >= ay, poly, jnp.float32(90.0) - poly)
    a = jnp.where(x < 0, jnp.float32(180.0) - a, a)
    a = jnp.where(y < 0, jnp.float32(360.0) - a, a)
    return a


def exact_atan2_deg(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """IEEE atan2 in degrees [0, 360) — the ``phase="exact"`` variant."""
    a = jnp.degrees(jnp.arctan2(y.astype(jnp.float32), x.astype(jnp.float32)))
    return jnp.where(a < 0, a + 360.0, a)


@functools.partial(jax.jit, static_argnames=("weak_threshold", "phase"))
def quantize_color_gradient(
    rgb: jnp.ndarray, weak_threshold: float = 10.0, phase: str = "cv"
):
    """Quantize RGB gradients to 8 orientation bits.

    Args:
      rgb: (H, W, 3) uint8 image.
      weak_threshold: magnitude gate (compared squared, reference
        quantizedOrientations cpp:423 ``threshold * threshold``).
      phase: ``"cv"`` (default) uses OpenCV's fastAtan2 polynomial —
        bit-exact with the reference matcher (cv::phase, cpp:423).
        ``"exact"`` uses IEEE atan2: strictly more accurate
        orientations.  LCHF features default to "exact" as an
        INTENTIONAL deviation — the reference's cxxLCHF quantization
        also calls cv::phase (lchf.cpp:210), so "cv" is its parity
        setting, but the ~0.3 deg fastAtan2 error flips bins near
        11.25-deg boundaries on smooth renders, which measurably
        destabilizes forest routing (round-3 regression: LCHF recall
        1.0 -> 0.0 from exactly this flip; see tests/test_lchf.py and
        PARITY.md).

    Returns:
      quantized: (H, W) uint8, one-hot orientation byte (0 = no gradient).
      magnitude: (H, W) float32 squared gradient magnitude of the dominant
        channel (used for template extraction).
    """
    h, w, _ = rgb.shape
    blurred = jnp.moveaxis(gaussian_blur7_u8(rgb), -1, 0)  # (3, H, W)
    dx, dy = _sobel3(blurred)
    mag = (dx * dx + dy * dy).astype(jnp.float32)  # (3, H, W), squared

    # Channel with max squared magnitude (ties -> lowest channel index,
    # same as the reference's >= cascade, cpp:393-417).  Strict-greater
    # cascade over the 3 planes keeps the earlier channel on ties and
    # avoids a minor-dim argmax/take_along_axis (lane-padding waste).
    best_dx, best_dy, best_mag = dx[0], dy[0], mag[0]
    for c in (1, 2):
        better = mag[c] > best_mag
        best_dx = jnp.where(better, dx[c], best_dx)
        best_dy = jnp.where(better, dy[c], best_dy)
        best_mag = jnp.where(better, mag[c], best_mag)

    # Orientation in degrees [0, 360) via the reference's own phase
    # function (cv::phase = fastAtan2 polynomial), 16 bins folded to 8.
    if phase == "exact":
        ang = exact_atan2_deg(best_dy, best_dx)
    else:
        ang = fast_atan2_deg(best_dy, best_dx)
    # cv convertTo rounds to nearest-even; [348.75, 360) rounds to 16 -> &15 = 0.
    bins16 = jnp.round(ang * jnp.float32(16.0 / 360.0)).astype(jnp.int32) & 15
    bins8 = bins16 & 7

    # Zero out the 1-px border before voting (cpp:446-457).
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= 1) & (row < h - 1) & (col >= 1) & (col < w - 1)
    bins8 = jnp.where(interior, bins8, 0)
    # Border pixels vote as bin 0 exactly like the reference's zeroed frame.

    # 3x3 histogram vote over the 8 folded bins, one (H, W) plane per bin
    # (separable box sum; first-max-wins like argmax).
    top_votes = jnp.zeros((h, w), jnp.int32)
    top_bin = jnp.zeros((h, w), jnp.int32)
    for b in range(8):
        eq = jnp.pad((bins8 == b).astype(jnp.int32), 1)
        rows3 = eq[0 : h, :] + eq[1 : h + 1, :] + eq[2 : h + 2, :]
        votes_b = rows3[:, 0:w] + rows3[:, 1 : w + 1] + rows3[:, 2 : w + 2]
        better = votes_b > top_votes
        top_bin = jnp.where(better, b, top_bin)
        top_votes = jnp.maximum(votes_b, top_votes)

    strong = best_mag > (weak_threshold * weak_threshold)
    accept = strong & (top_votes >= 5) & interior
    quantized = jnp.where(accept, (1 << top_bin).astype(jnp.uint8), jnp.uint8(0))
    return quantized, best_mag


@functools.partial(
    jax.jit,
    static_argnames=(
        "distance_threshold", "difference_threshold", "focal", "lut_parity"
    ),
)
def quantize_depth_normal(
    depth: jnp.ndarray,
    distance_threshold: int = 2000,
    difference_threshold: int = 50,
    focal: float = 1150.0,
    lut_parity: bool = False,
):
    """Quantize depth-image surface normals to 8 azimuth bits.

    The reference looks the bin up in NORMAL_LUT[20][20][20]
    (linemodLevelup.cpp:798-803, normal_lut.i).  That table's generating
    rule — proven EXACTLY over all 20^3 entries in
    tests/test_quantize.py::test_normal_lut_table_rule — is the azimuth
    sector round(atan2(ny, nx) * 8 / 2pi) of the cell's CORNER
    components ((val-10)/10); z never matters.  The default here applies
    the rule to the CONTINUOUS normal (strictly more accurate: no 0.1-grid
    truncation noise).  ``lut_parity=True`` reproduces the reference
    bit-exactly by truncating (nx, ny) to the grid corner first —
    deviations of the default are bounded to ADJACENT sectors and occur
    only near sector boundaries (see test_normal_lut_analytic_deviation).

    Args:
      depth: (H, W) uint16 depth in mm.
      distance_threshold / difference_threshold / focal: see module docstring.
      lut_parity: emulate the reference's 20-cell truncation exactly.

    Returns:
      (H, W) uint8 one-hot normal byte after a 5x5 median filter.
    """
    h, w = depth.shape
    r = 5
    d = depth.astype(jnp.int32)
    p = jnp.pad(d, r, mode="constant")

    def sh(dy, dx):
        return p[r + dy : h + r + dy, r + dx : w + r + dx]

    offsets = [(-r, -r), (-r, 0), (-r, r), (0, -r), (0, r), (r, -r), (r, 0), (r, r)]
    a00 = jnp.zeros((h, w), jnp.float32)
    a01 = jnp.zeros((h, w), jnp.float32)
    a11 = jnp.zeros((h, w), jnp.float32)
    b0 = jnp.zeros((h, w), jnp.float32)
    b1 = jnp.zeros((h, w), jnp.float32)
    for (dy_, dx_) in offsets:
        delta = (sh(dy_, dx_) - d).astype(jnp.float32)
        f = (jnp.abs(delta) < difference_threshold).astype(jnp.float32)
        i, j = float(dx_), float(dy_)  # reference passes (i=dx, j=dy)
        a00 = a00 + f * i * i
        a01 = a01 + f * i * j
        a11 = a11 + f * j * j
        b0 = b0 + f * i * delta
        b1 = b1 + f * j * delta

    det = a00 * a11 - a01 * a01
    ddx = a11 * b0 - a01 * b1
    ddy = -a01 * b0 + a00 * b1

    nx = focal * ddx
    ny = focal * ddy
    nz = -det * d.astype(jnp.float32)
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)

    if lut_parity:
        # Reference runtime truncation: val = int(n*10+10) (cpp:798-800),
        # then the LUT bin == azimuth of the corner (val-10)/10.
        nn = jnp.maximum(norm, 1e-12)
        v1 = jnp.clip(jnp.floor(nx / nn * 10.0 + 10.0), 0, 19)
        v2 = jnp.clip(jnp.floor(ny / nn * 10.0 + 10.0), 0, 19)
        nx = (v1 - 10.0) / 10.0
        ny = (v2 - 10.0) / 10.0

    # Azimuth bin: nearest of 8 sectors (reference NORMAL_LUT semantics).
    ang = jnp.arctan2(ny, nx)
    ang = jnp.where(ang < 0, ang + 2.0 * np.pi, ang)
    bin8 = jnp.round(ang * (8.0 / (2.0 * np.pi))).astype(jnp.int32) % 8
    byte = (1 << bin8).astype(jnp.uint8)

    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    # Reference loops y in [r, H-r-1), x in [r, W-r-1)  (cpp:752, 758).
    interior = (row >= r) & (row < h - r - 1) & (col >= r) & (col < w - r - 1)
    valid = interior & (d < distance_threshold) & (norm > 0)
    quantized = jnp.where(valid, byte, jnp.uint8(0))
    return median5x5_onehot_u8(quantized)


def median5x5_onehot_u8(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 median filter for images whose bytes are one-hot or zero
    (values in {0, 1, 2, 4, ..., 128}), e.g. quantized orientations.

    Exact 13th order statistic via counting: median = smallest value v
    with count(pixels <= v in the 5x5 window) >= 13.  9 candidate values
    x a separable box count is ~100 cheap (H, W) passes — versus a full
    25-element sort network for the generic median (~10x slower on VPU).
    """
    h, w = img.shape
    p = jnp.pad(img, 2, mode="edge")
    cum = jnp.zeros((h, w), jnp.int32)
    cums = []
    for v in (0, 1, 2, 4, 8, 16, 32, 64):
        eq = (p == v).astype(jnp.int32)
        rows5 = sum(eq[dy : h + dy, :] for dy in range(5))
        cnt = sum(rows5[:, dx : w + dx] for dx in range(5))
        cum = cum + cnt
        cums.append(cum)
    med = jnp.full((h, w), 128, jnp.uint8)
    for v, c in zip((64, 32, 16, 8, 4, 2, 1, 0), reversed(cums)):
        med = jnp.where(c >= 13, jnp.uint8(v), med)
    return med


def median5x5_u8(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 median filter on a uint8 image (cv::medianBlur(dst, dst, 5)).

    OpenCV pads with border replication for median; implemented as a sort
    of the 25 shifted neighborhoods (VPU-friendly, no gathers).
    """
    h, w = img.shape
    p = jnp.pad(img, 2, mode="edge")
    stack = jnp.stack(
        [p[2 + dy : h + 2 + dy, 2 + dx : w + 2 + dx] for dy in range(-2, 3) for dx in range(-2, 3)],
        axis=0,
    )
    return jnp.median(stack, axis=0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Pyramid downsampling
# ---------------------------------------------------------------------------


def pyr_down_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown: 5-tap Gaussian (reflect-101 border) then 2x decimation.

    Works for uint8 (H, W, C) or uint16 (H, W); rounds back to input dtype.
    """
    dt = img.dtype
    f = _sep_filter2d(img.astype(jnp.float32), _PYR5, mode="reflect")
    out = f[::2, ::2]
    info = jnp.iinfo(dt)
    return jnp.clip(jnp.round(out), info.min, info.max).astype(dt)


def pyr_down_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Depth pyrDown (reference uses cv::pyrDown on depth too, cpp:568-571)."""
    return pyr_down_rgb(depth)


def nn_down2(img: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x downsample (used for quantized normals/masks;
    reference DepthNormalPyramid::pyrDown resizes with INTER_NEAREST,
    cpp:861-864).  cv::resize INTER_NEAREST for exact 0.5 scale picks the
    top-left pixel of each 2x2 block."""
    return img[::2, ::2]


def color_gradient_pyramid(rgb: jnp.ndarray, levels: int, weak_threshold: float = 10.0):
    """Quantize an RGB image at each pyramid level.

    Returns list of (quantized, magnitude) per level, level 0 first
    (reference ColorGradientPyramid::pyrDown + update, cpp:557-584).
    """
    out = []
    cur = rgb
    for l in range(levels):
        if l > 0:
            cur = pyr_down_rgb(cur)
        out.append(quantize_color_gradient(cur, weak_threshold))
    return out


def depth_normal_pyramid(
    depth: jnp.ndarray,
    levels: int,
    distance_threshold: int = 2000,
    difference_threshold: int = 50,
    focal: float = 1150.0,
    lut_parity: bool = False,
):
    """Quantize depth normals at level 0 and NN-downsample for coarser levels
    (reference DepthNormalPyramid quantizes once and resizes, cpp:857-864)."""
    q0 = quantize_depth_normal(
        depth, distance_threshold, difference_threshold, focal, lut_parity
    )
    out = [q0]
    cur = q0
    for _ in range(1, levels):
        cur = nn_down2(cur)
        out.append(cur)
    return out
