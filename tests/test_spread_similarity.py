"""Spread, response maps, and dense similarity vs small golden tensors
and a numpy re-implementation of the reference semantics."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sixdpose_tpu.ops.spread import spread_orientations, compute_response_maps
from sixdpose_tpu.ops.similarity import (
    build_template_kernels,
    similarity_dense,
    similarity_local,
    score_normalize,
)


def np_spread(q, t):
    h, w = q.shape
    p = np.pad(q, ((0, t), (0, t)))
    out = np.zeros_like(q)
    for r in range(t):
        for c in range(t):
            out |= p[r : r + h, c : c + w]
    return out


def np_response(spread_img, ori):
    """Levelup LUT: exact bit -> 4, 45-degree neighbor -> 1, else 0
    (linemodLevelup.cpp:1121)."""
    exact = (spread_img & (1 << ori)) != 0
    left = 1 << ((ori + 1) % 8)
    right = 1 << ((ori - 1) % 8)
    adj = (spread_img & (left | right)) != 0
    return np.where(exact, 4, np.where(adj, 1, 0)).astype(np.uint8)


def test_spread_golden():
    q = np.zeros((8, 8), np.uint8)
    q[2, 2] = 1  # bit 0
    q[5, 6] = 8  # bit 3
    s = np.asarray(spread_orientations(jnp.asarray(q), 3))
    # spread[y, x] ORs src[y..y+2, x..x+2] -> the bit appears at all
    # positions whose window covers the source pixel.
    expect = np_spread(q, 3)
    assert (s == expect).all()
    assert s[0, 0] == 1
    assert s[2, 2] == 1
    assert s[3, 3] == 0 or (3, 3) > (2, 2)  # window anchored top-left
    assert s[3, 4] == 8


def test_spread_matches_numpy(rng):
    q = (1 << rng.integers(0, 8, (32, 40))).astype(np.uint8)
    q[rng.random((32, 40)) < 0.5] = 0
    for t in (2, 4, 5, 8):
        s = np.asarray(spread_orientations(jnp.asarray(q), t))
        assert (s == np_spread(q, t)).all()


def test_response_maps_levelup(rng):
    s = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    rm = np.asarray(compute_response_maps(jnp.asarray(s), "levelup"))
    for ori in range(8):
        assert (rm[ori] == np_response(s, ori)).all()


def test_response_maps_stock(rng):
    s = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    rm = np.asarray(compute_response_maps(jnp.asarray(s), "stock"))
    for ori in range(8):
        # stock LUT: 4 - cyclic bit distance (floor 0), max over set bits.
        expect = np.zeros_like(s, np.int32)
        for b in range(8):
            d = min((b - ori) % 8, (ori - b) % 8)
            val = max(4 - d, 0)
            expect = np.where((s & (1 << b)) != 0, np.maximum(expect, val), expect)
        assert (rm[ori] == expect).all()


def test_build_kernels():
    feats = np.array([[[1, 2, 3], [0, 0, 0], [-1, -1, 0]]])
    valid = np.array([[True, True, False]])
    k = build_template_kernels(feats, valid, 4, 4, 8)
    assert k.shape == (1, 8, 4, 4)
    assert k[0, 3, 2, 1] == 1
    assert k[0, 0, 0, 0] == 1
    assert k.sum() == 2


def test_similarity_dense_equals_manual(rng):
    """Dense conv similarity == explicit per-feature gather-sum
    (the reference's similarity(), linemodLevelup.cpp:1284-1354)."""
    h, w, t = 40, 48, 4
    rm = rng.integers(0, 5, (8, h, w)).astype(np.uint8)
    n, f = 3, 10
    feats = np.stack(
        [
            rng.integers(0, 12, (n, f)),
            rng.integers(0, 12, (n, f)),
            rng.integers(0, 8, (n, f)),
        ],
        axis=-1,
    )
    valid = np.ones((n, f), bool)
    kern = build_template_kernels(feats, valid, 12, 12, 8)
    raw = np.asarray(similarity_dense(jnp.asarray(rm), jnp.asarray(kern), t))

    ho, wo = (h - 12) // t + 1, (w - 12) // t + 1
    assert raw.shape == (n, ho, wo)
    for ti in range(n):
        for yi in range(ho):
            for xi in range(wo):
                s = sum(
                    int(rm[c, yi * t + fy, xi * t + fx])
                    for fx, fy, c in feats[ti]
                )
                assert raw[ti, yi, xi] == s


def test_similarity_local_diagonal(rng):
    """Grouped local conv scores candidate k with kernel k only."""
    h, w, t = 64, 64, 4
    rm = rng.integers(0, 5, (8, h, w)).astype(np.uint8)
    k, f = 3, 5
    feats = np.stack(
        [
            rng.integers(0, 8, (k, f)),
            rng.integers(0, 8, (k, f)),
            rng.integers(0, 8, (k, f)),
        ],
        axis=-1,
    )
    kern = build_template_kernels(feats, np.ones((k, f), bool), 8, 8, 8)
    origins = np.array([[0, 0], [4, 8], [8, 4]], np.int32)
    out = np.asarray(
        similarity_local(jnp.asarray(rm), jnp.asarray(kern), jnp.asarray(origins), t)
    )
    assert out.shape == (k, 16, 16)
    rm_pad = np.pad(rm, ((0, 0), (0, 15 * t + 8), (0, 15 * t + 8)))
    for ki in range(k):
        oy, ox = origins[ki]
        for wy in range(16):
            for wx in range(16):
                s = sum(
                    int(rm_pad[c, oy + wy * t + fy, ox + wx * t + fx])
                    for fx, fy, c in feats[ki]
                )
                assert out[ki, wy, wx] == s


def test_score_normalize():
    raw = jnp.asarray(np.array([[[8.0]], [[16.0]]], np.float32))
    nfeat = jnp.asarray(np.array([2, 4], np.int32))
    s = np.asarray(score_normalize(raw, nfeat))
    assert np.allclose(s[:, 0, 0], [100.0, 100.0])


def test_similarity_local_sparse_matches_dense(rng):
    """The feature-sparse local refinement must equal the grouped-conv one."""
    from sixdpose_tpu.ops.similarity import similarity_local_sparse

    h, w, t = 64, 64, 4
    rm = rng.integers(0, 5, (8, h, w)).astype(np.uint8)
    k, f = 3, 5
    feats = np.stack(
        [
            rng.integers(0, 8, (k, f)),
            rng.integers(0, 8, (k, f)),
            rng.integers(0, 8, (k, f)),
        ],
        axis=-1,
    )
    valid = np.ones((k, f), bool)
    kern = build_template_kernels(feats, valid, 8, 8, 8)
    origins = np.array([[0, 0], [4, 8], [8, 4]], np.int32)
    dense = np.asarray(
        similarity_local(jnp.asarray(rm), jnp.asarray(kern), jnp.asarray(origins), t)
    )
    sparse, counts = similarity_local_sparse(
        jnp.asarray(rm),
        jnp.asarray(feats.astype(np.int32)),
        jnp.asarray(valid),
        jnp.asarray(origins),
        t,
    )
    assert (np.asarray(counts) == f).all()
    assert np.allclose(np.asarray(sparse), dense)


def test_similarity_multiscale_sparse_matches_scaled_conv(rng):
    """The multiscale row-gather scorer must equal a dense conv over
    kernels built with the same per-scale feature rounding/clipping."""
    from sixdpose_tpu.ops.similarity import (
        similarity_dense,
        similarity_multiscale_sparse,
    )

    h, w, t = 48, 64, 4
    c = 8
    kh, kw = 14, 11  # deliberately not multiples of t
    rm = rng.integers(0, 5, (c, h, w)).astype(np.uint8)
    n, f = 4, 9
    feats = np.stack(
        [
            rng.integers(0, 16, (n, f)),   # x, may scale out of bounds
            rng.integers(0, 16, (n, f)),   # y
            rng.integers(0, c, (n, f)),
        ],
        axis=-1,
    ).astype(np.int32)
    valid = rng.random((n, f)) > 0.2
    scales = np.array([1.0, 0.6, 1.4, 0.0], np.float32)  # last = invalid

    raw, nfeat = similarity_multiscale_sparse(
        jnp.asarray(rm), jnp.asarray(feats), jnp.asarray(valid),
        jnp.asarray(scales), t, kh, kw,
    )
    raw = np.asarray(raw)
    nfeat = np.asarray(nfeat)

    s = len(scales)
    khb, kwb = -(-kh // t), -(-kw // t)
    assert raw.shape == (s * n, -(-h // t) - khb + 1, -(-w // t) - kwb + 1)
    for si, sc in enumerate(scales):
        xs = np.round(feats[..., 0] * sc).astype(np.int32)
        ys = np.round(feats[..., 1] * sc).astype(np.int32)
        ok = valid & (xs >= 0) & (xs < kw) & (ys >= 0) & (ys < kh) & (sc > 0)
        kern = np.zeros((n, c, khb * t, kwb * t), np.int8)
        tid = np.broadcast_to(np.arange(n)[:, None], (n, f))
        np.add.at(
            kern, (tid[ok], feats[..., 2][ok], ys[ok], xs[ok]), 1
        )
        dense = np.asarray(similarity_dense(jnp.asarray(rm), jnp.asarray(kern), t))
        assert np.allclose(raw[si * n : (si + 1) * n], dense), f"scale {sc}"
        assert (nfeat[si * n : (si + 1) * n] == ok.sum(1)).all()


def test_similarity_multiscale_matmul_matches_sparse(rng):
    """The shift-bucketed matmul scorer must equal the row-gather one."""
    from sixdpose_tpu.ops.similarity import (
        similarity_multiscale_matmul,
        similarity_multiscale_sparse,
    )

    h, w, t = 48, 64, 4
    c = 8
    kh, kw = 14, 11
    rm = rng.integers(0, 5, (c, h, w)).astype(np.uint8)
    n, f = 4, 9
    feats = np.stack(
        [rng.integers(0, 16, (n, f)), rng.integers(0, 16, (n, f)),
         rng.integers(0, c, (n, f))], axis=-1).astype(np.int32)
    valid = rng.random((n, f)) > 0.2
    scales = np.array([1.0, 0.6, 1.4, 0.0], np.float32)

    a_raw, a_nf = similarity_multiscale_sparse(
        jnp.asarray(rm), jnp.asarray(feats), jnp.asarray(valid),
        jnp.asarray(scales), t, kh, kw)
    b_raw, b_nf = similarity_multiscale_matmul(
        jnp.asarray(rm), jnp.asarray(feats), jnp.asarray(valid),
        jnp.asarray(scales), t, kh, kw)
    assert (np.asarray(a_nf) == np.asarray(b_nf)).all()
    assert np.allclose(np.asarray(a_raw), np.asarray(b_raw))
