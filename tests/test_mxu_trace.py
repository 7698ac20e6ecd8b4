"""MXU matmul-MT tracer vs the brute-force oracle.

The matmul formulation accumulates dot products in a different order
than the planar MT chain, so parity is tolerance-based: t/u/v within
tight relative error, hit-id agreement except at sub-ulp near-ties,
occlusion decisions identical except where a hit sits within eps of the
t interval bounds.
"""

import numpy as np
import jax.numpy as jnp

from royaltracer_dx_tpu.ops import mxu_trace as mx
from royaltracer_dx_tpu.ops.intersect import (
    INF,
    any_hit_brute,
    closest_hit_brute,
)


def random_soup(n, seed=0, scale=1.0, offset=0.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, (n, 1, 3)) * scale + offset
    tri = base + rng.uniform(-0.15, 0.15, (n, 3, 3)) * scale
    return jnp.asarray(tri, jnp.float32)


def random_rays(n, seed=1, scale=1.0, offset=0.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)) * scale + offset
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def agreement(hm, hb, tol=1e-4):
    """Fraction of rays where mxu and brute agree (same hit/miss, same
    tri or same-t near-tie, t within tol)."""
    mh = np.asarray(hm.t) < 1e29
    bh = np.asarray(hb.t) < 1e29
    same_state = mh == bh
    both = mh & bh
    t_close = np.ones_like(same_state)
    t_close[both] = (np.abs(np.asarray(hm.t)[both] - np.asarray(hb.t)[both])
                     <= tol * np.maximum(1.0, np.abs(np.asarray(hb.t)[both])))
    return (same_state & t_close).mean(), both


def test_closest_parity_random_soup():
    tris = random_soup(3000)
    o, d = random_rays(4097)
    mt = mx.build_mxu_tris(tris)
    hm = mx.closest_hit_mxu(o, d, mt)
    hb = closest_hit_brute(o, d, tris)
    frac, both = agreement(hm, hb)
    assert frac > 0.999, frac
    # where the same triangle won, u/v match tightly
    same_tri = both & (np.asarray(hm.tri) == np.asarray(hb.tri))
    assert same_tri.sum() > 0.98 * both.sum()
    np.testing.assert_allclose(np.asarray(hm.u)[same_tri],
                               np.asarray(hb.u)[same_tri], atol=2e-4)
    np.testing.assert_allclose(np.asarray(hm.v)[same_tri],
                               np.asarray(hb.v)[same_tri], atol=2e-4)


def test_closest_parity_off_center_scene():
    """Re-centering keeps precision when the scene sits far from the
    origin (the o.n - v0.n cancellation)."""
    tris = random_soup(1000, seed=3, scale=2.0, offset=50.0)
    o, d = random_rays(1500, seed=4, scale=2.0, offset=50.0)
    mt = mx.build_mxu_tris(tris)
    hm = mx.closest_hit_mxu(o, d, mt)
    hb = closest_hit_brute(o, d, tris)
    frac, _ = agreement(hm, hb, tol=5e-4)
    assert frac > 0.998, frac


def test_anyhit_parity_and_masked_rays():
    tris = random_soup(2000, seed=5)
    o, d = random_rays(1024, seed=6)
    t_min = jnp.full((1024,), 1e-4)
    t_max = jnp.where(jnp.arange(1024) % 3 == 0, -1.0, 10.0)  # masked lanes
    mt = mx.build_mxu_tris(tris)
    om = np.asarray(mx.any_hit_mxu(o, d, mt, t_min, t_max))
    ob = np.asarray(any_hit_brute(o, d, tris, t_min, t_max))
    # masked rays are never occluded
    assert not om[::3].any()
    assert (om == ob).mean() > 0.999


def test_degenerate_and_padding_never_hit():
    """Zero-area triangles (padding) must never register hits."""
    tris = jnp.zeros((5, 3, 3), jnp.float32)
    o, d = random_rays(64, seed=7)
    mt = mx.build_mxu_tris(tris)
    h = mx.closest_hit_mxu(o, d, mt)
    assert not np.asarray(h.valid).any()


def test_ray_chunking_matches_single_batch():
    tris = random_soup(500, seed=8)
    o, d = random_rays(mx._RAY_CHUNK + 321, seed=9)
    mt = mx.build_mxu_tris(tris)
    h1 = mx.closest_hit_mxu(o, d, mt)
    # same rays in one chunk-size batch each
    parts = []
    for s in range(0, o.shape[0], mx._RAY_CHUNK):
        parts.append(mx.closest_hit_mxu(o[s:s + mx._RAY_CHUNK],
                                        d[s:s + mx._RAY_CHUNK], mt))
    t2 = np.concatenate([np.asarray(p.t) for p in parts])
    np.testing.assert_array_equal(np.asarray(h1.t), t2)
