"""Möller–Trumbore closest/any hit vs hand-computed expectations."""

import numpy as np
import jax.numpy as jnp

from royaltracer_dx_tpu.ops.intersect import (
    INF,
    any_hit_brute,
    closest_hit_brute,
    interpolate_hit,
)


def tri(*pts):
    return np.asarray(pts, np.float32)


def test_single_hit():
    tris = jnp.asarray([tri((-1, -1, -2), (1, -1, -2), (0, 1, -2))])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h = closest_hit_brute(o, d, tris)
    assert bool(h.valid[0])
    assert np.isclose(float(h.t[0]), 2.0, atol=1e-5)


def test_miss_behind_and_outside():
    tris = jnp.asarray([tri((-1, -1, -2), (1, -1, -2), (0, 1, -2))])
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 2)
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])  # behind / parallel-out
    h = closest_hit_brute(o, d, tris)
    assert not bool(h.valid[0]) and not bool(h.valid[1])


def test_closest_of_two():
    tris = jnp.asarray([
        tri((-1, -1, -5), (1, -1, -5), (0, 1, -5)),
        tri((-1, -1, -2), (1, -1, -2), (0, 1, -2)),
    ])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h = closest_hit_brute(o, d, tris)
    assert int(h.tri[0]) == 1
    assert np.isclose(float(h.t[0]), 2.0, atol=1e-5)


def test_double_sided():
    tris = jnp.asarray([tri((-1, -1, -2), (1, -1, -2), (0, 1, -2))])
    o = jnp.asarray([[0.0, 0.0, -4.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])  # hits the back face
    h = closest_hit_brute(o, d, tris)
    assert bool(h.valid[0])


def test_chunking_padding():
    rng = np.random.default_rng(0)
    tris = rng.uniform(-1, 1, (777, 3, 3)).astype(np.float32)  # odd count
    o = jnp.zeros((32, 3))
    d = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    h_small = closest_hit_brute(o, d, jnp.asarray(tris), chunk=64)
    h_big = closest_hit_brute(o, d, jnp.asarray(tris), chunk=1024)
    np.testing.assert_allclose(np.asarray(h_small.t), np.asarray(h_big.t), rtol=1e-6)
    hit = np.asarray(h_small.valid)
    np.testing.assert_array_equal(
        np.asarray(h_small.tri)[hit], np.asarray(h_big.tri)[hit]
    )


def test_any_hit_window():
    tris = jnp.asarray([tri((-1, -1, -2), (1, -1, -2), (0, 1, -2))])
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 2)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    t_min = jnp.asarray([0.001, 0.001])
    t_max = jnp.asarray([3.0, 1.5])  # second window ends before the triangle
    occ = any_hit_brute(o, d, tris, t_min, t_max)
    assert bool(occ[0]) and not bool(occ[1])


def test_interpolate_hit_normals():
    tv = jnp.asarray([tri((0, 0, 0), (1, 0, 0), (0, 1, 0))])
    # vertex normals all +z -> smooth normal +z; zero normals -> flat +z
    tn_smooth = jnp.asarray([[[0, 0, 1]] * 3], jnp.float32)
    tn_zero = jnp.zeros((1, 3, 3))
    o = jnp.asarray([[0.2, 0.2, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h = closest_hit_brute(o, d, tv)
    for tn in (tn_smooth, tn_zero):
        pos, n, flat, area = interpolate_hit(h, tv, tn, d)
        assert np.allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-5)
        assert np.allclose(np.asarray(pos[0]), [0.2, 0.2, 0.0], atol=1e-5)
        assert np.isclose(float(area[0]), 0.5, atol=1e-6)
