"""TEA RNG bit-parity vs a scalar python port of Common_v6.hlsl:119-138."""

import numpy as np
import jax.numpy as jnp

from royaltracer_dx_tpu.utils.rng import tea_random, tea_randoms, pixel_seed

MASK = 0xFFFFFFFF


def tea_scalar(v0: int, v1: int):
    s = 0
    for _ in range(4):
        s = (s + 0x9E3779B9) & MASK
        v0 = (v0 + ((((v1 << 4) & MASK) + 0xA341316C) ^ ((v1 + s) & MASK) ^ ((v1 >> 5) + 0xC8013EA4))) & MASK
        v1 = (v1 + ((((v0 << 4) & MASK) + 0xAD90777D) ^ ((v0 + s) & MASK) ^ ((v0 >> 5) + 0x7E95761E))) & MASK
    return np.float32(v0) / np.float32(4294967296.0), v0, v1


def test_tea_matches_scalar_port():
    rng = np.random.default_rng(7)
    seeds = rng.integers(0, 2**32, size=(64, 2), dtype=np.uint32)
    u, new_seed = tea_random(jnp.asarray(seeds))
    u = np.asarray(u)
    new_seed = np.asarray(new_seed)
    for i in range(64):
        eu, ev0, ev1 = tea_scalar(int(seeds[i, 0]), int(seeds[i, 1]))
        assert new_seed[i, 0] == ev0
        assert new_seed[i, 1] == ev1
        assert u[i] == np.float32(eu)


def test_tea_sequence_and_range():
    seed = jnp.asarray(np.array([[1, 2]], np.uint32))
    us, _ = tea_randoms(seed, 1000)
    us = np.asarray(us)[0]
    assert (us >= 0).all() and (us <= 1.0).all()
    # basic uniformity
    assert abs(us.mean() - 0.5) < 0.05
    assert len(np.unique(us)) > 990


def test_pixel_seed_matches_reference_formula():
    # RayGen_v6_pass1.hlsl:76-77
    x, y, stream, t = 123, 456, 2, 99
    s = np.asarray(pixel_seed(jnp.asarray([x]), jnp.asarray([y]), stream, jnp.uint32(t)))[0]
    ex = (y * 73856093 ^ x * 19349663 ^ stream * 83492791 ^ t * 293803) & MASK
    ey = (x * 37623481 ^ y * 51964263 ^ stream * 68250729 ^ t * 423977) & MASK
    assert s[0] == ex and s[1] == ey


def test_pixel_seed_decorrelated():
    xs = jnp.arange(100)
    seeds = pixel_seed(xs, xs * 0 + 5, 1, jnp.uint32(1))
    us, _ = tea_random(seeds)
    us = np.asarray(us)
    assert len(np.unique(us)) == 100
