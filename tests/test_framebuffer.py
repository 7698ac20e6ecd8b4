"""Accumulation rules (RayGen_v6_pass3.hlsl:384-432 semantics)."""

import numpy as np
import jax.numpy as jnp

from royaltracer_dx_tpu.render.framebuffer import Framebuffer, accumulate, resolve


def test_accumulate_and_resolve():
    fb = Framebuffer.create(4)
    s1 = jnp.ones((4, 3)) * 2.0
    fb = accumulate(fb, s1, jnp.asarray(False))
    fb = accumulate(fb, s1 * 2, jnp.asarray(False))
    avg = np.asarray(fb.accum / fb.count[:, None])
    assert np.allclose(avg, 3.0)


def test_nan_samples_skipped():
    fb = Framebuffer.create(2)
    good = jnp.ones((2, 3))
    bad = jnp.asarray([[np.nan, 1, 1], [1, 1, 1]])
    fb = accumulate(fb, good, jnp.asarray(False))
    fb = accumulate(fb, bad, jnp.asarray(False))
    assert float(fb.count[0]) == 1.0  # NaN pixel skipped
    assert float(fb.count[1]) == 2.0


def test_camera_change_resets():
    fb = Framebuffer.create(2)
    fb = accumulate(fb, jnp.ones((2, 3)), jnp.asarray(False))
    fb = accumulate(fb, jnp.ones((2, 3)) * 5, jnp.asarray(True))
    assert np.allclose(np.asarray(fb.accum), 5.0)
    assert np.allclose(np.asarray(fb.count), 1.0)


def test_resolve_sentinels():
    fb = Framebuffer(
        accum=jnp.asarray([[np.nan, 0, 0], [np.inf, 0, 0], [0.25, 0.25, 0.25]]),
        count=jnp.ones((3,)),
    )
    img = np.asarray(resolve(fb, srgb=False))
    assert np.allclose(img[0], [1, 0, 1])  # magenta
    assert np.allclose(img[1], [0, 1, 1])  # cyan
    assert np.allclose(img[2], 0.25)


def test_resolve_srgb():
    fb = Framebuffer(accum=jnp.full((1, 3), 0.5), count=jnp.ones((1,)))
    img = np.asarray(resolve(fb, srgb=True))
    assert abs(img[0, 0] - (1.055 * 0.5 ** (1 / 2.4) - 0.055)) < 1e-5
