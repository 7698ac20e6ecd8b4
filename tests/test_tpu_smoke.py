"""Opt-in TPU smoke lane (RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py).

The CPU suite cannot see TPU-only numerics (f32 denormals flush to zero on
TPU — the class of bug fixed in commit 64982f9 — and matmuls default to
bf16).  One tiny flagship frame on the real chip asserts the render keeps
per-channel structure and stays finite, plus a stream-traversal parity
check against brute force on-device.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def test_restir_garage_frame_on_tpu():
    import jax

    from royaltracer_dx_tpu.camera import Camera
    from royaltracer_dx_tpu.cli import build_scene
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer

    assert jax.devices()[0].platform == "tpu"
    scene, cam = build_scene("reference")
    rr = RestirRenderer(scene, cam, RenderConfig(width=96, height=96))
    for _ in range(3):
        rr.render()
    img = rr.radiance()
    assert np.isfinite(img).all()
    ch = img.mean(axis=(0, 1))
    # distinct channel means = material colors survived (denormal flush or
    # bf16 id transport would gray them out)
    assert float(ch.std()) > 1e-3 * max(float(ch.mean()), 1e-6), ch


def test_onehot_highest_fetch_bitexact_on_tpu():
    """The sweep's small-scene row fetch (one-hot matmul at HIGHEST
    precision) must reproduce gathered f32 rows BIT-exactly on the MXU —
    the bf16x3 decomposition makes 1.0*x + 0.0*rest exact."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.standard_normal((128, 576)).astype(np.float32)
                        * rng.uniform(1e-6, 1e6, (128, 1)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, 4096).astype(np.int32))
    oh = (idx[:, None] == jnp.arange(128)[None, :]).astype(jnp.float32)
    fetched = jax.jit(lambda o, t: jnp.dot(
        o, t, precision=jax.lax.Precision.HIGHEST))(oh, table)
    gathered = table[idx]
    assert np.array_equal(np.asarray(fetched), np.asarray(gathered))


def test_stream_traversal_parity_on_tpu():
    import jax.numpy as jnp

    from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
    from royaltracer_dx_tpu.ops.stream_trace import (
        build_stream_accel,
        closest_hit_stream_xla,
    )

    rng = np.random.default_rng(3)
    tris = jnp.asarray(
        rng.uniform(-1, 1, (4000, 1, 3)).astype(np.float32)
        + rng.uniform(-0.08, 0.08, (4000, 3, 3)).astype(np.float32))
    o = jnp.asarray(rng.uniform(-1.5, 1.5, (257, 3)).astype(np.float32))
    d = rng.normal(size=(257, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    hb = closest_hit_brute(o, d, tris)
    hs = closest_hit_stream_xla(o, d, build_stream_accel(tris))
    np.testing.assert_allclose(np.asarray(hs.t), np.asarray(hb.t),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(hs.tri), np.asarray(hb.tri))
