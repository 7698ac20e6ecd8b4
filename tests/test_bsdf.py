"""BSDF correctness: analytic checks + Monte-Carlo consistency.

Targets the formulas of GGX_v6.hlsl / Lambertian_v6.hlsl / BRDF_v6.hlsl
(see docstrings in royaltracer_dx_tpu/ops/bsdf.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.config import REF_PI
from royaltracer_dx_tpu.ops import bsdf
from royaltracer_dx_tpu.scene.lut import compute_ess_lut


def _seeds(n, s=3):
    rng = np.random.default_rng(s)
    return jnp.asarray(rng.integers(0, 2**32, (n, 2), dtype=np.uint32))


def test_schlick_fresnel_limits():
    f0 = jnp.asarray([[0.04, 0.04, 0.04]])
    head_on = bsdf.schlick_fresnel(f0, jnp.asarray([1.0]))
    grazing = bsdf.schlick_fresnel(f0, jnp.asarray([0.0]))
    assert np.allclose(np.asarray(head_on), 0.04, atol=1e-6)
    assert np.allclose(np.asarray(grazing), 1.0, atol=1e-6)


def test_d_ggx_normalization():
    """Integral of D(h) cos(h) over the hemisphere = 1 (within REF_PI error)."""
    rough = 0.5
    n = 200
    theta = (np.arange(n) + 0.5) / n * np.pi / 2
    phiw = 2 * np.pi
    d = np.asarray(bsdf.d_ggx(jnp.asarray(np.cos(theta), jnp.float32), rough))
    integral = np.sum(d * np.cos(theta) * np.sin(theta)) * (np.pi / 2 / n) * phiw
    assert abs(integral - 1.0) < 0.02  # REF_PI vs pi gives ~0.003


def test_lambertian_sampling_cosine_distribution():
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4096, 3))
    d, _ = bsdf.sample_lambertian(normal, _seeds(4096))
    cz = np.asarray(d[:, 2])
    assert (cz >= 0).all()
    # cosine-weighted: E[cos] = 2/3
    assert abs(cz.mean() - 2.0 / 3.0) < 0.02


def test_lambertian_pdf_matches_density():
    """MC check: E[1/pdf] over cosine-weighted samples = hemisphere area
    measure consistency: integral of pdf over hemisphere = 1."""
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (8192, 3))
    d, _ = bsdf.sample_lambertian(normal, _seeds(8192, 5))
    pdf = np.asarray(bsdf.pdf_lambertian(normal, -d))
    expected = np.asarray(d[:, 2]) / REF_PI
    np.testing.assert_allclose(pdf, np.maximum(expected, 1e-6), rtol=2e-3, atol=1e-5)


def test_ggx_sample_eval_pdf_white_furnace():
    """VNDF sampling: E[f*cos/pdf] ~ directional albedo <= 1, > 0.5 for
    F0=1 rough surface."""
    n = 8192
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    v = jnp.broadcast_to(jnp.asarray([0.3, 0.0, 0.954]), (n, 3))
    rough = jnp.full((n,), 0.6)
    ks = jnp.ones((n, 3))
    lut = jnp.ones((n, 16))  # disable multiscatter boost for this check
    d, _ = bsdf.sample_ggx(rough, v, normal, _seeds(n, 9))
    f = np.asarray(bsdf.eval_ggx(ks, rough, lut, normal, -d, v))
    pdf = np.asarray(bsdf.pdf_ggx(rough, normal, -d, v))
    cos = np.asarray(d[:, 2])
    ok = (cos > 0) & (pdf > 1e-6)
    albedo = np.mean(np.where(ok, f[:, 0] * cos / np.maximum(pdf, 1e-6), 0.0))
    assert 0.5 < albedo <= 1.05


def test_strategy_probs_sum_to_one():
    ks = jnp.asarray([[0.5, 0.5, 0.5]])
    p_d, p_s = bsdf.strategy_probs(ks, jnp.asarray([0.3]), jnp.asarray([[0, 0, 1.0]]), jnp.asarray([[0, 0, 1.0]]))
    assert np.isclose(float((p_d + p_s)[0]), 1.0, atol=1e-6)


def test_metallic_forces_specular():
    ks = jnp.asarray([[0.0, 0.0, 0.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    _, p_s = bsdf.strategy_probs(ks, jnp.asarray([1.0]), n, n)
    assert float(p_s[0]) == 1.0


def test_ess_lut_monotonic_sane():
    lut = np.asarray(compute_ess_lut(jnp.asarray([0.05, 0.5, 1.0]), num_samples=4000))
    assert lut.shape == (3, 16)
    assert (lut > 0).all() and (lut <= 1.0).all()
    # smoother surfaces retain more single-scatter energy
    assert lut[0].mean() > lut[2].mean() - 0.02
    # rough surface loses energy -> multiscatter compensation kicks in
    assert lut[2].mean() < 0.97


def test_ess_lookup_interp():
    lut_row = jnp.asarray([np.linspace(0.5, 1.0, 16, dtype=np.float32)])
    v = bsdf.ess_lookup(lut_row, jnp.asarray([0.0]))
    assert np.isclose(float(v[0]), 0.5, atol=1e-6)
    v = bsdf.ess_lookup(lut_row, jnp.asarray([1.0]))
    assert np.isclose(float(v[0]), 1.0, atol=1e-6)
    mid = bsdf.ess_lookup(lut_row, jnp.asarray([0.5]))
    assert 0.7 < float(mid[0]) < 0.8
