"""GGX multiscatter directional-albedo (E_ss) LUT, vectorized in JAX.

Replaces the reference's per-material CPU Monte-Carlo loop
(ObjLoader.h:294-387: 16 cosTheta bins x 16000 samples each, F=1 white
furnace with VNDF sampling) with one vmapped estimator: all bins and all
samples evaluate as dense array ops, so a LUT that takes the reference
seconds per material builds in milliseconds.

The estimator matches the reference math exactly:
  Ess(cos) = mean_i[ NdotL * lum(G2/(4 NdotV NdotL)) / (G1 D? ...) ]
with brdf = F(=1) * D * G2 / (4 NdotV NdotL) ... note the reference's host
EvaluateBRDF_GGX omits D (ObjLoader.h:256-268: `F * G / (4 NdotV NdotL)`)
while its pdf omits D as well (BRDF_PDF_GGX host version `G1/(4 NdotV)`,
ObjLoader.h:271-286) — the D factors cancel in the ratio estimator, so both
formulations integrate the same quantity.  We use the cancelled form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.config import LUT_SIZE_THETA

_NUM_SAMPLES_MC = 16000
_EPS_BIN = 0.04  # cosTheta floor (ObjLoader.h:352,360)


def _sample_ggx_vndf_local(v: jax.Array, alpha: jax.Array, u1, u2):
    """Heitz VNDF sample of the half-vector, local frame (N = +z).

    Same construction as GGX_v6.hlsl:93-169 / ObjLoader.h:176-252.
    """
    vh = v * jnp.array([alpha, alpha, 1.0])
    vh = vh / jnp.linalg.norm(vh, axis=-1, keepdims=True)
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], -1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.clip(1.0 - p1 * p1, 0.0, 1.0)) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.clip(1.0 - p1 * p1 - p2 * p2, 0.0, 1.0))[..., None] * vh
    )
    ne = jnp.stack(
        [alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(nh[..., 2], 0.0)], -1
    )
    return ne / jnp.maximum(jnp.linalg.norm(ne, axis=-1, keepdims=True), 1e-20)


def _g1(ndotv, alpha):
    a2 = alpha * alpha
    return 2.0 * ndotv / jnp.maximum(jnp.sqrt(a2 + (1 - a2) * ndotv**2) + ndotv, 1e-7)


def _g2(ndotv, ndotl, alpha):
    a2 = alpha * alpha
    da = ndotv * jnp.sqrt(a2 + (1 - a2) * ndotl**2)
    db = ndotl * jnp.sqrt(a2 + (1 - a2) * ndotv**2)
    return 2.0 * ndotl * ndotv / jnp.maximum(da + db, 1e-20)


def compute_ess_lut(roughness: jax.Array, key: jax.Array | None = None,
                    num_samples: int = _NUM_SAMPLES_MC) -> jax.Array:
    """E_ss LUT for a batch of materials.

    Args:
      roughness: [M] Pr values.
      key: PRNG key (threefry; the reference uses mt19937 — only the
        statistics match, which is all the LUT needs at 16k samples).

    Returns:
      [M, LUT_SIZE_THETA] float32 in (0, 1].
    """
    roughness = jnp.atleast_1d(jnp.asarray(roughness, jnp.float32))
    if key is None:
        key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (num_samples, 2))

    idx = jnp.arange(LUT_SIZE_THETA, dtype=jnp.float32)
    cos_t = _EPS_BIN + idx / (LUT_SIZE_THETA - 1) * (1.0 - _EPS_BIN)
    sin_t = jnp.sqrt(jnp.maximum(_EPS_BIN, 1.0 - cos_t * cos_t))
    v = jnp.stack([sin_t, jnp.zeros_like(cos_t), cos_t], axis=-1)  # [B, 3]

    def per_material(rough):
        alpha = rough * rough

        def per_bin(vb):
            h = _sample_ggx_vndf_local(vb[None, :], alpha, u[:, 0], u[:, 1])
            l = 2.0 * jnp.sum(vb * h, axis=-1, keepdims=True) * h - vb
            ndotl = l[..., 2]
            ndotv = jnp.maximum(vb[2], 0.0)
            valid = ndotl > 0.0
            # brdf (host form, D cancelled) = G2/(4 NdotV NdotL);
            # pdf = G1/(4 NdotV)  =>  NdotL * brdf / pdf = NdotL * G2/(NdotL*G1)
            g2 = _g2(ndotv, jnp.maximum(ndotl, 0.0), alpha)
            g1 = _g1(ndotv, alpha)
            contrib = jnp.where(valid, g2 / jnp.maximum(g1, 1e-7), 0.0)
            return jnp.mean(contrib)

        return jax.vmap(per_bin)(v)

    lut = jax.vmap(per_material)(roughness)
    # Clamp away zeros so kms=(1-E)/E stays finite (GGX_v6.hlsl:197-199).
    return jnp.clip(lut, 1e-4, 1.0)
