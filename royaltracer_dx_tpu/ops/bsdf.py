"""BSDF library: Lambertian + GGX microfacet with multiscatter compensation.

Vectorized, branchless ports of the reference shading libraries:
  * GGX_v6.hlsl        — Schlick Fresnel, D_GGX, Smith G1/G2, Heitz VNDF
                         sampling, eval with ESS-LUT energy compensation,
                         pdf = G1*D/(4 NdotV)
  * Lambertian_v6.hlsl — cosine-weighted hemisphere sampling, Kd/pi, cos/pi
  * BRDF_v6.hlsl       — two-lobe strategy selection probabilities and the
                         probability-blended eval/pdf used by ReSTIR

Conventions (the reference's):
  * `outgoing` = unit vector from the surface TOWARD the viewer/previous
    vertex (V).
  * `incoming` = unit vector from the light INTO the surface; the light
    direction L = -incoming.
  * PI is the reference's 3.1415 constant for parity.

All functions broadcast over leading batch dims; material parameters are
passed as raw per-lane arrays (kd [N,4]/[N,3], ks [N,3], rough [N], ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.config import EPSILON, REF_PI, S_BIAS
from royaltracer_dx_tpu.utils import math3d as m3
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.utils.rng import tea_random


def _pow5(x: jax.Array) -> jax.Array:
    """|x|^5 as a multiply chain: jnp.power(x, 5.0) lowers to exp/log on
    the TPU VPU (transcendental-unit serialized), and Schlick runs twice
    per BSDF-blend eval x ~50 evals/lane/frame at 1080p.  The chain is
    also the more accurate form (the reference's HLSL pow is itself
    exp2/log2-based)."""
    a = jnp.abs(x)
    a2 = a * a
    return a2 * a2 * a


def schlick_fresnel(f0: jax.Array, cos_theta: jax.Array) -> jax.Array:
    """saturate(F0 + (1-F0) * |1-cos|^5) (GGX_v6.hlsl:26-29)."""
    p = _pow5(1.0 - cos_theta)
    return jnp.clip(f0 + (1.0 - f0) * p[..., None], 0.0, 1.0)


def d_ggx(ndoth: jax.Array, roughness: jax.Array) -> jax.Array:
    alpha = roughness * roughness
    a2 = alpha * alpha
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (REF_PI * denom * denom)


def g1_smith(ndotv: jax.Array, alpha: jax.Array) -> jax.Array:
    a2 = alpha * alpha
    return 2.0 * ndotv / (jnp.sqrt(a2 + (1.0 - a2) * ndotv * ndotv) + ndotv)


def g2_smith(ndotv: jax.Array, ndotl: jax.Array, alpha: jax.Array) -> jax.Array:
    a2 = alpha * alpha
    da = ndotv * jnp.sqrt(a2 + (1.0 - a2) * ndotl * ndotl)
    db = ndotl * jnp.sqrt(a2 + (1.0 - a2) * ndotv * ndotv)
    return 2.0 * ndotl * ndotv / (da + db)


def ess_lookup(lut_row: jax.Array, ndotv: jax.Array) -> jax.Array:
    """Linear interp into the 16-entry E_ss LUT (GGX_v6.hlsl:1-23).

    lut_row: [..., 16]; ndotv: [...].
    """
    size = lut_row.shape[-1]
    x = jnp.clip(ndotv, 0.0, 1.0) * (size - 1)
    i0 = jnp.floor(x).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    w = x - i0.astype(x.dtype)
    v0 = jnp.take_along_axis(lut_row, i0[..., None], axis=-1)[..., 0]
    v1 = jnp.take_along_axis(lut_row, i1[..., None], axis=-1)[..., 0]
    return v0 * (1.0 - w) + v1 * w


# ----------------------------- Lambertian -----------------------------


def sample_lambertian(normal: jax.Array, seed: jax.Array):
    """Cosine-weighted hemisphere sample (Lambertian_v6.hlsl:2-37).

    Uses the reference's exact basis construction and mirror fixup so the
    sample sequence matches for identical seeds.  Returns (dir, seed).
    """
    u1, seed = tea_random(seed)
    u2, seed = tea_random(seed)
    r = jnp.sqrt(u1)
    theta = 2.0 * jnp.float32(3.14159265358979323846) * u2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    up = jnp.where(
        (jnp.abs(normal[..., 2]) < 0.999)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), normal.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), normal.shape),
    )
    right = m3.normalize(jnp.cross(up, normal))
    forward = jnp.cross(normal, right)
    d = x[..., None] * right + y[..., None] * forward + z[..., None] * normal
    d = m3.normalize(d)
    d = jnp.where((m3.dot(d, normal) < 0.0)[..., None], -d, d)
    return d, seed


def eval_lambertian(kd: jax.Array) -> jax.Array:
    """Kd/pi (Lambertian_v6.hlsl:51-58); kd: [..., 3]."""
    return kd / REF_PI


def pdf_lambertian(normal: jax.Array, incoming: jax.Array) -> jax.Array:
    """max(dot(n, -incoming), EPS)/pi (Lambertian_v6.hlsl:61-64)."""
    return jnp.maximum(m3.dot(normal, -incoming), EPSILON) / REF_PI


# ------------------------------- GGX ----------------------------------


def sample_ggx(roughness: jax.Array, outgoing: jax.Array, normal: jax.Array,
               seed: jax.Array):
    """Heitz VNDF sample → reflected direction (GGX_v6.hlsl:93-169).

    Returns (dir, seed).  alpha = roughness^2; sample flipped into the
    normal hemisphere like the reference.
    """
    alpha = (roughness * roughness)[..., None]
    n = m3.normalize(normal)
    v = m3.normalize(outgoing)
    t1w, t2w = m3.coordinate_system(n)
    vl = jnp.stack([m3.dot(t1w, v), m3.dot(t2w, v), m3.dot(n, v)], axis=-1)
    ve = m3.normalize(jnp.concatenate([alpha * vl[..., :2], vl[..., 2:]], axis=-1))
    lensq = ve[..., 0] ** 2 + ve[..., 1] ** 2
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    t1h = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-ve[..., 1] * inv, ve[..., 0] * inv, jnp.zeros_like(inv)], -1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), ve.shape),
    )
    t2h = jnp.cross(ve, t1h)
    u1, seed = tea_random(seed)
    u2, seed = tea_random(seed)
    r = jnp.sqrt(u1)
    phi = 2.0 * REF_PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + ve[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.clip(1.0 - p1 * p1, 0.0, 1.0)) + s * p2
    nh = (
        p1[..., None] * t1h
        + p2[..., None] * t2h
        + jnp.sqrt(jnp.clip(1.0 - p1 * p1 - p2 * p2, 0.0, 1.0))[..., None] * ve
    )
    ne = jnp.concatenate([alpha * nh[..., :2], jnp.maximum(nh[..., 2:], 0.0)], axis=-1)
    ne = m3.normalize(ne)
    h = ne[..., 0:1] * t1w + ne[..., 1:2] * t2w + ne[..., 2:3] * n
    d = m3.reflect(-v, h)
    d = jnp.where((m3.dot(d, normal) < 0.0)[..., None], -d, d)
    return d, seed


def eval_ggx(ks, roughness, lut_row, normal, incoming, outgoing) -> jax.Array:
    """GGX specular with multiscatter LUT (GGX_v6.hlsl:174-206).

    incoming = -L.  Returns [..., 3]; zero where the 4*NdotV*NdotL
    denominator vanishes or the result is non-finite.
    """
    n = m3.normalize(normal)
    v = m3.normalize(outgoing)
    l = m3.normalize(-incoming)
    h = m3.normalize(v + l)
    ndotv = m3.dot(n, v)
    ndotl = m3.dot(n, l)
    ndoth = m3.dot(n, h)
    vdoth = m3.dot(v, h)
    f = schlick_fresnel(ks, vdoth)
    d = d_ggx(ndoth, roughness)
    g = g2_smith(ndotv, ndotl, roughness * roughness)
    denom = 4.0 * ndotv * ndotl
    spec = f * (d * g)[..., None] / denom[..., None]
    ess = ess_lookup(lut_row, ndotv)
    kms = (1.0 - ess) / ess
    spec = spec * (1.0 + ks * kms[..., None])
    finite = jnp.all(jnp.isfinite(spec), axis=-1, keepdims=True)
    # beyond the reference's denom guard, require both cosines positive:
    # the reference never shades backsides (its scenes are closed), we can
    # (open scenes / escaped GI paths), and the 1/(4 NdotV NdotL) pole
    # otherwise manufactures 1e15-scale fireflies
    ok = (
        (denom >= EPSILON)[..., None]
        & (ndotv > 0.0)[..., None]
        & (ndotl > 0.0)[..., None]
        & finite
    )
    return jnp.where(ok, spec, 0.0)


def pdf_ggx(roughness, normal, incoming, outgoing) -> jax.Array:
    """VNDF pdf = G1 * D / (4 NdotV) (GGX_v6.hlsl:209-224)."""
    n = m3.normalize(normal)
    v = m3.normalize(outgoing)
    l = m3.normalize(-incoming)
    h = m3.normalize(v + l)
    ndoth = m3.dot(n, h)
    ndotv = m3.dot(n, v)
    alpha = roughness * roughness
    pdf = g1_smith(ndotv, alpha) * d_ggx(ndoth, roughness) / (ndotv * 4.0)
    # backside view direction has no reflection pdf (see eval_ggx note)
    return jnp.where(ndotv > 0.0, pdf, 0.0)


# ----------------------- strategy selection / blend --------------------


def strategy_probs(ks, metallic, normal, outgoing):
    """(p_diffuse, p_specular) (BRDF_v6.hlsl:50-70)."""
    cos_theta = m3.dot(normal, outgoing)
    fres = schlick_fresnel(ks, cos_theta)
    p_s = jnp.minimum(1.0, m3.luminance_avg(fres) + metallic)
    return 1.0 - p_s, p_s


def select_strategy(ks, metallic, roughness, normal, outgoing, seed):
    """Pick a lobe: 0 = diffuse, 1 = GGX (BRDF_v6.hlsl:7-48).

    Returns (strategy [..] int32, p_specular [..], seed).  A specular pick
    with roughness < 0.04 degrades to diffuse like the reference.
    """
    r, seed = tea_random(seed)
    p_d, p_s = strategy_probs(ks, metallic, normal, outgoing)
    spec = (r <= p_s) & (roughness >= 0.04)
    return spec.astype(jnp.int32), p_s, seed


def sample_bsdf(strategy, ks, roughness, outgoing, normal, seed):
    """Sample the selected lobe; both lobes consume 2 draws so the RNG
    sequence stays aligned with the reference's divergent branches.
    Returns (dir, seed)."""
    d_lam, _ = sample_lambertian(normal, seed)
    d_ggx_, seed_out = sample_ggx(roughness, outgoing, normal, seed)
    spec = (strategy == 1)[..., None]
    # both lobes advance the seed by the same 2 TEA draws (the state update
    # is use-independent), so either branch's seed is THE seed
    return jnp.where(spec, d_ggx_, d_lam), seed_out


def eval_bsdf(strategy, kd, ks, roughness, lut_row, normal, incoming, outgoing):
    """EvaluateBRDF for one selected strategy (BRDF_v6.hlsl:91-106)."""
    lam = jnp.broadcast_to(eval_lambertian(kd[..., :3]), normal.shape)
    gx = eval_ggx(ks, roughness, lut_row, normal, incoming, outgoing)
    return jnp.where((strategy == 1)[..., None], gx, lam)


def pdf_bsdf(strategy, roughness, normal, incoming, outgoing):
    """BRDF_PDF for one selected strategy (BRDF_v6.hlsl:109-124)."""
    lam = pdf_lambertian(normal, incoming)
    gx = pdf_ggx(roughness, normal, incoming, outgoing)
    return jnp.where(strategy == 1, gx, lam)


# --------------------------- planar variants ---------------------------
#
# Same math as above on PLANAR vectors (tuples of component planes, see
# utils/pvec.py).  Used by the wide candidate batches ([M, N] RIS/NEE
# evaluation) where an [..., 3] minor dim would waste 125/128 VPU lanes.


def schlick_fresnel_p(f0, cos_theta):
    """Planar Schlick Fresnel; f0 is a planar vec, returns a planar vec."""
    p = _pow5(1.0 - cos_theta)
    return tuple(jnp.clip(c + (1.0 - c) * p, 0.0, 1.0) for c in f0)


def ess_lookup_hat(lut_planes, ndotv):
    """Gather-free E_ss LUT interpolation (GGX_v6.hlsl:1-23 semantics).

    lut_planes: 16 arrays broadcastable to ndotv's shape (per-lane LUT
    columns).  Linear interpolation over a uniform grid equals a sum of
    hat-basis weights, so the lookup becomes 16 dense select-mul-adds —
    no per-row gather (which costs ~7 ns/row on TPU).
    """
    size = len(lut_planes)
    x = jnp.clip(ndotv, 0.0, 1.0) * (size - 1)
    acc = 0.0
    for k, col in enumerate(lut_planes):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(x - k))
        acc = acc + col * w
    return acc


def eval_ggx_p(ks, roughness, lut_planes, n, l, v):
    """Planar eval_ggx.  n/l/v are planar unit vectors (n toward viewer
    side, l toward the light, v toward the viewer).  Returns a planar vec."""
    h = pv.normalize(pv.add(v, l))
    ndotv = pv.dot(n, v)
    ndotl = pv.dot(n, l)
    ndoth = pv.dot(n, h)
    vdoth = pv.dot(v, h)
    f = schlick_fresnel_p(ks, vdoth)
    d = d_ggx(ndoth, roughness)
    g = g2_smith(ndotv, ndotl, roughness * roughness)
    denom = 4.0 * ndotv * ndotl
    dg = d * g / denom
    ess = ess_lookup_hat(lut_planes, ndotv)
    kms = (1.0 - ess) / ess
    ok = (denom >= EPSILON) & (ndotv > 0.0) & (ndotl > 0.0)
    out = []
    for fc, kc in zip(f, ks):
        s = fc * dg * (1.0 + kc * kms)
        out.append(jnp.where(ok & jnp.isfinite(s), s, 0.0))
    return tuple(out)


def pdf_ggx_p(roughness, n, l, v):
    """Planar pdf_ggx (VNDF pdf = G1 * D / (4 NdotV))."""
    h = pv.normalize(pv.add(v, l))
    ndoth = pv.dot(n, h)
    ndotv = pv.dot(n, v)
    alpha = roughness * roughness
    pdf = g1_smith(ndotv, alpha) * d_ggx(ndoth, roughness) / (ndotv * 4.0)
    return jnp.where(ndotv > 0.0, pdf, 0.0)


def eval_bsdf_p(strategy, kd, ks, roughness, lut_planes, n, l, v):
    """Planar eval_bsdf: strategy-selected Lambertian or GGX.

    kd/ks planar vecs; n/l/v planar unit vectors (l toward the light —
    note this is -incoming vs the AoS API).  Returns a planar vec.
    """
    gx = eval_ggx_p(ks, roughness, lut_planes, n, l, v)
    spec = strategy == 1
    return tuple(
        jnp.where(spec, g, k / REF_PI) for g, k in zip(gx, kd)
    )


def pdf_bsdf_p(strategy, roughness, n, l, v):
    """Planar pdf_bsdf (l toward the light)."""
    lam = jnp.maximum(pv.dot(n, l), EPSILON) / REF_PI
    gx = pdf_ggx_p(roughness, n, l, v)
    return jnp.where(strategy == 1, gx, lam)


def eval_bsdf_blend_p(kd, ks, metallic, roughness, lut_planes, n, l, v):
    """Planar probability-blended two-lobe eval (see eval_bsdf_blend)."""
    cos_theta = pv.dot(n, v)
    fres = schlick_fresnel_p(ks, cos_theta)
    p_s = jnp.minimum(1.0, pv.avg(fres) + metallic)
    p_d = 1.0 - p_s
    gx = eval_ggx_p(ks, roughness, lut_planes, n, l, v)
    out = []
    for g, k in zip(gx, kd):
        r0 = p_d * (k / REF_PI)
        r1 = p_s * g
        r0 = jnp.where(jnp.isfinite(r0), r0, 0.0)
        r1 = jnp.where(jnp.isfinite(r1), r1, 0.0)
        out.append(r0 + r1)
    return tuple(out)


def pdf_bsdf_blend_p(ks, metallic, roughness, n, l, v):
    """Planar probability-blended two-lobe pdf."""
    cos_theta = pv.dot(n, v)
    fres = schlick_fresnel_p(ks, cos_theta)
    p_s = jnp.minimum(1.0, pv.avg(fres) + metallic)
    p_d = 1.0 - p_s
    p0 = jnp.maximum(pv.dot(n, l), EPSILON) / REF_PI
    p1 = pdf_ggx_p(roughness, n, l, v)
    r0 = p_d * p0
    r1 = p_s * p1
    r0 = jnp.where(jnp.isfinite(r0), r0, 0.0)
    r1 = jnp.where(jnp.isfinite(r1), r1, 0.0)
    return r0 + r1


def sample_lambertian_p(n, seed):
    """Planar cosine-weighted hemisphere sample (Lambertian_v6.hlsl:2-37).

    n: planar unit normal; seed: uint32 [..., 2].  Returns (dir, seed) with
    the same draw order/basis fixups as the AoS version.
    """
    u1, seed = tea_random(seed)
    u2, seed = tea_random(seed)
    r = jnp.sqrt(u1)
    theta = 2.0 * jnp.float32(3.14159265358979323846) * u2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    zero = jnp.zeros_like(n[2])
    use_z = jnp.abs(n[2]) < 0.999
    up = (jnp.where(use_z, 0.0, 1.0), zero, jnp.where(use_z, 1.0, 0.0))
    right = pv.normalize(pv.cross(up, n))
    forward = pv.cross(n, right)
    d = pv.add(pv.add(pv.scale(right, x), pv.scale(forward, y)), pv.scale(n, z))
    d = pv.normalize(d)
    d = pv.where(pv.dot(d, n) < 0.0, pv.neg(d), d)
    return d, seed


def sample_ggx_p(roughness, v, n, seed):
    """Planar Heitz VNDF sample → reflected direction (GGX_v6.hlsl:93-169).

    v: planar unit view vector (toward the viewer); n: planar unit normal.
    Returns (dir, seed)."""
    alpha = roughness * roughness
    n = pv.normalize(n)
    v = pv.normalize(v)
    t1w, t2w = pv.coordinate_system(n)
    vl = (pv.dot(t1w, v), pv.dot(t2w, v), pv.dot(n, v))
    ve = pv.normalize((alpha * vl[0], alpha * vl[1], vl[2]))
    lensq = ve[0] * ve[0] + ve[1] * ve[1]
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    ok = lensq > 0.0
    zero = jnp.zeros_like(inv)
    t1h = (
        jnp.where(ok, -ve[1] * inv, 1.0),
        jnp.where(ok, ve[0] * inv, 0.0),
        zero,
    )
    t2h = pv.cross(ve, t1h)
    u1, seed = tea_random(seed)
    u2, seed = tea_random(seed)
    r = jnp.sqrt(u1)
    phi = 2.0 * REF_PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + ve[2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.clip(1.0 - p1 * p1, 0.0, 1.0)) + s * p2
    pz = jnp.sqrt(jnp.clip(1.0 - p1 * p1 - p2 * p2, 0.0, 1.0))
    nh = pv.add(pv.add(pv.scale(t1h, p1), pv.scale(t2h, p2)), pv.scale(ve, pz))
    ne = pv.normalize((alpha * nh[0], alpha * nh[1], jnp.maximum(nh[2], 0.0)))
    h = pv.add(pv.add(pv.scale(t1w, ne[0]), pv.scale(t2w, ne[1])), pv.scale(n, ne[2]))
    d = pv.reflect(pv.neg(v), h)
    d = pv.where(pv.dot(d, n) < 0.0, pv.neg(d), d)
    return d, seed


def select_strategy_p(ks, metallic, roughness, n, v, seed):
    """Planar lobe pick: 0 = diffuse, 1 = GGX (BRDF_v6.hlsl:7-48)."""
    r, seed = tea_random(seed)
    cos_theta = pv.dot(n, v)
    fres = schlick_fresnel_p(ks, cos_theta)
    p_s = jnp.minimum(1.0, pv.avg(fres) + metallic)
    spec = (r <= p_s) & (roughness >= 0.04)
    return spec.astype(jnp.int32), p_s, seed


def sample_bsdf_p(strategy, ks, roughness, v, n, seed):
    """Planar sample of the selected lobe; both lobes consume the same 2
    draws (see sample_bsdf).  Returns (dir, seed)."""
    d_lam, _ = sample_lambertian_p(n, seed)
    d_spec, seed_out = sample_ggx_p(roughness, v, n, seed)
    return pv.where(strategy == 1, d_spec, d_lam), seed_out


def eval_bsdf_blend(kd, ks, metallic, roughness, lut_row, normal, incoming, outgoing):
    """Probability-blended two-lobe eval: p_d*f_d + p_s*f_s with
    SafeMultiply NaN/Inf zeroing (Sampler_v6.hlsl:123-128 pattern)."""
    p_d, p_s = strategy_probs(ks, metallic, normal, outgoing)
    f0 = jnp.broadcast_to(eval_lambertian(kd[..., :3]), normal.shape)
    f1 = eval_ggx(ks, roughness, lut_row, normal, incoming, outgoing)
    return m3.safe_multiply(p_d, f0) + m3.safe_multiply(p_s, f1)


def pdf_bsdf_blend(ks, metallic, roughness, normal, incoming, outgoing):
    """Probability-blended two-lobe pdf (same SafeMultiply semantics)."""
    p_d, p_s = strategy_probs(ks, metallic, normal, outgoing)
    p0 = pdf_lambertian(normal, incoming)
    p1 = pdf_ggx(roughness, normal, incoming, outgoing)
    r0 = p_d * p0
    r1 = p_s * p1
    r0 = jnp.where(jnp.isfinite(r0), r0, 0.0)
    r1 = jnp.where(jnp.isfinite(r1), r1, 0.0)
    return r0 + r1
