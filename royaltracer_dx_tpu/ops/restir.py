"""ReSTIR DI building blocks: tracing with v6 hit semantics, reconnection
p-hat evaluation, NEE/BSDF candidate generation, RIS, and pairwise MIS.

Ports (file:line cite per function) the v6 HLSL library set:
  Sampler_v6.hlsl   — VisibilityCheck, ReconnectDI/GI, GetP_Hat(+GI),
                      SampleLightNEE/BSDF, SampleRIS, reprojection
  MIS_v6.hlsl       — generalized pairwise MIS (spatial + temporal)
  Hit_v6.hlsl       — closest-hit attribute interpolation (NO normal flip
                      toward the ray, unlike v5)
  Common_v6.hlsl    — rejection heuristics, weighted-disk neighbor pick

Everything is dense [N]-lane SoA; per-candidate loops become batched
axes; TraceRay sites route through either the brute-force sweep or the
LBVH traversal depending on RenderConfig.use_bvh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.config import EPSILON, MISS_MATERIAL_ID, RenderConfig, S_BIAS
from royaltracer_dx_tpu.ops import bsdf, light_sampling
from royaltracer_dx_tpu.ops.intersect import (
    any_hit_brute,
    closest_hit_brute,
    interpolate_hit,
)
from royaltracer_dx_tpu.ops.traverse import any_hit_bvh, closest_hit_bvh
from royaltracer_dx_tpu.scene.types import SceneArrays
from royaltracer_dx_tpu.utils import math3d as m3
from royaltracer_dx_tpu.utils.rng import tea_batch, tea_random

_T_MAX = 1e4


# ------------------------------ tracing ---------------------------------


def trace_closest(scene: SceneArrays, origins, dirs, cfg: RenderConfig,
                  t_min=1e-4):
    """TraceRay + ClosestHit/Miss (Hit_v6.hlsl:12-61, Miss_v6.hlsl:7).

    Returns dict(pos, normal, mid, area, obj, valid).  The v6 closest-hit
    interpolates smooth normals (flat fallback) and does NOT flip them
    toward the ray.  Miss lanes get the sentinel material id and zeroed
    geometry.
    """
    if cfg.use_bvh:
        hit = closest_hit_bvh(origins, dirs, scene.bvh, t_min=t_min, t_max=_T_MAX)
    else:
        hit = closest_hit_brute(origins, dirs, scene.tri_verts, t_min=t_min, t_max=_T_MAX)
    pos = origins + hit.t[:, None] * dirs
    _, normal, _, area = interpolate_hit(hit, scene.tri_verts, scene.tri_normals, dirs)
    valid = hit.valid
    v3 = valid[:, None]
    return dict(
        pos=jnp.where(v3, pos, 0.0),
        normal=jnp.where(v3, normal, 0.0),
        area=jnp.where(valid, area, 0.0),
        mid=jnp.where(valid, scene.tri_material[hit.tri],
                      jnp.uint32(MISS_MATERIAL_ID).astype(jnp.int32)),
        obj=jnp.where(valid, scene.tri_instance[hit.tri], 0),
        valid=valid,
    )


def trace_occluded(scene: SceneArrays, origins, dirs, t_min, t_max, cfg: RenderConfig):
    """Shadow TraceRay (ShadowRay.hlsl)."""
    if cfg.use_bvh:
        return any_hit_bvh(origins, dirs, scene.bvh, t_min, t_max)
    return any_hit_brute(origins, dirs, scene.tri_verts, t_min, t_max)


def visibility_check(scene, x1, n1, direction, dist, cfg) -> jax.Array:
    """V in {0,1} (Sampler_v6.hlsl:86-104)."""
    o = x1 + m3.normalize(n1) * S_BIAS
    t_max = jnp.maximum(dist - 10.0 * S_BIAS, 2.0 * S_BIAS)
    occ = trace_occluded(scene, o, direction, jnp.zeros_like(dist), t_max, cfg)
    return jnp.where(occ, 0.0, 1.0)


# --------------------------- material fetch -----------------------------


def fetch_material(scene: SceneArrays, mid: jax.Array) -> dict:
    """MaterialOptimized gather; the sentinel id maps to the default miss
    material (Common_v6.hlsl:70-74: all-zero)."""
    sentinel = mid == jnp.uint32(MISS_MATERIAL_ID).astype(jnp.int32)
    safe = jnp.where(sentinel, 0, mid)
    mats = scene.materials
    z = sentinel[:, None]
    return dict(
        kd=jnp.where(z, 0.0, mats.kd[safe]),
        ks=jnp.where(z, 0.0, mats.ks[safe]),
        ke=jnp.where(z, 0.0, mats.ke[safe]),
        rough=jnp.where(sentinel, 0.0, mats.pr_pm_ps_pc[safe, 0]),
        metal=jnp.where(sentinel, 0.0, mats.pr_pm_ps_pc[safe, 1]),
        lut=jnp.where(z, 1.0, mats.lut[safe]),
    )


def _mat_index(mat: dict, idx) -> dict:
    return {k: v[idx] for k, v in mat.items()}


# ------------------------- reconnection p-hat ---------------------------


def reconnect_di(x1, n1, x2, n2, l2, outgoing, mat) -> jax.Array:
    """f*G reconnection (Sampler_v6.hlsl:106-131): blended two-lobe BRDF x
    L2 x cos(x1) x cos(x2) / dist^2, with n2 flipped toward x1."""
    d = x2 - x1
    dist = m3.length(d)
    dn = m3.normalize(d)
    cos1 = jnp.maximum(0.0, m3.dot(n1, dn))
    n2f = jnp.where((m3.dot(n2, -dn) < 0.0)[..., None], -n2, n2)
    cos2 = jnp.maximum(0.0, m3.dot(n2f, -dn))
    f = bsdf.eval_bsdf_blend(
        mat["kd"], mat["ks"], mat["metal"], mat["rough"], mat["lut"],
        n1, -dn, m3.normalize(outgoing),
    )
    return f * l2 * (cos1 * cos2 / jnp.maximum(dist * dist, 1e-20))[..., None]


def reconnect_gi(x1, n1, xn, e3, outgoing, mat) -> jax.Array:
    """GI reconnection (Sampler_v6.hlsl:134-161): blended BRDF x |cos(x1)| x
    E3 (no geometry term — E3 is already radiance at the reconnection
    direction); non-finite zeroed."""
    d = xn - x1
    dn = m3.normalize(d)
    cos1 = jnp.abs(m3.dot(n1, dn))
    f = bsdf.eval_bsdf_blend(
        mat["kd"], mat["ks"], mat["metal"], mat["rough"], mat["lut"],
        n1, -dn, m3.normalize(outgoing),
    )
    fr = f * cos1[..., None] * e3
    finite = jnp.all(jnp.isfinite(fr), axis=-1, keepdims=True)
    return jnp.where(finite, fr, 0.0)


def get_p_hat_di(scene, x1, n1, x2, n2, l2, outgoing, mat, use_visibility, cfg):
    """p-hat = |ReconnectDI| (optionally x V) (Sampler_v6.hlsl:163-171)."""
    f = m3.linearize(reconnect_di(x1, n1, x2, n2, l2, outgoing, mat))
    if use_visibility:
        d = x2 - x1
        dist = m3.length(d)
        f = f * visibility_check(scene, x1, n1, m3.normalize(d), dist, cfg)
    return f


def get_p_hat_gi(scene, x1, n1, xn, e3, outgoing, mat, use_visibility, cfg):
    """float3 p-hat for GI (Sampler_v6.hlsl:173-181)."""
    f = reconnect_gi(x1, n1, xn, e3, outgoing, mat)
    if use_visibility:
        d = xn - x1
        dist = m3.length(d)
        v = visibility_check(scene, x1, n1, m3.normalize(d), dist, cfg)
        f = f * v[..., None]
    return f


# ------------------------ NEE candidate batch ---------------------------


def nee_candidates(scene, x1, normal, outgoing, mat, strategy, seed, m_count):
    """M NEE candidates per lane, batched (SampleLightNEE,
    Sampler_v6.hlsl:273-396, visibility OFF as in SampleRIS).

    Returns dict of [N, M] arrays: p_hat, pdf_light (area measure),
    pdf_bsdf (area measure), x2, n2, emission.
    """
    n = x1.shape[0]
    lights = scene.lights
    us, seed = tea_batch(seed, 3 * m_count)
    us = us.reshape(n, m_count, 3)
    idx = light_sampling.select_light(lights, us[..., 0])
    wv = light_sampling.light_world_verts(lights, scene.object_to_world, idx)
    bu, bv, bw = light_sampling.fold_barycentric(us[..., 1], us[..., 2])
    point = (
        bu[..., None] * wv[..., 0, :]
        + bv[..., None] * wv[..., 1, :]
        + bw[..., None] * wv[..., 2, :]
    )
    l_vec = point - x1[:, None, :]
    dist2 = m3.dot(l_vec, l_vec)
    dist = jnp.sqrt(jnp.maximum(dist2, EPSILON))
    l_norm = l_vec / jnp.maximum(dist, 1e-20)[..., None]

    e1 = wv[..., 1, :] - wv[..., 0, :]
    e2 = wv[..., 2, :] - wv[..., 0, :]
    cr = jnp.cross(e1, e2)
    area = jnp.abs(0.5 * m3.length(cr))
    nl = m3.normalize(cr)
    nl = jnp.where((m3.dot(nl, -l_norm) < 0.0)[..., None], -nl, nl)  # v6 flips

    cos_x = m3.dot(normal[:, None, :], l_norm)
    cos_y = m3.dot(nl, -l_norm)
    g = jnp.maximum(cos_y * cos_x / jnp.maximum(dist2, EPSILON), EPSILON)
    pdf_l = lights.weight[idx] / jnp.maximum(area, EPSILON)
    emission = lights.emission[idx]

    matb = {k: v[:, None] if v.ndim == 1 else v[:, None, :] for k, v in mat.items()}
    nb = normal[:, None, :]
    ob = m3.normalize(outgoing)[:, None, :]
    brdf = bsdf.eval_bsdf_blend(
        matb["kd"], matb["ks"], matb["metal"], matb["rough"], matb["lut"],
        nb, -l_norm, ob,
    )
    pdf_b = bsdf.pdf_bsdf_blend(
        matb["ks"], matb["metal"], matb["rough"], nb, -l_norm, ob,
    ) * cos_y / jnp.maximum(dist2, EPSILON)
    pdf_b = jnp.where(jnp.isfinite(pdf_b), pdf_b, 0.0)

    p_hat = m3.linearize(emission * brdf * g[..., None])
    return dict(
        p_hat=p_hat,
        pdf_light=jnp.maximum(pdf_l, EPSILON),
        pdf_bsdf=pdf_b,
        x2=point,
        n2=nl,
        emission=emission,
        l_norm=l_norm,
        dist=dist,
    ), seed


def bsdf_candidate(scene, x1, normal, outgoing, mat, strategy, seed, cfg):
    """One BSDF light candidate: sample lobe, trace, MIS pdfs
    (SampleLightBSDF, Sampler_v6.hlsl:199-271).

    Returns dict: p_hat, pdf_light, pdf_bsdf (area measure), x2, n2,
    emission; p_hat = 0 when the sampled ray missed or hit non-emissive.
    """
    sample, seed = bsdf.sample_bsdf(strategy, mat["ks"], mat["rough"],
                                    m3.normalize(outgoing), normal, seed)
    hit = trace_closest(scene, x1, sample, cfg, t_min=S_BIAS)
    hmat = fetch_material(scene, hit["mid"])
    ke = hmat["ke"]
    is_light = m3.luminance_avg(ke) * 3.0 > EPSILON

    l_vec = hit["pos"] - x1
    dist2 = jnp.maximum(m3.dot(l_vec, l_vec), EPSILON)
    cos_t = m3.dot(hit["normal"], -sample)
    # the reference's emissive pdf omits 1/area (quirk kept; cf. megakernel)
    pdf_light = (m3.luminance_avg(ke) * 3.0 / 3.0) / jnp.maximum(
        scene.lights.total_weight, EPSILON
    )

    nrm = m3.normalize(outgoing)
    brdf = bsdf.eval_bsdf_blend(
        mat["kd"], mat["ks"], mat["metal"], mat["rough"], mat["lut"],
        normal, -sample, nrm,
    )
    pdf_b = bsdf.pdf_bsdf_blend(
        mat["ks"], mat["metal"], mat["rough"], normal, -sample, nrm,
    ) * cos_t / dist2
    pdf_b = jnp.where(jnp.isfinite(pdf_b), pdf_b, 0.0)

    ndot = m3.dot(normal, sample)
    p_hat = m3.linearize(brdf * ke * (ndot * cos_t / dist2)[..., None])
    p_hat = jnp.where(is_light & hit["valid"], p_hat, 0.0)
    return dict(
        p_hat=p_hat,
        pdf_light=jnp.where(is_light, pdf_light, 0.0),
        pdf_bsdf=pdf_b,
        x2=hit["pos"],
        n2=hit["normal"],
        emission=ke,
    ), seed


# ------------------------------ pairwise MIS ----------------------------


def pairwise_mis_canonical_temporal(m_c, m_n, m_sum, m_cap):
    """GenPairwiseMIS_canonical_temporal (MIS_v6.hlsl:64-72)."""
    c = jnp.minimum(m_cap, m_c)
    m = c / jnp.maximum(m_sum, 1e-9)
    den = c + (m_sum - c)
    return m + jnp.where(den > 0.0, (jnp.minimum(m_cap, m_n) / m_sum) * (c / den), 0.0)


def pairwise_mis_noncanonical_temporal(m_c, m_n, m_sum, m_cap):
    """GenPairwiseMIS_noncanonical_temporal (MIS_v6.hlsl:74-81)."""
    num = m_sum - jnp.minimum(m_cap, m_c)
    den = num + jnp.minimum(m_cap, m_c)
    return jnp.where(
        den > 0.0, (jnp.minimum(m_cap, m_n) / jnp.maximum(m_sum, 1e-9)) * num / den, 0.0
    )


# ----------------------- spatial neighbor sampling ----------------------


def mirror_clamp(x: jax.Array, size: int) -> jax.Array:
    """Mirror coordinates into [0, size) (Common_v6.hlsl:223-236; a single
    reflection suffices for |offset| <= radius << size)."""
    x = jnp.abs(x)
    return jnp.where(x >= size, 2 * size - x - 2, x)


def spatial_candidate_pixels(px, py, width, height, radius, exponent, tries, seed):
    """``tries`` weighted-disk neighbor picks per lane
    (GetRandomPixelCircleWeighted, Common_v6.hlsl:203-241).

    Returns (nx [N, T], ny [N, T], is_center [N, T], seed).  The reference
    redraws until the pick differs from the center pixel; we flag center
    picks instead (the caller treats them as failed tries) — statistically
    a rejected try, not a redraw; documented deviation.
    """
    n = px.shape[0]
    us, seed = tea_batch(seed, 2 * tries)
    us = us.reshape(n, tries, 2)
    r = radius * jnp.power(us[..., 0], exponent)
    ang = us[..., 1] * 6.2831853
    ox = (jnp.cos(ang) * r).astype(jnp.int32)
    oy = (jnp.sin(ang) * r).astype(jnp.int32)
    nx = mirror_clamp(px[:, None] + ox, width)
    ny = mirror_clamp(py[:, None] + oy, height)
    is_center = (nx == px[:, None]) & (ny == py[:, None])
    return nx, ny, is_center, seed


# --------------------------- rejection tests ----------------------------


def reject_normal(n1, n2, threshold):
    """RejectNormal (Common_v6.hlsl:333-336)."""
    return m3.dot(n1, n2) < threshold


def reject_distance(x1, x2, cam_pos, threshold):
    """RejectDistance (Common_v6.hlsl:343-350)."""
    d1 = m3.length(x1 - cam_pos)
    d2 = m3.length(x2 - cam_pos)
    rel = jnp.abs(d1 - d2) / jnp.maximum(jnp.maximum(d1, d2), 1e-20)
    return rel > threshold


def reject_w_sum(w_sum, threshold):
    return w_sum > threshold


def reject_below_surface(d, n):
    return m3.dot(d, n) < 0.0


def reject_jacobian(j, threshold):
    return (j > threshold) | (j < 1.0 / threshold) | ~jnp.isfinite(j)


def jacobian_reconnection(x1_r, x1_q, x2q, n2q):
    """Reconnection-shift Jacobian (Sampler_v6.hlsl:48-68)."""
    vq = x2q - x1_q
    vr = x2q - x1_r
    nrm = m3.normalize(n2q)
    cos_q = jnp.abs(m3.dot(m3.normalize(-vq), nrm))
    cos_r = jnp.abs(m3.dot(m3.normalize(-vr), nrm))
    len_q = m3.dot(vq, vq)
    len_r = m3.dot(vr, vr)
    return (cos_q / jnp.maximum(cos_r, 1e-20)) * (len_r / jnp.maximum(len_q, 1e-20))


# --------------------------- reprojection -------------------------------


def reproject_to_prev_pixel(scene, world_pos, obj, prev_view, prev_proj,
                            width, height):
    """GetBestReprojectedPixel_d (Sampler_v6.hlsl:738-785): current world
    pos -> object local (current inverse) -> previous world -> previous
    clip -> pixel.  Returns (px, py) int32 with (-1,-1) when behind the
    camera."""
    o2w = scene.object_to_world[obj]          # [N, 4, 4]
    prev = scene.prev_object_to_world[obj]
    # invert the current o2w per lane (3x3 + translation; cheap & exact)
    rot = o2w[:, :3, :3]
    inv_rot = jnp.linalg.inv(rot)
    local = jnp.einsum("nij,nj->ni", inv_rot, world_pos - o2w[:, :3, 3])
    pw = jnp.einsum("nij,nj->ni", prev[:, :3, :3], local) + prev[:, :3, 3]
    vp = prev_proj @ prev_view
    clip = pw @ vp[:3, :3].T + vp[:3, 3]
    w = pw @ vp[3, :3] + vp[3, 3]
    good = w > 0.0
    ndc = clip[:, :2] / jnp.maximum(w, 1e-20)[:, None]
    uv = ndc * 0.5 + 0.5
    uv = uv.at[:, 1].set(1.0 - uv[:, 1])
    px = jnp.round(uv[:, 0] * width).astype(jnp.int32)
    py = jnp.round(uv[:, 1] * height).astype(jnp.int32)
    px = jnp.where(good, px, -1)
    py = jnp.where(good, py, -1)
    return px, py
