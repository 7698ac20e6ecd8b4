"""The v5 "megakernel" path tracer — the framework's correctness oracle.

A faithful JAX re-expression of the reference's first-generation renderer:
bounce loop in raygen (RayGen.hlsl:80-137), shading in closest-hit with
RIS-of-10 NEE light selection + one shadow ray + balance-heuristic MIS
against the BSDF continuation (Hit.hlsl:126-381), russian roulette after
depth 3 (RayGen.hlsl:118-130).

Where the DXR version runs one divergent thread per pixel, this version is
one jitted program over dense SoA lanes: the bounce loop is a lax.fori_loop
over masked [N]-array updates, the RIS candidates are a vectorized [N, M]
batch (the reference's sequential RNG draw order is preserved by drawing
3*M uniforms sequentially first), and the two TraceRay sites (continuation
+ shadow) are batched Möller–Trumbore sweeps.

Intentional behavior-parity quirks (cfg.reference_mis_quirk):
  * emissive-hit MIS pdf omits the 1/area factor (Hit.hlsl:160-165)
  * RIS weights take the RED component of the float3 brdf expression
    (Hit.hlsl:280-281 assign float3 to float — HLSL implicit truncation)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.config import RenderConfig
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

# v5 numeric constants (Common.hlsl:1-3)
_EPS = 1e-4
_BIAS = 1e-5
_T_MIN = 1e-4
_T_MAX = 1e4


def _fetch_material(scene: SceneArrays, mat_id: jax.Array):
    m = scene.materials
    return dict(
        kd=m.kd[mat_id],
        ks=m.ks[mat_id],
        ke=m.ke[mat_id],
        rough=m.pr_pm_ps_pc[..., 0][mat_id],
        metal=m.pr_pm_ps_pc[..., 1][mat_id],
        lut=m.lut[mat_id],
    )


def _ris_nee(scene, mat, pos, normal, flat_normal, outgoing, strategy, seed, ris_m,
             use_bvh=False):
    """RIS over ris_m NEE candidates + one shadow ray (Hit.hlsl:183-337).

    All candidates evaluate as one [N, M] batch.  The reference draws its
    3 uniforms per candidate sequentially (Hit.hlsl:198,229-230); we use the
    counter-based tea_batch instead — same TEA hash, same distribution,
    different sequence (see utils/rng.py) — because 30 chained draws
    dominate XLA compile time.

    Returns (direct [N,3] — NOT yet multiplied by throughput, seed).
    """
    n = pos.shape[0]
    lights = scene.lights

    us, seed = tea_batch(seed, 3 * ris_m)              # [N, 3M]
    us = us.reshape(n, ris_m, 3)
    u_sel, xi1, xi2 = us[..., 0], us[..., 1], us[..., 2]

    shade_origin = pos + _BIAS * flat_normal           # [N, 3]

    idx = light_sampling.select_light(lights, u_sel)   # [N, M]
    wv = light_sampling.light_world_verts(lights, scene.object_to_world, idx)
    bu, bv, bw = light_sampling.fold_barycentric(xi1, xi2)
    point = (
        bu[..., None] * wv[..., 0, :]
        + bv[..., None] * wv[..., 1, :]
        + bw[..., None] * wv[..., 2, :]
    )                                                   # [N, M, 3]

    l_vec = point - shade_origin[:, None, :]
    dist2 = jnp.maximum(m3.dot(l_vec, l_vec), _EPS)
    dist = jnp.maximum(jnp.sqrt(dist2), _EPS)
    l_norm = l_vec / dist[..., None]

    e1 = wv[..., 1, :] - wv[..., 0, :]
    e2 = wv[..., 2, :] - wv[..., 0, :]
    cr = jnp.cross(e1, e2)
    area = jnp.abs(0.5 * m3.length(cr))
    nl = m3.normalize(cr)
    # v5 does NOT flip the light normal toward the shading point
    cosx = jnp.maximum(_EPS, m3.dot(normal[:, None, :], l_norm))
    cosy = jnp.maximum(_EPS, m3.dot(nl, -l_norm))
    g = jnp.maximum(cosx * cosy / dist2, _EPS)
    pdf_l = lights.weight[idx] / jnp.maximum(area, _EPS)
    emission = lights.emission[idx]                     # [N, M, 3]

    brdf = bsdf.eval_bsdf(
        strategy[:, None], mat["kd"][:, None, :], mat["ks"][:, None, :],
        mat["rough"][:, None], mat["lut"][:, None, :],
        normal[:, None, :], -l_norm, outgoing[:, None, :],
    )                                                   # [N, M, 3]
    pdf_b = jnp.maximum(
        bsdf.pdf_bsdf(
            strategy[:, None], mat["rough"][:, None],
            normal[:, None, :], -l_norm, outgoing[:, None, :],
        ),
        _EPS,
    )

    f = emission * brdf * g[..., None]
    # HLSL truncation quirk: the scalar "luminance" takes channel 0 of
    # avg(Ke)*brdf*G (Hit.hlsl:280-281 assigns float3 to float)
    lum = m3.luminance_avg(emission) * brdf[..., 0] * g
    wi = (1.0 / ris_m) * lum / pdf_l                    # [N, M]

    cdf = jnp.cumsum(wi, axis=-1)
    total = cdf[:, -1]
    u_ris, seed = tea_random(seed)                      # Hit.hlsl:300
    thr = u_ris * total
    sel = jnp.argmax(thr[:, None] < cdf, axis=-1)       # first True, else 0

    def pick(arr):
        if arr.ndim == 3:
            return jnp.take_along_axis(arr, sel[:, None, None], axis=1)[:, 0]
        return jnp.take_along_axis(arr, sel[:, None], axis=1)[:, 0]

    f_sel = pick(f)
    lum_sel = pick(lum)
    # WX = 1/max(EPS, p_hat) * w_sum (Hit.hlsl:312)
    wx = jnp.maximum(_EPS, 1.0 / jnp.maximum(_EPS, lum_sel) * total)

    ldir_sel = pick(l_norm)
    dist_sel = pick(dist)
    cosy_sel = pick(cosy)
    pdfb_sel = pick(pdf_b)
    pdfl_sel = pick(pdf_l)

    t_min_s = dist_sel * 0.0 + _BIAS
    if use_bvh:
        occluded = any_hit_bvh(shade_origin, ldir_sel, scene.bvh,
                               t_min_s, dist_sel - _BIAS)
    else:
        occluded = any_hit_brute(shade_origin, ldir_sel, scene.tri_verts,
                                 t_min_s, dist_sel - _BIAS)
    visible = jnp.where(occluded, 0.0, 1.0)

    direct = f_sel * (visible * wx)[:, None]
    pdf_l_sa = jnp.maximum(_EPS, pdfl_sel * dist_sel * dist_sel / cosy_sel)
    weight_light = pdf_l_sa / (pdf_l_sa + pdfb_sel)
    return direct * weight_light[:, None], seed


def bounce_step(scene: SceneArrays, st: dict, bounce: jax.Array, cfg: RenderConfig) -> dict:
    """One bounce of the megakernel over the full lane state dict.

    Factored out so callers can choose the dispatch strategy: the Renderer
    jits THIS once and python-loops it (XLA:CPU compile time grows
    superlinearly in traced body repetitions, so one cached step beats one
    giant unrolled graph), while trace_paths_impl inlines it for shard_map
    and the driver compile check.
    """
    return _bounce_body(scene, cfg)(bounce, st)


def _bounce_body(scene: SceneArrays, cfg: RenderConfig):
    def body(bounce, st):
        if cfg.use_bvh:
            hit = closest_hit_bvh(st["origin"], st["direction"], scene.bvh,
                                  t_min=_T_MIN, t_max=_T_MAX)
        else:
            hit = closest_hit_brute(st["origin"], st["direction"], scene.tri_verts,
                                    t_min=_T_MIN, t_max=_T_MAX)
        valid = st["alive"] & hit.valid
        pos = st["origin"] + hit.t[:, None] * st["direction"]
        _, normal, flat, _ = interpolate_hit(
            hit, scene.tri_verts, scene.tri_normals, st["direction"]
        )
        # flip both normals toward the ray origin (Hit.hlsl:108-111)
        to_viewer = -st["direction"]
        normal = jnp.where((m3.dot(normal, to_viewer) < 0.0)[:, None], -normal, normal)
        flat = jnp.where((m3.dot(flat, to_viewer) < 0.0)[:, None], -flat, flat)

        mat_id = scene.tri_material[hit.tri]
        mat = _fetch_material(scene, mat_id)
        is_emissive = m3.length(mat["ke"]) > 0.0

        # ---- emissive hit: MIS-weighted termination (Hit.hlsl:126-174);
        # at bounce 0 the weight is 1 (throughput is still 1 there too)
        l_vec = pos - st["origin"]
        dist2 = jnp.maximum(m3.dot(l_vec, l_vec), _EPS)
        l_norm = l_vec * jax.lax.rsqrt(dist2)[:, None]
        cos_emissive = jnp.maximum(_EPS, m3.dot(normal, -l_norm))
        tv = scene.tri_verts[hit.tri]
        cr = jnp.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
        area = jnp.abs(0.5 * m3.length(cr))
        avg_ke = m3.luminance_avg(mat["ke"])
        weight_tri = area * avg_ke / jnp.maximum(scene.lights.total_weight, _EPS)
        if cfg.reference_mis_quirk:
            pdf_l = jnp.maximum(_EPS, weight_tri * dist2 / cos_emissive)
        else:
            pdf_l = jnp.maximum(
                _EPS, weight_tri / jnp.maximum(area, _EPS) * dist2 / cos_emissive
            )
        w_mis = st["pdf_prev"] / (st["pdf_prev"] + pdf_l)
        w_mis = jnp.where(bounce == 0, 1.0, w_mis)
        emissive_contrib = mat["ke"] * st["throughput"] * w_mis[:, None]

        # ---- non-emissive: strategy select, RIS NEE, BSDF continuation
        outgoing = -st["direction"]
        strategy, _, seed = bsdf.select_strategy(
            mat["ks"], mat["metal"], mat["rough"], normal, outgoing, st["seed"]
        )
        direct, seed = _ris_nee(
            scene, mat, pos, normal, flat, outgoing, strategy, seed, cfg.ris_m,
            use_bvh=cfg.use_bvh,
        )
        direct = direct * st["throughput"]

        new_dir, seed = bsdf.sample_bsdf(
            strategy, mat["ks"], mat["rough"], outgoing, normal, seed
        )
        pdf_sample = jnp.maximum(
            bsdf.pdf_bsdf(strategy, mat["rough"], normal, -new_dir, outgoing), 1e-4
        )
        brdf_sample = bsdf.eval_bsdf(
            strategy, mat["kd"], mat["ks"], mat["rough"], mat["lut"],
            normal, -new_dir, outgoing,
        )
        cos_new = m3.dot(normal, new_dir)
        new_throughput = st["throughput"] * brdf_sample * (cos_new / pdf_sample)[:, None]

        shade_mask = valid & ~is_emissive
        emis_mask = valid & is_emissive

        contrib = (
            jnp.where(shade_mask[:, None], jnp.abs(direct), 0.0)
            + jnp.where(emis_mask[:, None], jnp.abs(emissive_contrib), 0.0)
        )

        alive = shade_mask
        throughput = jnp.where(shade_mask[:, None], new_throughput, st["throughput"])
        seed = jnp.where(shade_mask[:, None], seed, st["seed"])

        # ---- russian roulette (RayGen.hlsl:118-130), active when
        # bounce > rr_threshold
        u_rr, seed_rr = tea_random(seed)
        q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
        rr_on = (bounce > cfg.rr_threshold) & alive
        kill = rr_on & (u_rr > q)
        alive = alive & ~kill
        throughput = jnp.where(
            (rr_on & alive)[:, None], throughput / q[:, None], throughput
        )
        seed = jnp.where(rr_on[:, None], seed_rr, seed)

        return dict(
            origin=jnp.where(shade_mask[:, None], pos + _BIAS * flat, st["origin"]),
            direction=jnp.where(shade_mask[:, None], new_dir, st["direction"]),
            throughput=throughput,
            pdf_prev=jnp.where(shade_mask, pdf_sample, st["pdf_prev"]),
            seed=seed,
            emission=st["emission"] + contrib,
            alive=alive,
            prev_normal=jnp.where(shade_mask[:, None], normal, st["prev_normal"]),
            # closest-hit rays for every lane entering the bounce + one
            # shadow ray per shaded lane
            rays=st["rays"]
            + jnp.sum(st["alive"].astype(jnp.float32))
            + jnp.sum(shade_mask.astype(jnp.float32)),
        )

    return body


def init_path_state(origins, directions, seeds) -> dict:
    """Fresh lane state for trace loops.

    All fields derive from the ray arrays (not fresh constants) so their
    sharding/varying axes match loop-carried outputs under shard_map.
    """
    zero3 = origins * 0.0
    zero = zero3[:, 0]
    return dict(
        origin=origins,
        direction=directions,
        throughput=zero3 + 1.0,
        pdf_prev=zero + 1.0,
        seed=seeds,
        emission=zero3,
        alive=zero > -1.0,
        prev_normal=zero3,
        rays=jnp.sum(zero),
    )


def trace_paths_impl(
    scene: SceneArrays,
    origins: jax.Array,
    directions: jax.Array,
    seeds: jax.Array,
    cfg: RenderConfig,
) -> tuple[jax.Array, jax.Array]:
    """Trace one path per lane, whole loop in one traceable graph.

    Returns (radiance [N, 3], rays_traced []).  Seeds must already include
    the jitter draws consumed by the caller (RayGen.hlsl:81-84).  Used
    inside shard_map and the driver compile check; interactive callers
    should prefer the per-bounce ``bounce_step`` dispatch (see Renderer),
    which compiles ~max_bounces times faster on CPU.
    """
    st = init_path_state(origins, directions, seeds)
    st = jax.lax.fori_loop(0, cfg.max_bounces, _bounce_body(scene, cfg), st)
    return st["emission"], st["rays"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def bounce_step_jit(scene, st, bounce, cfg: RenderConfig) -> dict:
    """Jitted single-bounce step (compiled once, reused every bounce/frame)."""
    return _bounce_body(scene, cfg)(bounce, st)


@functools.partial(jax.jit, static_argnames=("cfg",))
def trace_paths(scene, origins, directions, seeds, cfg: RenderConfig):
    """Jitted single-device trace_paths_impl; returns radiance [N, 3]."""
    return trace_paths_impl(scene, origins, directions, seeds, cfg)[0]
