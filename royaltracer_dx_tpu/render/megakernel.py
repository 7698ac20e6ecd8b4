"""The v5 "megakernel" path tracer — the framework's correctness oracle.

A faithful JAX re-expression of the reference's first-generation renderer:
bounce loop in raygen (RayGen.hlsl:80-137), shading in closest-hit with
RIS-of-10 NEE light selection + one shadow ray + balance-heuristic MIS
against the BSDF continuation (Hit.hlsl:126-381), russian roulette after
depth 3 (RayGen.hlsl:118-130).

Where the DXR version runs one divergent thread per pixel, this version is
one jitted program over dense SoA lanes.  TPU layout rules shape the code:

  * All hot math is PLANAR (component planes, utils/pvec.py): an [N, 3]
    AoS vector puts 3 in the 128-wide lane dim and wastes 97% of the VPU.
  * The RIS candidate batch is CANDIDATE-MAJOR [M, N]: lanes stay full and
    the per-candidate reductions (CDF cumsum, reservoir pick) walk the
    cheap sublane axis.
  * Per-lane table reads (materials, lights, the GGX E_ss LUT) avoid TPU
    row gathers (~7 ns/row, serializing) — small tables use one-hot
    select loops, the LUT uses a hat-basis interpolation, and triangle
    attributes come from single wide-row gathers (intersect.py).

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
from royaltracer_dx_tpu.ops import bsdf
from royaltracer_dx_tpu.ops import restir as restir_ops
from royaltracer_dx_tpu.ops.intersect import interpolate_hit_p
from royaltracer_dx_tpu.ops.light_sampling import (
    fold_barycentric,
    light_tables,
    select_light_records,
)
from royaltracer_dx_tpu.scene.types import SceneArrays
from royaltracer_dx_tpu.utils import math3d as m3
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.utils.rng import tea_batch_major, tea_random

# v5 numeric constants (Common.hlsl:1-3)
_EPS = 1e-4
_BIAS = 1e-5
_T_MIN = 1e-4
_T_MAX = 1e4

# Above this table size, the one-hot select loop loses to a row gather.
_ONEHOT_MAT_MAX = 32


def _fetch_material(scene: SceneArrays, mat_id: jax.Array) -> dict:
    """Per-lane material record as PLANAR fields.

    Returns dict(kd, ks, ke: planar vecs; rough, metal: [N]; lut: tuple of
    16 [N] planes).  Small material tables (the usual case — garage.mtl has
    3) are fetched with a gather-free one-hot select loop.
    """
    m = scene.materials
    count = m.count

    if count <= _ONEHOT_MAT_MAX:
        def sel(col):  # col: [count] -> [N]
            acc = jnp.full(mat_id.shape, col[0], col.dtype)
            for i in range(1, count):
                acc = jnp.where(mat_id == i, col[i], acc)
            return acc

        return dict(
            kd=tuple(sel(m.kd[:, c]) for c in range(3)),
            ks=tuple(sel(m.ks[:, c]) for c in range(3)),
            ke=tuple(sel(m.ke[:, c]) for c in range(3)),
            rough=sel(m.pr_pm_ps_pc[:, 0]),
            metal=sel(m.pr_pm_ps_pc[:, 1]),
            lut=tuple(sel(m.lut[:, k]) for k in range(16)),
        )

    # wide-row gather fallback: one packed [count, 27] table, one gather
    packed = jnp.concatenate(
        [m.kd[:, :3], m.ks, m.ke, m.pr_pm_ps_pc[:, :2], m.lut], axis=1
    )
    row = packed[mat_id]  # [N, 27]
    return dict(
        kd=tuple(row[:, c] for c in range(3)),
        ks=tuple(row[:, 3 + c] for c in range(3)),
        ke=tuple(row[:, 6 + c] for c in range(3)),
        rough=row[:, 9],
        metal=row[:, 10],
        lut=tuple(row[:, 11 + k] for k in range(16)),
    )


def _ris_nee(scene, mat, pos, normal, flat, outgoing, strategy, seed, ris_m,
             cfg: RenderConfig):
    """RIS over ris_m NEE candidates + one shadow ray (Hit.hlsl:183-337).

    All inputs planar ([N] planes); candidates evaluate as a CANDIDATE-MAJOR
    [M, N] planar batch.  The reference draws its 3 uniforms per candidate
    sequentially (Hit.hlsl:198,229-230); we use the counter-based
    tea_batch_major instead — same TEA hash, same distribution, different
    sequence (see utils/rng.py) — because 30 chained draws dominate XLA
    compile time.

    Returns (direct planar vec [N] — NOT yet multiplied by throughput, seed).
    """
    lights = scene.lights
    m_cand = ris_m

    us, seed = tea_batch_major(seed, 3 * m_cand)       # [3M, N]
    u_sel, xi1, xi2 = us[0::3], us[1::3], us[2::3]     # [M, N] each

    shade_origin = pv.add(pos, pv.scale(flat, _BIAS))

    rec = select_light_records(
        light_tables(lights, scene.object_to_world), lights.cdf, u_sel
    )
    lv0 = (rec[0], rec[1], rec[2])
    lv1 = (rec[3], rec[4], rec[5])
    lv2 = (rec[6], rec[7], rec[8])
    nl = (rec[9], rec[10], rec[11])
    pdf_l = rec[12]
    emission = (rec[13], rec[14], rec[15])

    bu, bv, bw = fold_barycentric(xi1, xi2)
    point = tuple(bu * a + bv * b + bw * c for a, b, c in zip(lv0, lv1, lv2))

    l_vec = pv.sub(point, shade_origin)                # [M, N] via broadcast
    dist2 = jnp.maximum(pv.dot(l_vec, l_vec), _EPS)
    dist = jnp.maximum(jnp.sqrt(dist2), _EPS)
    l_norm = pv.scale(l_vec, 1.0 / dist)

    # v5 does NOT flip the light normal toward the shading point
    cosx = jnp.maximum(_EPS, pv.dot(normal, l_norm))
    cosy = jnp.maximum(_EPS, pv.dot(nl, pv.neg(l_norm)))
    g = jnp.maximum(cosx * cosy / dist2, _EPS)

    brdf = bsdf.eval_bsdf_p(
        strategy, mat["kd"], mat["ks"], mat["rough"], mat["lut"],
        normal, l_norm, outgoing,
    )
    pdf_b = jnp.maximum(
        bsdf.pdf_bsdf_p(strategy, mat["rough"], normal, l_norm, outgoing), _EPS
    )

    f = pv.mul(emission, pv.scale(brdf, g))
    # HLSL truncation quirk: the scalar "luminance" takes channel 0 of
    # avg(Ke)*brdf*G (Hit.hlsl:280-281 assigns float3 to float)
    lum = pv.avg(emission) * brdf[0] * g
    wi = (1.0 / m_cand) * lum / pdf_l                  # [M, N]

    cdf = jnp.cumsum(wi, axis=0)
    total = cdf[-1]
    u_ris, seed = tea_random(seed)                     # Hit.hlsl:300
    thr = u_ris * total
    sel = jnp.argmax(thr < cdf, axis=0)                # first True, else 0
    hot = sel == jax.lax.iota(jnp.int32, m_cand)[:, None]  # [M, N] one-hot

    def pick(x):
        return jnp.sum(jnp.where(hot, x, 0.0), axis=0)

    f_sel = tuple(pick(c) for c in f)
    lum_sel = pick(lum)
    # WX = 1/max(EPS, p_hat) * w_sum (Hit.hlsl:312)
    wx = jnp.maximum(_EPS, 1.0 / jnp.maximum(_EPS, lum_sel) * total)

    ldir_sel = tuple(pick(c) for c in l_norm)
    dist_sel = pick(dist)
    cosy_sel = pick(cosy)
    pdfb_sel = pick(pdf_b)
    pdfl_sel = pick(pdf_l)

    so_aos = pv.to_aos(shade_origin)
    ld_aos = pv.to_aos(ldir_sel)
    t_min_s = dist_sel * 0.0 + _BIAS
    occluded = restir_ops._any_dispatch(scene, so_aos, ld_aos, cfg,
                                        t_min_s, dist_sel - _BIAS)
    visible = jnp.where(occluded, 0.0, 1.0)

    direct = pv.scale(f_sel, visible * wx)
    pdf_l_sa = jnp.maximum(_EPS, pdfl_sel * dist_sel * dist_sel / cosy_sel)
    weight_light = pdf_l_sa / (pdf_l_sa + pdfb_sel)
    return pv.scale(direct, weight_light), seed


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
        hit = restir_ops._closest_dispatch(scene, st["origin"], st["direction"],
                                           cfg, _T_MIN, _T_MAX)
        origin = pv.from_aos(st["origin"], axis=1)
        direction = pv.from_aos(st["direction"], axis=1)
        throughput = pv.from_aos(st["throughput"], axis=1)

        valid = st["alive"] & hit.valid
        pos = pv.add(origin, pv.scale(direction, hit.t))
        _, normal, flat, area = interpolate_hit_p(
            hit, scene.tri_verts, scene.tri_normals
        )
        mat_id = scene.tri_material[hit.tri]
        # flip both normals toward the ray origin (Hit.hlsl:108-111)
        to_viewer = pv.neg(direction)
        normal = pv.where(pv.dot(normal, to_viewer) < 0.0, pv.neg(normal), normal)
        flat = pv.where(pv.dot(flat, to_viewer) < 0.0, pv.neg(flat), flat)

        mat = _fetch_material(scene, mat_id)
        is_emissive = pv.length(mat["ke"]) > 0.0

        # ---- emissive hit: MIS-weighted termination (Hit.hlsl:126-174);
        # at bounce 0 the weight is 1 (throughput is still 1 there too)
        l_vec = pv.sub(pos, origin)
        dist2 = jnp.maximum(pv.dot(l_vec, l_vec), _EPS)
        l_norm = pv.scale(l_vec, jax.lax.rsqrt(dist2))
        cos_emissive = jnp.maximum(_EPS, pv.dot(normal, pv.neg(l_norm)))
        avg_ke = pv.avg(mat["ke"])
        weight_tri = area * avg_ke / jnp.maximum(scene.lights.total_weight, _EPS)
        if cfg.reference_mis_quirk:
            pdf_l = jnp.maximum(_EPS, weight_tri * dist2 / cos_emissive)
        else:
            pdf_l = jnp.maximum(
                _EPS, weight_tri / jnp.maximum(area, _EPS) * dist2 / cos_emissive
            )
        w_mis = st["pdf_prev"] / (st["pdf_prev"] + pdf_l)
        w_mis = jnp.where(bounce == 0, 1.0, w_mis)
        emissive_contrib = pv.scale(pv.mul(mat["ke"], throughput), w_mis)

        # ---- non-emissive: strategy select, RIS NEE, BSDF continuation
        outgoing = to_viewer
        strategy, _, seed = bsdf.select_strategy_p(
            mat["ks"], mat["metal"], mat["rough"], normal, outgoing, st["seed"]
        )
        direct, seed = _ris_nee(
            scene, mat, pos, normal, flat, outgoing, strategy, seed, cfg.ris_m,
            cfg,
        )
        direct = pv.mul(direct, throughput)

        new_dir, seed = bsdf.sample_bsdf_p(
            strategy, mat["ks"], mat["rough"], outgoing, normal, seed
        )
        pdf_sample = jnp.maximum(
            bsdf.pdf_bsdf_p(strategy, mat["rough"], normal, new_dir, outgoing), 1e-4
        )
        brdf_sample = bsdf.eval_bsdf_p(
            strategy, mat["kd"], mat["ks"], mat["rough"], mat["lut"],
            normal, new_dir, outgoing,
        )
        cos_new = pv.dot(normal, new_dir)
        new_throughput = pv.mul(throughput, pv.scale(brdf_sample, cos_new / pdf_sample))

        shade_mask = valid & ~is_emissive
        emis_mask = valid & is_emissive

        contrib = tuple(
            jnp.where(shade_mask, jnp.abs(d), 0.0)
            + jnp.where(emis_mask, jnp.abs(e), 0.0)
            for d, e in zip(direct, emissive_contrib)
        )

        alive = shade_mask
        throughput = pv.where(shade_mask, new_throughput, throughput)
        seed = jnp.where(shade_mask[:, None], seed, st["seed"])

        # ---- russian roulette (RayGen.hlsl:118-130), active when
        # bounce > rr_threshold
        u_rr, seed_rr = tea_random(seed)
        q = jnp.clip(
            jnp.maximum(jnp.maximum(throughput[0], throughput[1]), throughput[2]),
            0.05, 1.0,
        )
        rr_on = (bounce > cfg.rr_threshold) & alive
        kill = rr_on & (u_rr > q)
        alive = alive & ~kill
        rr_scale = jnp.where(rr_on & alive, 1.0 / q, 1.0)
        throughput = pv.scale(throughput, rr_scale)
        seed = jnp.where(rr_on[:, None], seed_rr, seed)

        new_origin = pv.where(shade_mask, pv.add(pos, pv.scale(flat, _BIAS)), origin)
        new_direction = pv.where(shade_mask, new_dir, direction)
        prev_n = pv.where(shade_mask, normal, pv.from_aos(st["prev_normal"], axis=1))
        return dict(
            origin=pv.to_aos(new_origin, axis=1),
            direction=pv.to_aos(new_direction, axis=1),
            throughput=pv.to_aos(throughput, axis=1),
            pdf_prev=jnp.where(shade_mask, pdf_sample, st["pdf_prev"]),
            seed=seed,
            emission=st["emission"] + pv.to_aos(contrib, axis=1),
            alive=alive,
            prev_normal=pv.to_aos(prev_n, axis=1),
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
