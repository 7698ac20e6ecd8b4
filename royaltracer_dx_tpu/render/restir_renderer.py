"""ReSTIR DI+GI progressive renderer — the reference's flagship pipeline.

Functional port of the three DispatchRays passes (Renderer.cpp:611-673):

  pass 1  RayGen_v6_pass1.hlsl — primary trace, RIS over 4 NEE + 1 BSDF
          DI candidates, visibility-checked W, GI path sampling into a
          reconnection-vertex reservoir
  pass 2  RayGen_v6_pass2.hlsl — temporal reuse: reproject the primary hit
          through prev instance/view matrices, pairwise-MIS merge of last
          frame's reservoirs (M caps 16)
  pass 3  RayGen_v6_pass3.hlsl — spatial reuse: <=3 candidates from <=9
          weighted-disk tries (r=20), pairwise-MIS merges (canonical p-hat
          uses visibility rays), final shade ReconnectDI*W + f_GI*W_GI,
          temporal accumulation with camera-motion reset, ping-pong of the
          'last' buffers

All buffers are SoA pytrees over flat row-major pixels.  (The reference's
4x4 MapPixelID swizzle, Common_v6.hlsl:173-198, is a GPU memory-layout
optimization with no observable effect — row-major here.)

Intentional deviations (each documented at its site):
  * out-of-bounds reprojected pixels are rejected (the reference indexes
    garbage memory);
  * spatial candidate tries that land on the center pixel count as failed
    tries instead of redrawing;
  * GI continuation rays that escape the scene terminate the lane.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from royaltracer_dx_tpu.camera import Camera, generate_rays
from royaltracer_dx_tpu.config import EPSILON, MISS_MATERIAL_ID, RenderConfig, S_BIAS
from royaltracer_dx_tpu.ops import bsdf, restir, restir_gi
from royaltracer_dx_tpu.ops.reservoir import (
    ReservoirDI,
    ReservoirGI,
    SampleData,
    get_w,
    is_valid_di,
    is_valid_gi,
    update_reservoir_di,
    update_reservoir_gi,
)
from royaltracer_dx_tpu.render.framebuffer import Framebuffer, accumulate
from royaltracer_dx_tpu.scene.scene import Scene
from royaltracer_dx_tpu.utils import math3d as m3
from royaltracer_dx_tpu.utils.rng import pixel_seed
from royaltracer_dx_tpu.utils.image import write_png  # noqa: F401 (convenience)


def _pixel_grid(cfg):
    ys, xs = jnp.meshgrid(jnp.arange(cfg.height), jnp.arange(cfg.width), indexing="ij")
    return xs.ravel(), ys.ravel()


def _sentinel(mid):
    return mid == jnp.uint32(MISS_MATERIAL_ID).astype(jnp.int32)


# ================================ PASS 1 =================================


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass1_di(scene, cam: dict, frame: jax.Array, cfg: RenderConfig):
    """Primary trace + SampleRIS + visibility W (pass1:49-171).

    Returns (reservoir_DI, sdata, gi_inputs dict, seed)."""
    xs, ys = _pixel_grid(cfg)
    seed = pixel_seed(xs, ys, 1, frame)
    origins, dirs = generate_rays(cam, cfg.width, cfg.height, None)
    dirs = m3.normalize(dirs)

    hit = restir.trace_closest(scene, origins, dirs, cfg, t_min=1e-4)
    mid = hit["mid"]
    mat = restir.fetch_material(scene, mid)
    emissive = m3.length(mat["ke"]) > 0.0
    sampling = hit["valid"] & ~emissive

    outgoing = -dirs
    reservoir = ReservoirDI.zeros_like_lanes(origins)

    # ---- SampleRIS (Sampler_v6.hlsl:653-736)
    strategy, _, seed = bsdf.select_strategy(
        mat["ks"], mat["metal"], mat["rough"], hit["normal"], outgoing, seed
    )
    m1, m2 = cfg.nee_samples_di, cfg.bsdf_samples_di
    cands, seed = restir.nee_candidates(
        scene, hit["pos"], hit["normal"], outgoing, mat, strategy, seed, m1
    )
    # wi = mi * p_hat / pdf_candidate with the balance-heuristic mi; the
    # pdf cancels algebraically (wi = p_hat / (M1*pdf_l + M2*pdf_b)), which
    # avoids the 0/0 at clamped-pdf candidates
    for i in range(m1):
        pdf_l = cands["pdf_light"][:, i]
        pdf_b = cands["pdf_bsdf"][:, i]
        p_hat = cands["p_hat"][:, i]
        wi = p_hat / jnp.maximum(m1 * pdf_l + m2 * pdf_b, 1e-20)
        ok = sampling & (p_hat > 0.0) & jnp.isfinite(wi)
        reservoir, _, seed = update_reservoir_di(
            reservoir, ok, wi, jnp.zeros_like(wi),
            cands["x2"][:, i], cands["n2"][:, i], cands["emission"][:, i], seed,
        )
    for _ in range(m2):
        bc, seed = restir.bsdf_candidate(
            scene, hit["pos"], hit["normal"], outgoing, mat, strategy, seed, cfg
        )
        wi = bc["p_hat"] / jnp.maximum(m1 * bc["pdf_light"] + m2 * bc["pdf_bsdf"], 1e-20)
        ok = sampling & (bc["p_hat"] > 0.0) & jnp.isfinite(wi) & (bc["pdf_bsdf"] > 0.0)
        reservoir, _, seed = update_reservoir_di(
            reservoir, ok, wi, jnp.zeros_like(wi), bc["x2"], bc["n2"], bc["emission"], seed,
        )
    reservoir = reservoir.replace(m=jnp.where(sampling, 1.0, reservoir.m))

    sdata = SampleData(
        x1=jnp.where(sampling[:, None], hit["pos"], 0.0),
        n1=jnp.where(sampling[:, None], m3.normalize(hit["normal"]), 0.0),
        o=jnp.where(sampling[:, None], outgoing, 0.0),
        l1=jnp.where(hit["valid"][:, None], mat["ke"], 0.0),
        mid=mid,
        obj=hit["obj"],
    )

    # visibility-checked W (pass1:166-167)
    p_hat = restir.get_p_hat_di(
        scene, sdata.x1, sdata.n1, reservoir.x2, reservoir.n2, reservoir.l2,
        sdata.o, mat, True, cfg,
    )
    reservoir = reservoir.replace(w=jnp.where(sampling, get_w(reservoir.w_sum, p_hat), 0.0))

    gi_inputs = dict(
        x1=sdata.x1, n1=hit["normal"], o=sdata.o, mid=mid, sampling=sampling
    )
    return reservoir, sdata, gi_inputs, seed


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass1_gi_init(scene, gi_inputs, seed, cfg: RenderConfig):
    st = restir_gi.gi_init(
        scene, cfg, gi_inputs["x1"], gi_inputs["n1"], gi_inputs["o"],
        gi_inputs["mid"], seed,
    )
    st["active"] = st["active"] & gi_inputs["sampling"]
    return st


pass1_gi_bounce = jax.jit(restir_gi.gi_bounce, static_argnames=("cfg",))


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass1_gi_final(scene, gi_inputs, st, cfg: RenderConfig):
    """gi_finalize + W_GI (pass1:176-181)."""
    reservoir, _, seed = restir_gi.gi_finalize(scene, cfg, st)
    mat = restir.fetch_material(scene, gi_inputs["mid"])
    f_c = m3.linearize(
        restir.get_p_hat_gi(
            scene, gi_inputs["x1"], m3.normalize(gi_inputs["n1"]),
            reservoir.xn, reservoir.e3, gi_inputs["o"], mat, False, cfg,
        )
    )
    sampling = gi_inputs["sampling"]
    reservoir = reservoir.replace(
        w=jnp.where(sampling, get_w(reservoir.w_sum, f_c), 0.0),
        m=jnp.where(sampling, 1.0, 0.0),
    )
    return reservoir, seed


# ================================ PASS 2 =================================


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass2_temporal(scene, cam, frame, cur_di: ReservoirDI, cur_gi: ReservoirGI,
                   sdata: SampleData, last_di, last_gi, last_sdata,
                   cfg: RenderConfig):
    """Temporal reuse (RayGen_v6_pass2.hlsl:47-204)."""
    xs, ys = _pixel_grid(cfg)
    seed = pixel_seed(xs, ys, 2, frame)
    cam_pos = cam["view_inv"][:3, 3]

    shading = ~jnp.any(sdata.l1 != 0.0, axis=-1)

    px, py = restir.reproject_to_prev_pixel(
        scene, sdata.x1, sdata.obj, cam["prev_view"], cam["prev_proj"],
        cfg.width, cfg.height,
    )
    in_bounds = (px >= 0) & (px < cfg.width) & (py >= 0) & (py < cfg.height)
    idx = jnp.clip(py, 0, cfg.height - 1) * cfg.width + jnp.clip(px, 0, cfg.width - 1)

    l_di = jax.tree.map(lambda a: a[idx], last_di)
    l_gi = jax.tree.map(lambda a: a[idx], last_gi)
    l_sd = jax.tree.map(lambda a: a[idx], last_sdata)

    mat = restir.fetch_material(scene, sdata.mid)

    # ---- DI acceptance (pass2:89-97); the reference omits the bounds
    # check and reads garbage — we require in_bounds
    accept_di = (
        shading & in_bounds
        & (m3.length(l_sd.l1) == 0.0)
        & is_valid_di(l_di)
        & ~restir.reject_distance(sdata.x1, l_sd.x1, cam_pos, 0.1)
        & (l_di.x2[:, 0] != 0.0) & (l_di.x2[:, 1] != 0.0) & (l_di.x2[:, 2] != 0.0)
        & (l_sd.mid == sdata.mid)
    )

    cap = float(cfg.temporal_m_cap)
    m_sum = jnp.minimum(cap, cur_di.m) + jnp.minimum(cap, l_di.m)
    mi_c = restir.pairwise_mis_canonical_temporal(cur_di.m, l_di.m, m_sum, cap)
    mi_t = restir.pairwise_mis_noncanonical_temporal(cur_di.m, l_di.m, m_sum, cap)
    last_n2_zero = m3.length(l_di.n2) == 0.0
    mi_c = jnp.where(last_n2_zero, 1.0, mi_c)
    mi_t = jnp.where(last_n2_zero, 0.0, mi_t)

    w_c = mi_c * restir.get_p_hat_di(
        scene, sdata.x1, sdata.n1, cur_di.x2, cur_di.n2, cur_di.l2,
        sdata.o, mat, False, cfg,
    ) * cur_di.w
    w_t = mi_t * restir.get_p_hat_di(
        scene, sdata.x1, sdata.n1, l_di.x2, l_di.n2, l_di.l2,
        sdata.o, mat, True, cfg,
    ) * l_di.w

    merged = cur_di.replace(
        m=jnp.where(accept_di, jnp.minimum(cap, cur_di.m), cur_di.m),
        w_sum=jnp.where(accept_di, w_c, cur_di.w_sum),
    )
    merged, _, seed = update_reservoir_di(
        merged, accept_di, w_t, jnp.minimum(cap, l_di.m),
        l_di.x2, l_di.n2, l_di.l2, seed,
    )
    p_hat = restir.get_p_hat_di(
        scene, sdata.x1, sdata.n1, merged.x2, merged.n2, merged.l2,
        sdata.o, mat, False, cfg,
    )
    merged = merged.replace(
        w=jnp.where(accept_di, get_w(merged.w_sum, p_hat), merged.w)
    )

    # ---- GI acceptance (pass2:99-106)
    accept_gi = (
        shading & in_bounds
        & (m3.length(l_sd.l1) == 0.0)
        & ~restir.reject_w_sum(l_gi.w_sum, cfg.w_sum_threshold)
        & ~restir.reject_distance(sdata.x1, l_sd.x1, cam_pos, 0.1)
        & is_valid_gi(l_gi)
        & (l_sd.mid == sdata.mid)
    )
    cap_gi = float(cfg.temporal_m_cap_gi)
    m_sum_gi = jnp.minimum(cap_gi, cur_gi.m) + jnp.minimum(cap_gi, l_gi.m)
    mi_c_gi = restir.pairwise_mis_canonical_temporal(cur_gi.m, l_gi.m, m_sum_gi, cap_gi)
    mi_t_gi = restir.pairwise_mis_noncanonical_temporal(cur_gi.m, l_gi.m, m_sum_gi, cap_gi)

    f_c = restir.get_p_hat_gi(scene, sdata.x1, sdata.n1, cur_gi.xn, cur_gi.e3,
                              sdata.o, mat, False, cfg)
    w_c_gi = mi_c_gi * m3.linearize(f_c) * cur_gi.w
    f_t = restir.get_p_hat_gi(scene, sdata.x1, sdata.n1, l_gi.xn, l_gi.e3,
                              sdata.o, mat, True, cfg)
    w_t_gi = mi_t_gi * m3.linearize(f_t) * l_gi.w

    merged_gi = cur_gi.replace(
        m=jnp.where(accept_gi, jnp.minimum(cap_gi, cur_gi.m), cur_gi.m),
        w_sum=jnp.where(accept_gi, w_c_gi, cur_gi.w_sum),
    )
    merged_gi, _, seed = update_reservoir_gi(
        merged_gi, accept_gi, w_t_gi, jnp.minimum(cap_gi, l_gi.m),
        l_gi.xn, l_gi.nn, l_gi.e3, seed,
    )
    p_hat_gi = m3.linearize(
        restir.get_p_hat_gi(scene, sdata.x1, sdata.n1, merged_gi.xn,
                            merged_gi.e3, sdata.o, mat, False, cfg)
    )
    merged_gi = merged_gi.replace(
        w=jnp.where(accept_gi, get_w(merged_gi.w_sum, p_hat_gi), merged_gi.w)
    )
    return merged, merged_gi


# ================================ PASS 3 =================================


def _pick_first_k(accept: jax.Array, k: int):
    """Indices of the first k True tries per lane: (idx [N,k], ok [N,k])."""
    n = accept.shape[0]
    if k == 0:
        return (jnp.zeros((n, 0), jnp.int32), jnp.zeros((n, 0), bool))
    c = jnp.cumsum(accept.astype(jnp.int32), axis=-1)
    idxs, oks = [], []
    for v in range(k):
        hitv = accept & (c == v + 1)
        idxs.append(jnp.argmax(hitv, axis=-1))
        oks.append(jnp.any(hitv, axis=-1))
    return jnp.stack(idxs, -1), jnp.stack(oks, -1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass3_spatial(scene, cam, frame, cur_di: ReservoirDI, cur_gi: ReservoirGI,
                  sdata: SampleData, cfg: RenderConfig):
    """Spatial reuse + final shade (RayGen_v6_pass3.hlsl:47-463).

    Returns (radiance sample [N,3], shaded_mask, out_di, out_gi)."""
    xs, ys = _pixel_grid(cfg)
    n = cfg.num_pixels
    seed = pixel_seed(xs, ys, 3, frame)
    cam_pos = cam["view_inv"][:3, 3]
    shading = ~jnp.any(sdata.l1 != 0.0, axis=-1)
    mat = restir.fetch_material(scene, sdata.mid)
    k = cfg.spatial_candidate_count

    def gather(tree, idx):
        return jax.tree.map(lambda a: a[idx], tree)

    # ---- DI candidates (pass3:107-142)
    nx, ny, is_center, seed = restir.spatial_candidate_pixels(
        xs, ys, cfg.width, cfg.height, cfg.spatial_radius,
        cfg.spatial_exponent, cfg.spatial_max_tries, seed,
    )
    pidx = ny * cfg.width + nx                          # [N, T]
    cand_sd = gather(sdata, pidx)
    cand_di = gather(cur_di, pidx)
    accept = (
        ~is_center
        & ~restir.reject_normal(sdata.n1[:, None, :], cand_sd.n1, 0.9)
        & ~restir.reject_distance(sdata.x1[:, None, :], cand_sd.x1, cam_pos, 0.1)
        & is_valid_di(cand_di)
        & (m3.length(cand_sd.l1) == 0.0)
        & ~_sentinel(cand_sd.mid)
        & (cand_sd.mid == sdata.mid[:, None])
    )
    di_idx, di_ok = _pick_first_k(accept, k)           # [N, k]
    di_pix = jnp.take_along_axis(pidx, di_idx, axis=-1)

    cap = float(cfg.spatial_m_cap)
    nb_di = gather(cur_di, di_pix)                      # [N, k] fields
    nb_sd = gather(sdata, di_pix)
    m_sum = jnp.minimum(cap, cur_di.m) + jnp.sum(
        jnp.where(di_ok, jnp.minimum(cap, nb_di.m), 0.0), axis=-1
    )

    # canonical MIS (MIS_v6.hlsl:2-35); p_hat_from uses VISIBILITY rays
    c_m_min = jnp.minimum(cap, cur_di.m)
    c_m_max = m_sum - c_m_min
    p_c = restir.get_p_hat_di(scene, sdata.x1, sdata.n1, cur_di.x2, cur_di.n2,
                              cur_di.l2, sdata.o, mat, False, cfg)
    c_m_num = c_m_min * p_c
    mi_c = c_m_min / jnp.maximum(m_sum, 1e-9)
    for v in range(k):
        nb_x1 = nb_sd.x1[:, v]
        nb_n1 = nb_sd.n1[:, v]
        nb_o = nb_sd.o[:, v]
        p_from = restir.get_p_hat_di(scene, nb_x1, nb_n1, cur_di.x2, cur_di.n2,
                                     cur_di.l2, nb_o, mat, True, cfg)
        n_m_min = jnp.minimum(cap, nb_di.m[:, v])
        m_den = c_m_num + c_m_max * p_from
        ratio = jnp.where(m_den > 0.0, (n_m_min / jnp.maximum(m_sum, 1e-9)) * (c_m_num / jnp.maximum(m_den, 1e-20)), 0.0)
        mi_c = mi_c + jnp.where(di_ok[:, v], ratio, 0.0)

    w_c = mi_c * p_c * cur_di.w
    out_di = cur_di.replace(
        m=jnp.where(shading, c_m_min, cur_di.m),
        w_sum=jnp.where(shading, w_c, cur_di.w_sum),
    )

    # noncanonical merges (MIS_v6.hlsl:38-60)
    for v in range(k):
        nb = gather(cur_di, di_pix[:, v])
        nbs = gather(sdata, di_pix[:, v])
        p_from = restir.get_p_hat_di(scene, nbs.x1, nbs.n1, cur_di.x2, cur_di.n2,
                                     cur_di.l2, nbs.o, mat, False, cfg)
        m_num = (m_sum - c_m_min) * p_from
        m_den = m_num + c_m_min * p_c
        mi_s = jnp.where(
            m_den > 0.0,
            (jnp.minimum(cap, nb.m) / jnp.maximum(m_sum, 1e-9)) * (m_num / jnp.maximum(m_den, 1e-20)),
            0.0,
        )
        w_s = mi_s * restir.get_p_hat_di(
            scene, sdata.x1, sdata.n1, nb.x2, nb.n2, nb.l2, sdata.o, mat, False, cfg
        ) * nb.w
        ok = shading & di_ok[:, v]
        out_di, _, seed = update_reservoir_di(
            out_di, ok, w_s, jnp.minimum(cap, nb.m), nb.x2, nb.n2, nb.l2, seed,
        )

    # ---- GI candidates (pass3:144-189)
    nxg, nyg, is_center_g, seed = restir.spatial_candidate_pixels(
        xs, ys, cfg.width, cfg.height, cfg.spatial_radius,
        cfg.spatial_exponent, cfg.spatial_max_tries, seed,
    )
    pidx_g = nyg * cfg.width + nxg
    cand_sd_g = gather(sdata, pidx_g)
    cand_gi = gather(cur_gi, pidx_g)
    jac = restir.jacobian_reconnection(
        cand_sd_g.x1, sdata.x1[:, None, :], cand_gi.xn, cand_gi.nn
    )
    accept_g = (
        ~is_center_g
        & (mat["rough"] > 0.3)[:, None]
        & ~restir.reject_distance(sdata.x1[:, None, :], cand_sd_g.x1, cam_pos, 0.1)
        & ~restir.reject_below_surface(
            m3.normalize(cand_gi.xn - sdata.x1[:, None, :]), sdata.n1[:, None, :]
        )
        & ~restir.reject_w_sum(cand_gi.w_sum, cfg.w_sum_threshold)
        & is_valid_gi(cand_gi)
        & ~restir.reject_jacobian(jac, cfg.j_threshold)
        & (m3.length(cand_sd_g.l1) == 0.0)
        & ~_sentinel(cand_sd_g.mid)
        & (cand_sd_g.mid == sdata.mid[:, None])
    )
    gi_idx, gi_ok = _pick_first_k(accept_g, k)
    gi_pix = jnp.take_along_axis(pidx_g, gi_idx, axis=-1)

    cap_g = float(cfg.spatial_m_cap_gi)
    nb_gi = gather(cur_gi, gi_pix)
    m_sum_g = jnp.minimum(cap_g, cur_gi.m) + jnp.sum(
        jnp.where(gi_ok, jnp.minimum(cap_g, nb_gi.m), 0.0), axis=-1
    )

    cg_m_min = jnp.minimum(cap_g, cur_gi.m)
    cg_m_max = m_sum_g - cg_m_min
    p_c_gi = m3.linearize(
        restir.get_p_hat_gi(scene, sdata.x1, sdata.n1, cur_gi.xn, cur_gi.e3,
                            sdata.o, mat, False, cfg)
    )
    cg_num = cg_m_min * p_c_gi
    mi_c_gi = cg_m_min / jnp.maximum(m_sum_g, 1e-9)
    for v in range(k):
        nbs = gather(sdata, gi_pix[:, v])
        j_v = restir.jacobian_reconnection(sdata.x1, nbs.x1, cur_gi.xn, cur_gi.nn)
        p_from = m3.linearize(
            restir.get_p_hat_gi(scene, nbs.x1, nbs.n1, cur_gi.xn, cur_gi.e3,
                                nbs.o, mat, True, cfg)
        ) * j_v
        m_den = cg_num + cg_m_max * p_from
        ratio = jnp.where(
            m_den > 0.0,
            (jnp.minimum(cap_g, nb_gi.m[:, v]) / jnp.maximum(m_sum_g, 1e-9))
            * (cg_num / jnp.maximum(m_den, 1e-20)),
            0.0,
        )
        mi_c_gi = mi_c_gi + jnp.where(gi_ok[:, v], ratio, 0.0)
    mi_c_gi = jnp.clip(mi_c_gi, 0.0, 1.0)

    w_c_gi = mi_c_gi * p_c_gi * cur_gi.w
    out_gi = cur_gi.replace(
        m=jnp.where(shading, cg_m_min, cur_gi.m),
        w_sum=jnp.where(shading, w_c_gi, cur_gi.w_sum),
    )

    for v in range(k):
        nb = gather(cur_gi, gi_pix[:, v])
        nbs = gather(sdata, gi_pix[:, v])
        j_mis = restir.jacobian_reconnection(sdata.x1, nbs.x1, cur_gi.xn, cur_gi.nn)
        p_from = m3.linearize(
            restir.get_p_hat_gi(scene, nbs.x1, nbs.n1, cur_gi.xn, cur_gi.e3,
                                nbs.o, mat, False, cfg)
        ) * j_mis
        m_num = (m_sum_g - cg_m_min) * p_from
        m_den = m_num + cg_m_min * p_c_gi
        mi_s = jnp.where(
            m_den > 0.0,
            jnp.clip((jnp.minimum(cap_g, nb.m) / jnp.maximum(m_sum_g, 1e-9))
                     * (m_num / jnp.maximum(m_den, 1e-20)), 0.0, 1.0),
            0.0,
        )
        j_shift = restir.jacobian_reconnection(nbs.x1, sdata.x1, nb.xn, nb.nn)
        f_s = m3.linearize(
            restir.get_p_hat_gi(scene, sdata.x1, sdata.n1, nb.xn, nb.e3,
                                sdata.o, mat, True, cfg)
        )
        w_s = mi_s * f_s * nb.w * j_shift
        ok = shading & gi_ok[:, v] & (j_shift != 0.0)
        out_gi, _, seed = update_reservoir_gi(
            out_gi, ok, w_s, jnp.minimum(cap_g, nb.m), nb.xn, nb.nn, nb.e3, seed,
        )

    # ---- final shade (pass3:334-372)
    p_hat_final = restir.get_p_hat_di(
        scene, sdata.x1, sdata.n1, out_di.x2, out_di.n2, out_di.l2,
        sdata.o, mat, True, cfg,
    )
    out_di = out_di.replace(
        w=jnp.where(shading, get_w(out_di.w_sum, p_hat_final), out_di.w)
    )
    radiance = restir.reconnect_di(
        sdata.x1, sdata.n1, out_di.x2, out_di.n2, out_di.l2, sdata.o, mat
    ) * out_di.w[:, None]

    f_gi_final = restir.get_p_hat_gi(
        scene, sdata.x1, sdata.n1, out_gi.xn, out_gi.e3, sdata.o, mat, False, cfg
    )
    out_gi = out_gi.replace(
        w=jnp.where(shading, get_w(out_gi.w_sum, m3.linearize(f_gi_final)), out_gi.w)
    )
    radiance = radiance + f_gi_final * out_gi.w[:, None]
    radiance = jnp.where(shading[:, None], radiance, 0.0)
    return radiance, shading, out_di, out_gi


# ============================== RENDERER =================================


class RestirRenderer:
    """Progressive ReSTIR DI+GI renderer over a Scene (flagship pipeline)."""

    def __init__(self, scene: Scene, camera: Camera, cfg: RenderConfig):
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.materials = scene.build_materials()
        self.scene_arrays = scene.flatten(
            self.materials, build_bvh=cfg.use_bvh, bvh_leaf_size=cfg.bvh_leaf_size
        )
        n = cfg.num_pixels
        lanes = jnp.zeros((n, 3))
        self.last_di = ReservoirDI.zeros_like_lanes(lanes)
        self.last_gi = ReservoirGI.zeros_like_lanes(lanes)
        self.last_sdata = SampleData(
            x1=jnp.zeros((n, 3)), n1=jnp.zeros((n, 3)), o=jnp.zeros((n, 3)),
            l1=jnp.zeros((n, 3)),
            mid=jnp.full((n,), jnp.uint32(MISS_MATERIAL_ID).astype(jnp.int32)),
            obj=jnp.zeros((n,), jnp.int32),
        )
        self.fb = Framebuffer.create(n)
        self.l1 = jnp.zeros((n, 3))
        self.frame = 0
        self._prev_view = jnp.zeros((4, 4), jnp.float32)
        self._prev_proj = jnp.zeros((4, 4), jnp.float32)
        self.metrics: dict = {}

    def _camera_arrays(self) -> dict:
        mats = self.camera.matrices(self.cfg.width / self.cfg.height)
        cam = {k: jnp.asarray(v) for k, v in mats.items()}
        cam["prev_view"] = self._prev_view
        cam["prev_proj"] = self._prev_proj
        return cam

    def update(self, camera: Camera | None = None):
        if camera is not None:
            self.camera = camera
        self.scene_arrays = self.scene.flatten(self.materials, prev=self.scene_arrays)

    def render(self) -> None:
        cfg = self.cfg
        scene = self.scene_arrays
        cam = self._camera_arrays()
        frame = jnp.uint32(self.frame)
        t0 = time.perf_counter()

        res_di, sdata, gi_in, seed = pass1_di(scene, cam, frame, cfg)
        st = pass1_gi_init(scene, gi_in, seed, cfg)
        for b in range(cfg.gi_bounces):
            st = pass1_gi_bounce(scene, cfg, st, jnp.uint32(b))
        res_gi, _ = pass1_gi_final(scene, gi_in, st, cfg)

        res_di, res_gi = pass2_temporal(
            scene, cam, frame, res_di, res_gi, sdata,
            self.last_di, self.last_gi, self.last_sdata, cfg,
        )

        sample, shaded, out_di, out_gi = pass3_spatial(
            scene, cam, frame, res_di, res_gi, sdata, cfg
        )

        changed = jnp.any(jnp.abs(cam["view"] - self._prev_view) > S_BIAS)
        self.fb = accumulate(self.fb, sample, changed, cfg.max_accum_frames)
        self.l1 = sdata.l1

        # ping-pong: pass 3 writes last buffers only for shaded lanes
        sh3 = shaded[:, None]
        self.last_di = jax.tree.map(
            lambda new, old: jnp.where(sh3 if new.ndim == 2 else shaded, new, old),
            out_di, self.last_di,
        )
        self.last_gi = jax.tree.map(
            lambda new, old: jnp.where(sh3 if new.ndim == 2 else shaded, new, old),
            out_gi, self.last_gi,
        )
        self.last_sdata = jax.tree.map(
            lambda new, old: jnp.where(
                sh3 if new.ndim == 2 else shaded, new, old
            ),
            sdata, self.last_sdata,
        )
        self.fb.accum.block_until_ready()
        dt = time.perf_counter() - t0
        self._prev_view = cam["view"]
        self._prev_proj = cam["proj"]
        self.frame += 1
        # dispatched ray lanes per frame (lock-step: masked lanes still pay):
        # pass1 = primary + bsdf-DI + W-visibility + GI(init + per-bounce
        # (1 cont) + final shadow); pass2 = 2 vis; pass3 = (2k+1) DI vis +
        # 2k+? GI vis  (see pass fns) — counted structurally:
        k = cfg.spatial_candidate_count
        rays_per_pixel = (3 + 1) + (1 + cfg.gi_bounces + 1) + 2 + (3 * k + 1 + 2)
        rays = cfg.num_pixels * rays_per_pixel
        self.metrics = dict(
            frame_time_s=dt,
            fps=1.0 / max(dt, 1e-9),
            frame=self.frame,
            rays_traced=rays,
            mrays_per_s=rays / dt / 1e6,
        )

    def radiance(self) -> np.ndarray:
        """Linear image: accumulated ReSTIR shade, L1 passthrough for
        emissive-primary pixels (pass3:458-463)."""
        avg = self.fb.accum / np.maximum(np.asarray(self.fb.count), 1.0)[:, None]
        l1 = np.asarray(self.l1)
        emissive = (l1 != 0).any(axis=-1)
        out = np.where(emissive[:, None], l1, np.asarray(avg))
        return out.reshape(self.cfg.height, self.cfg.width, 3)

    def image(self, srgb: bool = True) -> np.ndarray:
        img = self.radiance()
        img = np.nan_to_num(img, nan=0.0, posinf=0.0)
        if srgb:
            img = np.asarray(m3.srgb_gamma(jnp.clip(jnp.asarray(img), 0.0, None)))
        return np.clip(img, 0.0, 1.0)
