"""ReSTIR GI path sampling: the reconnection-shift path tracer of pass 1.

Port of SamplePathSimple (Path_Sampler_v6.hlsl:3-286) in step form so the
renderer can dispatch it as small jits:

  gi_init     — the initial BSDF bounce that finds the reconnection vertex
                xn/nn (:35-106); a light hit invalidates the lane (:55-59)
  gi_bounce   — one of ``gi_bounces`` iterations: 4 MIS-weighted NEE
                samples + 1 BSDF continuation, streaming contributions
                into the GI reservoir keyed at the reconnection vertex
                (:111-269)
  gi_finalize — deferred shadow validation of the winning NEE sample
                (:271-283)

Deviation: when a BSDF continuation ray escapes the scene the reference
continues from an UNINITIALIZED payload (the miss shader writes only the
material id); we terminate the lane instead — physically the path left the
scene and contributes nothing further.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.config import EPSILON, RenderConfig, S_BIAS
from royaltracer_dx_tpu.ops import bsdf, restir
from royaltracer_dx_tpu.ops.reservoir import ReservoirGI, update_reservoir_gi
from royaltracer_dx_tpu.utils import math3d as m3
from royaltracer_dx_tpu.utils.rng import tea_batch, tea_random


def _select_strategy(mat, outgoing, normal, seed):
    return bsdf.select_strategy(
        mat["ks"], mat["metal"], mat["rough"], normal, outgoing, seed
    )


def gi_init(scene, cfg: RenderConfig, x1, n1, outgoing, mid, seed):
    """Initial BSDF bounce -> reconnection vertex (state dict)."""
    mat = restir.fetch_material(scene, mid)
    outgoing = m3.normalize(outgoing)
    strategy, _, seed = _select_strategy(mat, outgoing, n1, seed)
    sample, seed = bsdf.sample_bsdf(strategy, mat["ks"], mat["rough"],
                                    outgoing, n1, seed)
    hit = restir.trace_closest(scene, x1, sample, cfg, t_min=S_BIAS)
    hmat = restir.fetch_material(scene, hit["mid"])
    hit_light = m3.length(hmat["ke"]) > 0.0
    active = hit["valid"] & ~hit_light

    # blended two-lobe F and P at the initial vertex (:66-84)
    f = bsdf.eval_bsdf_blend(mat["kd"], mat["ks"], mat["metal"], mat["rough"],
                             mat["lut"], n1, -sample, outgoing)
    p = bsdf.pdf_bsdf_blend(mat["ks"], mat["metal"], mat["rough"],
                            n1, -sample, outgoing)
    ndotl = m3.dot(n1, sample)

    zero3 = x1 * 0.0
    return dict(
        active=active,
        acc_f=jnp.where(active[:, None], f * ndotl[:, None], 1.0),
        acc_f_recon=zero3 + 1.0,
        acc_pdf=jnp.where(active, p, 1.0),
        acc_l=zero3,
        origin=hit["pos"],
        normal=hit["normal"],
        outgoing=-sample,
        mid=hit["mid"],
        xn=hit["pos"],
        nn=m3.normalize(hit["normal"]),
        x1_shadow=zero3,
        x2_shadow=zero3,
        reservoir=ReservoirGI.zeros_like_lanes(x1),
        seed=seed,
    )


def gi_bounce(scene, cfg: RenderConfig, st: dict, bounce: jax.Array) -> dict:
    """One GI bounce: nee_samples NEE + one BSDF continuation (:111-269)."""
    n = st["origin"].shape[0]
    seed = st["seed"]
    active = st["active"]
    mat = restir.fetch_material(scene, st["mid"])
    outgoing = m3.normalize(st["outgoing"])
    normal = st["normal"]
    origin = st["origin"]
    reservoir = st["reservoir"]

    strategy, _, seed = _select_strategy(mat, outgoing, normal, seed)

    # ---- 3a: NEE samples (SampleLightNEE_GI, solid-angle MIS; no shadow
    # ray here — validation is deferred to gi_finalize)
    nee = cfg.nee_samples
    cands, seed = restir.nee_candidates(
        scene, origin, normal, outgoing, mat, strategy, seed, nee
    )
    # convert to the _GI variant's solid-angle pdfs & cosine-only G
    cos_x = jnp.abs(m3.dot(normal[:, None, :], cands["l_norm"]))
    cos_y = jnp.maximum(m3.dot(cands["n2"], -cands["l_norm"]), 0.0)
    dist2 = cands["dist"] ** 2
    pdf_light_sa = jnp.where(
        cos_y > 0.0,
        cands["pdf_light"] * dist2 / jnp.maximum(cos_y, EPSILON),
        0.0,
    )
    matb = {k: v[:, None] if v.ndim == 1 else v[:, None, :] for k, v in mat.items()}
    brdf = bsdf.eval_bsdf_blend(
        matb["kd"], matb["ks"], matb["metal"], matb["rough"], matb["lut"],
        normal[:, None, :], -cands["l_norm"], outgoing[:, None, :],
    )
    pdf_b_sa = bsdf.pdf_bsdf_blend(
        matb["ks"], matb["metal"], matb["rough"],
        normal[:, None, :], -cands["l_norm"], outgoing[:, None, :],
    )
    pdf_b_sa = jnp.where(jnp.isfinite(pdf_b_sa), pdf_b_sa, 0.0)

    throughput_nee = brdf * cos_x[..., None]               # [N, M, 3]
    contrib = jnp.where(
        (st["acc_pdf"][:, None] * pdf_light_sa > 0.0)[..., None],
        cands["emission"] * st["acc_f"][:, None, :] * throughput_nee
        / jnp.maximum((st["acc_pdf"][:, None] * pdf_light_sa)[..., None], 1e-20),
        0.0,
    )
    mi = pdf_light_sa / jnp.maximum(nee * pdf_light_sa + pdf_b_sa, 1e-20)
    e_path = mi[..., None] * contrib
    wi = m3.linearize(e_path)
    wi = jnp.where(jnp.isfinite(wi), wi, 0.0)
    acc_l = st["acc_l"]
    x1_shadow = st["x1_shadow"]
    x2_shadow = st["x2_shadow"]
    for j in range(nee):
        e_recon = (
            st["acc_f_recon"] * mi[:, j, None]
            * cands["emission"][:, j] * throughput_nee[:, j]
        )
        reservoir, took, seed = update_reservoir_gi(
            reservoir, active & (wi[:, j] >= 0.0), wi[:, j], jnp.zeros(n),
            st["xn"], m3.normalize(st["nn"]), e_recon, seed,
        )
        acc_l = acc_l + jnp.where(active[:, None], e_path[:, j], 0.0)
        t3 = took[:, None]
        x1_shadow = jnp.where(t3, origin + S_BIAS * m3.normalize(normal), x1_shadow)
        x2_shadow = jnp.where(t3, cands["x2"][:, j], x2_shadow)

    # ---- 3b: BSDF continuation (SampleLightBSDF_GI)
    strategy, _, seed = _select_strategy(mat, outgoing, normal, seed)
    sample, seed = bsdf.sample_bsdf(strategy, mat["ks"], mat["rough"],
                                    outgoing, normal, seed)
    hit = restir.trace_closest(scene, origin, sample, cfg, t_min=S_BIAS)
    hmat = restir.fetch_material(scene, hit["mid"])
    hit_light = (m3.length(hmat["ke"]) > 0.0) & hit["valid"]

    f = bsdf.eval_bsdf_blend(mat["kd"], mat["ks"], mat["metal"], mat["rough"],
                             mat["lut"], normal, -sample, outgoing)
    p = bsdf.pdf_bsdf_blend(mat["ks"], mat["metal"], mat["rough"],
                            normal, -sample, outgoing)
    ndotl = m3.dot(normal, sample)
    throughput_b = f * ndotl[:, None]

    l_vec = hit["pos"] - origin
    dist2_b = jnp.maximum(m3.dot(l_vec, l_vec), EPSILON)
    cos_t = m3.dot(hit["normal"], -sample)
    # light pdf in solid angle, with the reference's missing-1/area quirk.
    # cos_t <= 0 (light hit from its backside) would make this NEGATIVE and
    # push the MIS denominator (nee*pdf_light + p) through zero — the
    # 1e18-firefly pole; a backside light is unreachable by NEE so its
    # sampling pdf is zero.
    pdf_light_b = jnp.where(
        hit_light & (cos_t > 0.0),
        (m3.luminance_avg(hmat["ke"]) / jnp.maximum(scene.lights.total_weight, EPSILON))
        * dist2_b / jnp.maximum(cos_t, EPSILON),
        0.0,
    )

    # a sampled direction whose blended pdf vanished (clamped grazing /
    # backside lobes) cannot contribute an unbiased estimate — drop it
    valid_pdf = p > 1e-7
    acc_pdf_new = st["acc_pdf"] * p
    acc_f_new = st["acc_f"] * throughput_b
    acc_f_recon_new = st["acc_f_recon"] * throughput_b

    contrib_b = jnp.where(
        (hit_light & valid_pdf & (acc_pdf_new > 1e-20))[:, None],
        hmat["ke"] * acc_f_new / jnp.maximum(acc_pdf_new, 1e-20)[:, None],
        0.0,
    )
    has_contrib = m3.length(contrib_b) > 0.0
    mi_b = p / jnp.maximum(nee * pdf_light_b + p, 1e-20)
    e_recon_b = acc_f_recon_new * mi_b[:, None] * hmat["ke"]
    e_path_b = mi_b[:, None] * contrib_b
    wi_b = m3.linearize(e_path_b)
    wi_b = jnp.where(jnp.isfinite(wi_b), wi_b, 0.0)

    update_mask = active & has_contrib
    reservoir, _, seed = update_reservoir_gi(
        reservoir, update_mask, wi_b, jnp.zeros(n),
        st["xn"], m3.normalize(st["nn"]), e_recon_b, seed,
    )
    acc_l = acc_l + jnp.where(update_mask[:, None], e_path_b, 0.0)

    # path advance: light hit => break (:260); miss or degenerate-pdf
    # sample => terminate (deviation)
    still = active & ~has_contrib & hit["valid"] & valid_pdf
    a3 = active[:, None]
    return dict(
        active=still,
        acc_f=jnp.where(a3, acc_f_new, st["acc_f"]),
        acc_f_recon=jnp.where(a3, acc_f_recon_new, st["acc_f_recon"]),
        acc_pdf=jnp.where(active, acc_pdf_new, st["acc_pdf"]),
        acc_l=acc_l,
        origin=jnp.where(a3, hit["pos"], st["origin"]),
        normal=jnp.where(a3, hit["normal"], st["normal"]),
        outgoing=jnp.where(a3, -sample, st["outgoing"]),
        mid=jnp.where(active, hit["mid"], st["mid"]),
        xn=st["xn"],
        nn=st["nn"],
        x1_shadow=x1_shadow,
        x2_shadow=x2_shadow,
        reservoir=reservoir,
        seed=seed,
    )


def gi_finalize(scene, cfg: RenderConfig, st: dict):
    """Deferred shadow validation of the winning NEE sample (:271-283).

    Returns (reservoir, acc_l debug radiance, seed)."""
    d = st["x2_shadow"] - st["x1_shadow"]
    dist = m3.length(d)
    needs = (cfg.nee_samples > 0) & (dist > EPSILON)
    t_min = dist * 0.0 + 0.5 * S_BIAS
    t_max = jnp.maximum(S_BIAS, dist - S_BIAS * 5.0)
    occ = restir.trace_occluded(scene, st["x1_shadow"], m3.normalize(d),
                                t_min, t_max, cfg)
    kill = needs & occ
    reservoir = st["reservoir"].replace(
        w_sum=jnp.where(kill, 0.0, st["reservoir"].w_sum)
    )
    return reservoir, st["acc_l"], st["seed"]
