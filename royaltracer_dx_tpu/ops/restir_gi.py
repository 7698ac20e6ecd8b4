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

Everything runs PLANAR (component planes, utils/pvec.py) with the NEE
candidates streamed ONE AT A TIME in flat [N] layout — candidate-major
[M, N] batches pad M=4 to the 8-sublane tile and every op pays the padded
traffic (see restir.nee_candidate_at_p).  The carried state dict holds
planar vecs.

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
from royaltracer_dx_tpu.ops.reservoir import update_reservoir_p
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.utils.rng import tea_random

_GI_KEYS = ("xn", "nn", "e3")


def _zero_reservoir(like: jax.Array) -> dict:
    z = like * 0.0
    zv = (z, z, z)
    return dict(xn=zv, nn=zv, e3=zv, w_sum=z, w=z, m=z)


def gi_init(scene, cfg: RenderConfig, x1, n1, outgoing, mid, seed,
            live=None):
    """Initial BSDF bounce -> reconnection vertex (planar state dict).

    x1/n1/outgoing: planar vecs over [N] lanes.  live: lanes whose GI
    state is consumed (the caller's sampling mask); the rest trace dead
    segments — see restir.trace_closest_p."""
    mat = restir.fetch_material_p(scene, mid)
    outgoing = pv.normalize(outgoing)
    strategy, _, seed = bsdf.select_strategy_p(
        mat["ks"], mat["metal"], mat["rough"], n1, outgoing, seed
    )
    sample, seed = bsdf.sample_bsdf_p(strategy, mat["ks"], mat["rough"],
                                      outgoing, n1, seed)
    hit = restir.trace_closest_p(scene, x1, sample, cfg,
                                 t_min=S_BIAS, coherent=False, live=live)
    hmat = restir.fetch_material_p(scene, hit["mid"])
    hit_light = pv.length(hmat["ke"]) > 0.0
    active = hit["valid"] & ~hit_light

    # blended two-lobe F and P at the initial vertex (:66-84)
    f = bsdf.eval_bsdf_blend_p(mat["kd"], mat["ks"], mat["metal"], mat["rough"],
                               mat["lut"], n1, sample, outgoing)
    p = bsdf.pdf_bsdf_blend_p(mat["ks"], mat["metal"], mat["rough"],
                              n1, sample, outgoing)
    ndotl = pv.dot(n1, sample)

    zero = x1[0] * 0.0
    one = zero + 1.0
    zv = (zero, zero, zero)
    return dict(
        active=active,
        acc_f=pv.where(active, pv.scale(f, ndotl), (one, one, one)),
        acc_f_recon=(one, one, one),
        acc_pdf=jnp.where(active, p, 1.0),
        acc_l=zv,
        origin=hit["pos"],
        normal=hit["normal"],
        outgoing=pv.neg(sample),
        mid=hit["mid"],
        xn=hit["pos"],
        nn=pv.normalize(hit["normal"]),
        x1_shadow=zv,
        x2_shadow=zv,
        reservoir=_zero_reservoir(zero),
        seed=seed,
    )


def gi_bounce(scene, cfg: RenderConfig, st: dict, bounce: jax.Array) -> dict:
    """One GI bounce: nee_samples NEE + one BSDF continuation (:111-269)."""
    seed = st["seed"]
    active = st["active"]
    mat = restir.fetch_material_p(scene, st["mid"])
    outgoing = pv.normalize(st["outgoing"])
    normal = st["normal"]
    origin = st["origin"]
    reservoir = st["reservoir"]
    zero = active.astype(jnp.float32) * 0.0

    strategy, _, seed = bsdf.select_strategy_p(
        mat["ks"], mat["metal"], mat["rough"], normal, outgoing, seed
    )

    # ---- 3a: NEE samples (SampleLightNEE_GI, solid-angle MIS; no shadow
    # ray here — validation is deferred to gi_finalize).  Candidates
    # stream one at a time in flat [N] layout (bit-identical to the old
    # candidate-major [M, N] batch, whose M=4 rows padded to 8 sublanes —
    # see restir.nee_candidate_at_p).
    nee = cfg.nee_samples
    seed_c = seed
    _, seed = tea_random(seed)
    acc_l = st["acc_l"]
    x1_shadow = st["x1_shadow"]
    x2_shadow = st["x2_shadow"]
    shadow_o = pv.add(origin, pv.scale(pv.normalize(normal), S_BIAS))
    for j in range(nee):
        c = restir.nee_candidate_at_p(
            scene, origin, normal, outgoing, mat, seed_c, j
        )
        # convert to the _GI variant's solid-angle pdfs & cosine-only G
        cos_x = jnp.abs(pv.dot(normal, c["l_norm"]))
        cos_y = jnp.maximum(pv.dot(c["n2"], pv.neg(c["l_norm"])), 0.0)
        dist2 = c["dist"] ** 2
        pdf_light_sa = jnp.where(
            cos_y > 0.0,
            c["pdf_light"] * dist2 / jnp.maximum(cos_y, EPSILON),
            0.0,
        )
        brdf = bsdf.eval_bsdf_blend_p(
            mat["kd"], mat["ks"], mat["metal"], mat["rough"], mat["lut"],
            normal, c["l_norm"], outgoing,
        )
        pdf_b_sa = bsdf.pdf_bsdf_blend_p(
            mat["ks"], mat["metal"], mat["rough"], normal, c["l_norm"],
            outgoing,
        )
        pdf_b_sa = jnp.where(jnp.isfinite(pdf_b_sa), pdf_b_sa, 0.0)

        throughput_nee = pv.scale(brdf, cos_x)
        denom = st["acc_pdf"] * pdf_light_sa
        contrib = pv.where(
            denom > 0.0,
            pv.scale(pv.mul(pv.mul(c["emission"], st["acc_f"]),
                            throughput_nee),
                     1.0 / jnp.maximum(denom, 1e-20)),
            pv.splat(zero),
        )
        mi = pdf_light_sa / jnp.maximum(nee * pdf_light_sa + pdf_b_sa, 1e-20)
        e_path = pv.scale(contrib, mi)
        wi = pv.length(e_path)
        wi = jnp.where(jnp.isfinite(wi), wi, 0.0)
        e_recon = pv.mul(
            pv.scale(st["acc_f_recon"], mi),
            pv.mul(c["emission"], throughput_nee),
        )
        reservoir, took, seed = update_reservoir_p(
            reservoir, _GI_KEYS, active & (wi >= 0.0), wi, zero,
            (st["xn"], pv.normalize(st["nn"]), e_recon), seed,
        )
        acc_l = pv.add(acc_l, pv.where(active, e_path, pv.splat(zero)))
        x1_shadow = pv.where(took, shadow_o, x1_shadow)
        x2_shadow = pv.where(took, c["x2"], x2_shadow)

    # ---- 3b: BSDF continuation (SampleLightBSDF_GI)
    strategy, _, seed = bsdf.select_strategy_p(
        mat["ks"], mat["metal"], mat["rough"], normal, outgoing, seed
    )
    sample, seed = bsdf.sample_bsdf_p(strategy, mat["ks"], mat["rough"],
                                      outgoing, normal, seed)
    hit = restir.trace_closest_p(scene, origin, sample,
                                 cfg, t_min=S_BIAS, coherent=False,
                                 live=active)
    hmat = restir.fetch_material_p(scene, hit["mid"])
    hit_light = (pv.length(hmat["ke"]) > 0.0) & hit["valid"]

    f = bsdf.eval_bsdf_blend_p(mat["kd"], mat["ks"], mat["metal"], mat["rough"],
                               mat["lut"], normal, sample, outgoing)
    p = bsdf.pdf_bsdf_blend_p(mat["ks"], mat["metal"], mat["rough"],
                              normal, sample, outgoing)
    ndotl = pv.dot(normal, sample)
    throughput_b = pv.scale(f, ndotl)

    l_vec = pv.sub(hit["pos"], origin)
    dist2_b = jnp.maximum(pv.dot(l_vec, l_vec), EPSILON)
    cos_t = pv.dot(hit["normal"], pv.neg(sample))
    # light pdf in solid angle, with the reference's missing-1/area quirk.
    # cos_t <= 0 (light hit from its backside) would make this NEGATIVE and
    # push the MIS denominator (nee*pdf_light + p) through zero — the
    # 1e18-firefly pole; a backside light is unreachable by NEE so its
    # sampling pdf is zero.
    pdf_light_b = jnp.where(
        hit_light & (cos_t > 0.0),
        (pv.avg(hmat["ke"]) / jnp.maximum(scene.lights.total_weight, EPSILON))
        * dist2_b / jnp.maximum(cos_t, EPSILON),
        0.0,
    )

    # a sampled direction whose blended pdf vanished (clamped grazing /
    # backside lobes) cannot contribute an unbiased estimate — drop it
    valid_pdf = p > 1e-7
    acc_pdf_new = st["acc_pdf"] * p
    acc_f_new = pv.mul(st["acc_f"], throughput_b)
    acc_f_recon_new = pv.mul(st["acc_f_recon"], throughput_b)

    contrib_b = pv.where(
        hit_light & valid_pdf & (acc_pdf_new > 1e-20),
        pv.scale(pv.mul(hmat["ke"], acc_f_new),
                 1.0 / jnp.maximum(acc_pdf_new, 1e-20)),
        pv.splat(zero),
    )
    has_contrib = pv.length(contrib_b) > 0.0
    mi_b = p / jnp.maximum(nee * pdf_light_b + p, 1e-20)
    e_recon_b = pv.mul(pv.scale(acc_f_recon_new, mi_b), hmat["ke"])
    e_path_b = pv.scale(contrib_b, mi_b)
    wi_b = pv.length(e_path_b)
    wi_b = jnp.where(jnp.isfinite(wi_b), wi_b, 0.0)

    update_mask = active & has_contrib
    reservoir, _, seed = update_reservoir_p(
        reservoir, _GI_KEYS, update_mask, wi_b, zero,
        (st["xn"], pv.normalize(st["nn"]), e_recon_b), seed,
    )
    acc_l = pv.add(acc_l, pv.where(update_mask, e_path_b, pv.splat(zero)))

    # path advance: light hit => break (:260); miss or degenerate-pdf
    # sample => terminate (deviation)
    still = active & ~has_contrib & hit["valid"] & valid_pdf
    return dict(
        active=still,
        acc_f=pv.where(active, acc_f_new, st["acc_f"]),
        acc_f_recon=pv.where(active, acc_f_recon_new, st["acc_f_recon"]),
        acc_pdf=jnp.where(active, acc_pdf_new, st["acc_pdf"]),
        acc_l=acc_l,
        origin=pv.where(active, hit["pos"], st["origin"]),
        normal=pv.where(active, hit["normal"], st["normal"]),
        outgoing=pv.where(active, pv.neg(sample), st["outgoing"]),
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

    Returns (planar reservoir dict, acc_l planar radiance, seed)."""
    d = pv.sub(st["x2_shadow"], st["x1_shadow"])
    dist = pv.length(d)
    needs = (cfg.nee_samples > 0) & (dist > EPSILON)
    t_min = dist * 0.0 + 0.5 * S_BIAS
    # lanes with no winning NEE sample (zero shadow vectors) trace a
    # DEAD segment (t_max < t_min) instead of a real micro-ray — they
    # stop fattening the traversal's per-tile cull unions
    t_max = jnp.where(needs, jnp.maximum(S_BIAS, dist - S_BIAS * 5.0), 0.0)
    occ = restir.trace_occluded(scene, st["x1_shadow"],
                                pv.normalize(d), t_min, t_max, cfg)
    kill = needs & occ
    reservoir = dict(st["reservoir"])
    reservoir["w_sum"] = jnp.where(kill, 0.0, reservoir["w_sum"])
    return reservoir, st["acc_l"], st["seed"]
