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
from royaltracer_dx_tpu.ops.cluster_traverse import (
    any_hit_clustered,
    closest_hit_clustered,
)
from royaltracer_dx_tpu.ops.intersect import (
    any_hit_brute,
    as_planes3,
    closest_hit_brute,
    hit_attributes_p,
    interpolate_hit,
)
from royaltracer_dx_tpu.ops.stream_trace import (
    any_hit_stream_xla,
    closest_hit_stream_xla,
)
from royaltracer_dx_tpu.ops.traverse import any_hit_bvh, closest_hit_bvh
from royaltracer_dx_tpu.scene.types import SceneArrays
from royaltracer_dx_tpu.utils import math3d as m3
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.utils.rng import (
    tea_batch,
    tea_batch_at,
    tea_batch_major,
    tea_random,
)

_T_MAX = 1e4


# ------------------------------ tracing ---------------------------------


def _resolve_accel(scene: SceneArrays, cfg: RenderConfig) -> str:
    """cfg.accel with "auto" resolved against the (static) scene size."""
    from royaltracer_dx_tpu.config import STREAM_AUTO_MIN_TRIS

    mode = cfg.accel
    if mode == "auto":
        if scene.stream is not None and scene.num_triangles >= STREAM_AUTO_MIN_TRIS:
            return "stream"
        return "brute"
    return mode


def _is_flat(scene: SceneArrays) -> bool:
    """True when the stream accel takes the single-level FLAT trace path
    (static shape-derived; see stream_trace._trace_flat)."""
    from royaltracer_dx_tpu.ops.stream_trace import _FLAT_MAX_CLUSTERS, S

    return (scene.stream is not None
            and scene.stream.num_blocks * S <= _FLAT_MAX_CLUSTERS)


def _wants_presort(scene: SceneArrays) -> bool:
    """Morton ray presort only pays on the windowed (big-scene) path.

    The renderer's batches arrive pixel-ordered; on flat-path scenes the
    presort permutation costs more than the coherence it adds (measured
    at 1080p pass-3 visibility: 49.1 ns/ray sorted vs 32.7 unsorted,
    scripts/profile_r3m.py), while on windowed scenes it is a large win
    for scattered GI/shadow batches (round 2 measurements)."""
    return not _is_flat(scene)


def resolve_closest_mode(scene: SceneArrays, cfg: RenderConfig, n: int,
                         coherent: bool) -> str:
    """The closest-hit dispatch DECISION, as a pure static function.

    Guard-tested (tests/test_dispatch.py) so the tuned thresholds can't
    silently reroute a product batch (VERDICT r3 #7: a compaction
    auto-rule misfire once turned the 1080p garage frame 3.7 -> 18.4 s
    before being caught by hand)."""
    mode = _resolve_accel(scene, cfg)
    if (mode == "stream" and not coherent and _is_flat(scene)
            and n < (1 << 20)):
        # scattered batches at flat scenes: the flat sweep pays per-tile
        # cluster UNIONS; brute wins up to ~1M rays (r3t crossover)
        mode = "brute"
    return mode


def resolve_any_mode(scene: SceneArrays, cfg: RenderConfig, n: int) -> str:
    """The occlusion dispatch decision (pure static; guard-tested)."""
    return _resolve_accel(scene, cfg)


def wants_chunking(n: int) -> bool:
    """True when a trace batch runs as sequential lax.map chunks."""
    return n > _TRACE_CHUNK_RAYS


def wants_gi_compaction(scene: SceneArrays, cfg: RenderConfig) -> bool:
    """GI wavefront compaction decision (pure static; guard-tested).

    Compaction pays two argsorts + full-state permutations per bounce;
    that only amortizes against windowed-stream trace costs.  It engaged
    on the 2.2k-tri garage once and cost 3.7 -> 18.4 s/frame (round 3) —
    'auto' therefore requires a windowed-scale accel."""
    if cfg.gi_compaction == "on":
        return True
    from royaltracer_dx_tpu.ops.stream_trace import _FLAT_MAX_CLUSTERS, S

    return (cfg.gi_compaction == "auto" and scene.stream is not None
            and scene.stream.num_blocks * S > _FLAT_MAX_CLUSTERS)


# Trace memory scales with the ray count: the stream sweeps materialize
# per-tile fetched cluster rows ([tiles, pair, 9, G] per round) and the
# brute sweep a [N, tri_chunk] plane.  Batches beyond this cap run as
# sequential lax.map chunks — one compiled body, ~parts x smaller HLO
# temps, identical results.  (The 1080p flagship OOM: pass 3's fused 9x
# candidate-visibility batch is 18.7M segments = a 16.6 GB pass-3 program
# on a 15.7 GB chip; chunked it fits with headroom.)  4.2M-ray chunks ~
# 3.4 GB of flat-sweep temps — r3i measured the in-pass chunked trace at
# 76 ns/ray vs the 36.5 ns unit rate at 2M chunks, so fewer, larger
# chunks claw back the map overhead.
_TRACE_CHUNK_RAYS = 1 << 22


def _chunked_rays(fn, n: int, args, pad_vals):
    """Run per-ray trace ``fn(*args)`` over <=_TRACE_CHUNK_RAYS chunks.

    args: pytree of [N, ...] arrays (ray planes travel as tuples — never
    materialize [N, 3] at the lax.map boundary: TPU pads a rank-2 minor
    dim to 128 lanes, which made the round-3 fused 18.7M-segment pass-3
    batch a 16.6 GB program and its chunked trace 2x the unit rate);
    pad_vals: matching pytree of pad constants (dirs pad 1.0, t_max pads
    -1.0 = dead lanes, which every trace path already retires).
    Returns fn's pytree with leading dim N."""
    if n <= _TRACE_CHUNK_RAYS:
        return fn(*args)
    parts = -(-n // _TRACE_CHUNK_RAYS)
    chunk = -(-n // parts)
    chunk = -(-chunk // 128) * 128          # tile/chunk alignment
    padded = parts * chunk

    def prep(a, v):
        a = jnp.pad(a, [(0, padded - n)] + [(0, 0)] * (a.ndim - 1),
                    constant_values=v)
        return a.reshape((parts, chunk) + a.shape[1:])

    stacked = jax.tree.map(prep, tuple(args), tuple(pad_vals))
    out = jax.lax.map(lambda xs: fn(*xs), stacked)
    return jax.tree.map(
        lambda a: a.reshape((padded,) + a.shape[2:])[:n], out)


def _closest_dispatch(scene: SceneArrays, origins, dirs, cfg: RenderConfig,
                      t_min, t_max, coherent: bool = True):
    """The TraceRay dispatch: pick the acceleration scheme from cfg.accel.

    ``coherent=False`` marks batches whose 64-ray tiles have wide frusta
    (BSDF-sampled continuation directions).  At flat-path scene sizes
    those go to brute below 1M rays and to the stream path above: the
    (1, 1, 4, 8) schedule + exact per-ray culls made flat win the REAL
    1080p GI continuation batch (26.8 vs 36.6 ns/ray, r3m), but its
    fixed machinery only amortizes at scale — the r3t crossover sweep
    measured brute <= flat for scattered batches up to 1M rays.

    origins/dirs: [N, 3] AoS or planar 3-tuples (planar is the hot path:
    it keeps the lax.map chunk boundary free of lane-padded [N, 3]
    buffers)."""
    op, dp = as_planes3(origins), as_planes3(dirs)
    n = op[0].shape[0]
    mode = resolve_closest_mode(scene, cfg, n, coherent)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    if mode == "stream":
        def one(o, d, tn, tx):
            return closest_hit_stream_xla(o, d, scene.stream,
                                          t_min=tn, t_max=tx,
                                          wb=cfg.stream_wb,
                                          presort=_wants_presort(scene))
    elif mode == "bvh":
        def one(o, d, tn, tx):
            return closest_hit_bvh(jnp.stack(o, 1), jnp.stack(d, 1),
                                   scene.bvh, t_min=tn, t_max=tx)
    elif mode == "cluster":
        def one(o, d, tn, tx):
            return closest_hit_clustered(jnp.stack(o, 1), jnp.stack(d, 1),
                                         scene.clusters,
                                         t_min=tn, t_max=tx,
                                         tile=cfg.cluster_tile)
    else:
        def one(o, d, tn, tx):
            return closest_hit_brute(o, d, scene.tri_verts,
                                     t_min=tn, t_max=tx)
    return _chunked_rays(one, n, (op, dp, t_min, t_max),
                         ((0.0,) * 3, (1.0,) * 3, 0.0, -1.0))


def _any_dispatch(scene: SceneArrays, origins, dirs, cfg: RenderConfig,
                  t_min, t_max):
    op, dp = as_planes3(origins), as_planes3(dirs)
    n = op[0].shape[0]
    mode = resolve_any_mode(scene, cfg, n)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    if mode == "stream":
        # reverse=False: reversed far-endpoint tracing was a round-2 win
        # (5.6 -> 7.1 Mrays/s) ONLY because tile-interval block culling
        # degenerated on long forward segments; with the exact per-ray
        # block cull (r3p2 grid) forward wins on every batch (skylight
        # 24.5 vs 27.1 ms, in-field 29.4 vs 30.9 at terrain-1M).
        def one(o, d, tn, tx):
            return any_hit_stream_xla(o, d, scene.stream, tn, tx,
                                      wb=cfg.stream_wb,
                                      presort=_wants_presort(scene),
                                      reverse=False)
    elif mode == "bvh":
        def one(o, d, tn, tx):
            return any_hit_bvh(jnp.stack(o, 1), jnp.stack(d, 1),
                               scene.bvh, tn, tx)
    elif mode == "cluster":
        def one(o, d, tn, tx):
            return any_hit_clustered(jnp.stack(o, 1), jnp.stack(d, 1),
                                     scene.clusters, tn, tx,
                                     tile=cfg.cluster_tile)
    else:
        def one(o, d, tn, tx):
            return any_hit_brute(o, d, scene.tri_verts, tn, tx)
    return _chunked_rays(one, n, (op, dp, t_min, t_max),
                         ((0.0,) * 3, (1.0,) * 3, 0.0, -1.0))


def trace_closest(scene: SceneArrays, origins, dirs, cfg: RenderConfig,
                  t_min=1e-4):
    """TraceRay + ClosestHit/Miss (Hit_v6.hlsl:12-61, Miss_v6.hlsl:7).

    Returns dict(pos, normal, mid, area, obj, valid).  The v6 closest-hit
    interpolates smooth normals (flat fallback) and does NOT flip them
    toward the ray.  Miss lanes get the sentinel material id and zeroed
    geometry.
    """
    hit = _closest_dispatch(scene, origins, dirs, cfg, t_min, _T_MAX)
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
    return _any_dispatch(scene, origins, dirs, cfg, t_min, t_max)


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


# ========================== planar (TPU) core ===========================
#
# Planar-vec variants of the functions above (tuples of component planes,
# utils/pvec.py): the pass kernels run entirely in this form — an [N, 3]
# AoS op wastes 125/128 VPU lanes, and per-lane table reads become one-hot
# select loops / packed wide-row gathers instead of ~7 ns/row gathers.
# The AoS versions above remain as the reference-shaped API (aov, tests).

# Above this material count the one-hot select loop loses to a row gather.
_ONEHOT_MAT_MAX = 32


def fetch_material_p(scene: SceneArrays, mid: jax.Array) -> dict:
    """Planar MaterialOptimized fetch; sentinel ids map to the default miss
    material (Common_v6.hlsl:70-74: zeros, LUT=1)."""
    sentinel = mid == jnp.uint32(MISS_MATERIAL_ID).astype(jnp.int32)
    mats = scene.materials
    count = mats.count

    if count <= _ONEHOT_MAT_MAX:
        def sel(col, miss):
            acc = jnp.full(mid.shape, col[0], col.dtype)
            for i in range(1, count):
                acc = jnp.where(mid == i, col[i], acc)
            return jnp.where(sentinel, miss, acc)

        return dict(
            kd=tuple(sel(mats.kd[:, c], 0.0) for c in range(3)),
            ks=tuple(sel(mats.ks[:, c], 0.0) for c in range(3)),
            ke=tuple(sel(mats.ke[:, c], 0.0) for c in range(3)),
            rough=sel(mats.pr_pm_ps_pc[:, 0], 0.0),
            metal=sel(mats.pr_pm_ps_pc[:, 1], 0.0),
            lut=tuple(sel(mats.lut[:, k], 1.0) for k in range(16)),
        )

    packed = jnp.concatenate(
        [mats.kd[:, :3], mats.ks, mats.ke, mats.pr_pm_ps_pc[:, :2], mats.lut],
        axis=1,
    )
    safe = jnp.where(sentinel, 0, mid)
    row = packed[safe]  # [N, 27] single wide gather
    z = lambda v, miss: jnp.where(sentinel, miss, v)  # noqa: E731
    return dict(
        kd=tuple(z(row[..., c], 0.0) for c in range(3)),
        ks=tuple(z(row[..., 3 + c], 0.0) for c in range(3)),
        ke=tuple(z(row[..., 6 + c], 0.0) for c in range(3)),
        rough=z(row[..., 9], 0.0),
        metal=z(row[..., 10], 0.0),
        lut=tuple(z(row[..., 11 + k], 1.0) for k in range(16)),
    )


def trace_closest_p(scene: SceneArrays, origins, dirs, cfg: RenderConfig,
                    t_min=1e-4, coherent: bool = True, live=None) -> dict:
    """Planar trace_closest: planar (or AoS [N,3]) rays in, planar hit
    record out (pos/normal as planes; v6 semantics — no normal flip
    toward the ray).

    live: optional [N] bool — lanes whose hit is masked out by every
    consumer (inactive GI paths, non-sampling pixels).  They trace DEAD
    segments (t_max < t_min, the same retirement the chunk padding
    uses): every traversal path skips them and they stop fattening the
    flat sweep's per-tile cluster unions, which scattered continuation
    batches pay heavily once GI occupancy decays (0.98 -> 0.38 over the
    garage's three bounces).  Dead lanes return the miss record —
    bit-identical downstream because their values were already
    where()-ed out (r5 equality test: tests/test_restir.py)."""
    o = as_planes3(origins)
    d = as_planes3(dirs)
    t_max = _T_MAX
    if live is not None and cfg.retire_dead_lanes:
        t_max = jnp.where(live, _T_MAX, -1.0)
    hit = _closest_dispatch(scene, o, d, cfg, t_min, t_max,
                            coherent=coherent)
    pos = pv.add(o, pv.scale(d, hit.t))
    normal, _, area, mid, obj = hit_attributes_p(hit, scene.tri_table)
    valid = hit.valid
    zero = pv.splat(0.0)
    return dict(
        pos=pv.where(valid, pos, zero),
        normal=pv.where(valid, normal, zero),
        area=jnp.where(valid, area, 0.0),
        mid=jnp.where(valid, mid,
                      jnp.uint32(MISS_MATERIAL_ID).astype(jnp.int32)),
        obj=jnp.where(valid, obj, 0),
        valid=valid,
    )


def visibility_check_p(scene, x1, n1, direction, dist, cfg) -> jax.Array:
    """Planar V in {0,1} (Sampler_v6.hlsl:86-104).

    A NEGATIVE dist marks a masked lane (visibility_batch_p): its t_max
    goes negative so every traversal treats it as dead, and V = 1.0
    (callers multiply masked results out)."""
    o = pv.add(x1, pv.scale(pv.normalize(n1), S_BIAS))
    t_max = jnp.where(dist < 0.0, -1.0,
                      jnp.maximum(dist - 10.0 * S_BIAS, 2.0 * S_BIAS))
    occ = trace_occluded(scene, o, direction,
                         jnp.zeros_like(dist), t_max, cfg)
    return jnp.where(occ, 0.0, 1.0)


def visibility_batch_p(scene, queries, cfg) -> list:
    """ONE shadow trace for several planar visibility queries.

    queries: list of (x1, n1, x_to) planar vec tuples, all [N].  Each
    query's direction/dist math is exactly visibility_check_p's, and the
    trace is per-ray exact, so results are bit-identical to k separate
    checks — but the traversal pays its fixed costs (presort, block
    sort, windows) ONCE for the k*N batch instead of k times.  Returns
    the k V arrays ([N] each, in {0,1})."""
    kq = len(queries)
    n = queries[0][0][0].shape[0]

    # Group so each fused trace stays within ONE dispatch chunk: a fused
    # batch beyond _TRACE_CHUNK_RAYS is re-split by lax.map inside the
    # trace and pays per-chunk map overhead (r4e, 1080p, 9 queries:
    # fused 9N = 704.8 ms, 2N groups = 590.0, N-sized = 631.4 — the 2N
    # grouping amortizes the traversal's fixed costs without tripping
    # the chunker).  Bit-identical: the same per-query math runs either
    # way and the trace is per-ray exact.
    gsz = max(1, _TRACE_CHUNK_RAYS // max(n, 1))
    if 1 < gsz < kq:
        out = []
        for s in range(0, kq, gsz):
            out.extend(visibility_batch_p(scene, queries[s:s + gsz], cfg))
        return out

    def dist_of(q):
        """Query distance; an optional 4th element masks lanes whose
        result is multiplied out downstream (rejected candidates,
        non-shading pixels): their segment collapses to t_max <= t_min,
        so the traversal treats them as dead — they stop fattening the
        per-tile cull unions — and V returns 1.0 (never consumed)."""
        d = pv.sub(q[2], q[0])
        dist = pv.length(d)
        if len(q) > 3 and q[3] is not None:
            dist = jnp.where(q[3], dist, -1.0)
        return d, dist

    if kq == 1:
        d, dist = dist_of(queries[0])
        return [visibility_check_p(scene, queries[0][0], queries[0][1],
                                   pv.normalize(d), dist, cfg)]

    def cat(ps):
        return tuple(jnp.concatenate([p[c] for p in ps]) for c in range(3))

    x1 = cat([q[0] for q in queries])
    n1 = cat([q[1] for q in queries])
    dd = [dist_of(q) for q in queries]
    d = cat([d_ for d_, _ in dd])
    dist = jnp.concatenate([ds for _, ds in dd])
    v = visibility_check_p(scene, x1, n1, pv.normalize(d), dist, cfg)
    return [v[i * n:(i + 1) * n] for i in range(kq)]


def reconnect_di_p(x1, n1, x2, n2, l2, outgoing, mat):
    """Planar ReconnectDI (Sampler_v6.hlsl:106-131).  Returns a planar vec."""
    d = pv.sub(x2, x1)
    dist2 = pv.dot(d, d)
    dn = pv.normalize(d)
    cos1 = jnp.maximum(0.0, pv.dot(n1, dn))
    n2f = pv.where(pv.dot(n2, pv.neg(dn)) < 0.0, pv.neg(n2), n2)
    cos2 = jnp.maximum(0.0, pv.dot(n2f, pv.neg(dn)))
    f = bsdf.eval_bsdf_blend_p(
        mat["kd"], mat["ks"], mat["metal"], mat["rough"], mat["lut"],
        n1, dn, pv.normalize(outgoing),
    )
    g = cos1 * cos2 / jnp.maximum(dist2, 1e-20)
    return pv.scale(pv.mul(f, l2), g)


def reconnect_gi_p(x1, n1, xn, e3, outgoing, mat):
    """Planar GI reconnection (Sampler_v6.hlsl:134-161); non-finite zeroed."""
    d = pv.sub(xn, x1)
    dn = pv.normalize(d)
    cos1 = jnp.abs(pv.dot(n1, dn))
    f = bsdf.eval_bsdf_blend_p(
        mat["kd"], mat["ks"], mat["metal"], mat["rough"], mat["lut"],
        n1, dn, pv.normalize(outgoing),
    )
    fr = pv.mul(pv.scale(f, cos1), e3)
    finite = (
        jnp.isfinite(fr[0]) & jnp.isfinite(fr[1]) & jnp.isfinite(fr[2])
    )
    return pv.where(finite, fr, pv.splat(0.0))


def get_p_hat_di_p(scene, x1, n1, x2, n2, l2, outgoing, mat, use_visibility,
                   cfg, vis_mask=None):
    """Planar p-hat = |ReconnectDI| (x V) (Sampler_v6.hlsl:163-171).

    vis_mask (optional, with use_visibility): lanes whose p-hat is
    multiplied out downstream skip the shadow segment (dead t_max) —
    the visibility factor reads 1.0 there."""
    f = pv.length(reconnect_di_p(x1, n1, x2, n2, l2, outgoing, mat))
    if use_visibility:
        d = pv.sub(x2, x1)
        dist = pv.length(d)
        if vis_mask is not None:
            dist = jnp.where(vis_mask, dist, -1.0)
        f = f * visibility_check_p(scene, x1, n1, pv.normalize(d), dist, cfg)
    return f


def get_p_hat_gi_p(scene, x1, n1, xn, e3, outgoing, mat, use_visibility,
                   cfg, vis_mask=None):
    """Planar float3 p-hat for GI (Sampler_v6.hlsl:173-181)."""
    f = reconnect_gi_p(x1, n1, xn, e3, outgoing, mat)
    if use_visibility:
        d = pv.sub(xn, x1)
        dist = pv.length(d)
        if vis_mask is not None:
            dist = jnp.where(vis_mask, dist, -1.0)
        v = visibility_check_p(scene, x1, n1, pv.normalize(d), dist, cfg)
        f = pv.scale(f, v)
    return f


def nee_candidate_at_p(scene, x1, normal, outgoing, mat, seed, i):
    """Candidate #``i`` of the SampleLightNEE batch as flat [N] planes.

    Draws are ``tea_batch_at`` counters 3i/3i+1/3i+2 — bit-identical to
    row i of ``nee_candidates_p`` — and every intermediate (light record
    select, barycentric point, geometry term, full BSDF eval) stays [N]:
    candidate-major [M, N] tensors pad M=4 up to the 8-sublane tile and
    every op pays the padded traffic (see profile_r4s for the pass-3
    analog of this cliff).  The caller advances the seed ONCE per batch
    with ``tea_random`` (matching nee_candidates_p's advance)."""
    u_sel = tea_batch_at(seed, 3 * i)
    xi1 = tea_batch_at(seed, 3 * i + 1)
    xi2 = tea_batch_at(seed, 3 * i + 2)
    return _nee_one(scene, x1, normal, outgoing, mat, u_sel, xi1, xi2)


def nee_candidates_p(scene, x1, normal, outgoing, mat, seed, m_count):
    """Planar, CANDIDATE-MAJOR SampleLightNEE batch (Sampler_v6.hlsl:273-396,
    visibility OFF as in SampleRIS).

    x1/normal/outgoing planar [N]; returns dict of [M, N] planes/vecs:
    p_hat, pdf_light (area), pdf_bsdf (area), x2, n2, emission, l_norm,
    dist; plus the advanced seed.  Hot consumers (pass1 RIS, GI bounces)
    use the per-candidate ``nee_candidate_at_p`` instead — identical
    values, flat [N] layout.
    """
    us, seed = tea_batch_major(seed, 3 * m_count)      # [3M, N]
    u_sel, xi1, xi2 = us[0::3], us[1::3], us[2::3]
    return _nee_one(scene, x1, normal, outgoing, mat, u_sel, xi1, xi2), seed


def _nee_one(scene, x1, normal, outgoing, mat, u_sel, xi1, xi2):
    """Shared SampleLightNEE body; shape-agnostic over the uniforms'
    leading dims ([N] or [M, N])."""
    lights = scene.lights
    rec = light_sampling.select_light_records(
        light_sampling.light_tables(lights, scene.object_to_world),
        lights.cdf, u_sel,
    )
    lv0, lv1, lv2 = (rec[0], rec[1], rec[2]), (rec[3], rec[4], rec[5]), (rec[6], rec[7], rec[8])
    nl = (rec[9], rec[10], rec[11])
    pdf_l = rec[12]
    emission = (rec[13], rec[14], rec[15])

    bu, bv, bw = light_sampling.fold_barycentric(xi1, xi2)
    point = tuple(bu * a + bv * b + bw * c for a, b, c in zip(lv0, lv1, lv2))

    l_vec = pv.sub(point, x1)                          # [M, N] broadcast
    dist2 = pv.dot(l_vec, l_vec)
    dist = jnp.sqrt(jnp.maximum(dist2, EPSILON))
    l_norm = pv.scale(l_vec, 1.0 / jnp.maximum(dist, 1e-20))

    nl = pv.where(pv.dot(nl, pv.neg(l_norm)) < 0.0, pv.neg(nl), nl)  # v6 flips

    cos_x = pv.dot(normal, l_norm)
    cos_y = pv.dot(nl, pv.neg(l_norm))
    g = jnp.maximum(cos_y * cos_x / jnp.maximum(dist2, EPSILON), EPSILON)

    ob = pv.normalize(outgoing)
    brdf = bsdf.eval_bsdf_blend_p(
        mat["kd"], mat["ks"], mat["metal"], mat["rough"], mat["lut"],
        normal, l_norm, ob,
    )
    pdf_b = bsdf.pdf_bsdf_blend_p(
        mat["ks"], mat["metal"], mat["rough"], normal, l_norm, ob,
    ) * cos_y / jnp.maximum(dist2, EPSILON)
    pdf_b = jnp.where(jnp.isfinite(pdf_b), pdf_b, 0.0)

    p_hat = pv.length(pv.scale(pv.mul(emission, brdf), g))
    return dict(
        p_hat=p_hat,
        pdf_light=jnp.maximum(pdf_l, EPSILON),
        pdf_bsdf=pdf_b,
        x2=point,
        n2=nl,
        emission=emission,
        l_norm=l_norm,
        dist=dist,
    )


def bsdf_candidate_p(scene, x1, normal, outgoing, mat, strategy, seed, cfg,
                     live=None):
    """Planar SampleLightBSDF (Sampler_v6.hlsl:199-271): sample lobe, trace,
    MIS pdfs.  All planar [N].  live: see trace_closest_p."""
    nrm_o = pv.normalize(outgoing)
    sample, seed = bsdf.sample_bsdf_p(strategy, mat["ks"], mat["rough"],
                                      nrm_o, normal, seed)
    hit = trace_closest_p(scene, x1, sample, cfg,
                          t_min=S_BIAS, coherent=False, live=live)
    hmat = fetch_material_p(scene, hit["mid"])
    ke = hmat["ke"]
    is_light = pv.avg(ke) * 3.0 > EPSILON

    l_vec = pv.sub(hit["pos"], x1)
    dist2 = jnp.maximum(pv.dot(l_vec, l_vec), EPSILON)
    cos_t = pv.dot(hit["normal"], pv.neg(sample))
    # the reference's emissive pdf omits 1/area (quirk kept; cf. megakernel)
    pdf_light = pv.avg(ke) / jnp.maximum(scene.lights.total_weight, EPSILON)

    brdf = bsdf.eval_bsdf_blend_p(
        mat["kd"], mat["ks"], mat["metal"], mat["rough"], mat["lut"],
        normal, sample, nrm_o,
    )
    pdf_b = bsdf.pdf_bsdf_blend_p(
        mat["ks"], mat["metal"], mat["rough"], normal, sample, nrm_o,
    ) * cos_t / dist2
    pdf_b = jnp.where(jnp.isfinite(pdf_b), pdf_b, 0.0)

    ndot = pv.dot(normal, sample)
    p_hat = pv.length(pv.scale(pv.mul(brdf, ke), ndot * cos_t / dist2))
    p_hat = jnp.where(is_light & hit["valid"], p_hat, 0.0)
    return dict(
        p_hat=p_hat,
        pdf_light=jnp.where(is_light, pdf_light, 0.0),
        pdf_bsdf=pdf_b,
        x2=hit["pos"],
        n2=hit["normal"],
        emission=ke,
    ), seed


def jacobian_reconnection_p(x1_r, x1_q, x2q, n2q):
    """Planar reconnection-shift Jacobian (Sampler_v6.hlsl:48-68)."""
    vq = pv.sub(x2q, x1_q)
    vr = pv.sub(x2q, x1_r)
    nrm = pv.normalize(n2q)
    cos_q = jnp.abs(pv.dot(pv.normalize(pv.neg(vq)), nrm))
    cos_r = jnp.abs(pv.dot(pv.normalize(pv.neg(vr)), nrm))
    len_q = pv.dot(vq, vq)
    len_r = pv.dot(vr, vr)
    return (cos_q / jnp.maximum(cos_r, 1e-20)) * (len_r / jnp.maximum(len_q, 1e-20))


def reject_normal_p(n1, n2, threshold):
    return pv.dot(n1, n2) < threshold


def reject_distance_p(x1, x2, cam_pos, threshold):
    d1 = pv.length(pv.sub(x1, cam_pos))
    d2 = pv.length(pv.sub(x2, cam_pos))
    rel = jnp.abs(d1 - d2) / jnp.maximum(jnp.maximum(d1, d2), 1e-20)
    return rel > threshold


def reject_below_surface_p(d, n):
    return pv.dot(d, n) < 0.0


# --------------------------- reprojection -------------------------------


def reproject_to_prev_pixel_p(scene, world_pos, obj, prev_view, prev_proj,
                              width, height):
    """Planar GetBestReprojectedPixel_d (Sampler_v6.hlsl:738-785).

    world_pos: planar vec; obj: [N] int32.  The per-lane 3x3 inverse is an
    explicit adjugate on component planes (jnp.linalg.inv over [N,3,3]
    batches is catastrophically slow on TPU), and the per-instance
    transforms come from a one-hot select over the (small) instance table.
    Returns (px, py) int32 with (-1,-1) when behind the camera."""
    i_count = scene.object_to_world.shape[0]
    cur16 = scene.object_to_world.reshape(i_count, 16)
    prev16 = scene.prev_object_to_world.reshape(i_count, 16)

    def sel(col):
        acc = jnp.full(obj.shape, col[0], col.dtype)
        for i in range(1, i_count):
            acc = jnp.where(obj == i, col[i], acc)
        return acc

    if i_count <= 32:
        cur = [sel(cur16[:, k]) for k in range(12)]
        prev = [sel(prev16[:, k]) for k in range(12)]
    else:
        rows_c = cur16[obj]
        rows_p = prev16[obj]
        cur = [rows_c[:, k] for k in range(12)]
        prev = [rows_p[:, k] for k in range(12)]

    # row-major [r00 r01 r02 t0 | r10 r11 r12 t1 | r20 r21 r22 t2]
    r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2 = cur
    # adjugate inverse of the rotation/scale block
    c00 = r11 * r22 - r12 * r21
    c01 = r02 * r21 - r01 * r22
    c02 = r01 * r12 - r02 * r11
    c10 = r12 * r20 - r10 * r22
    c11 = r00 * r22 - r02 * r20
    c12 = r02 * r10 - r00 * r12
    c20 = r10 * r21 - r11 * r20
    c21 = r01 * r20 - r00 * r21
    c22 = r00 * r11 - r01 * r10
    det = r00 * c00 + r01 * c01 + r02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    dx = world_pos[0] - t0
    dy = world_pos[1] - t1
    dz = world_pos[2] - t2
    lx = (c00 * dx + c01 * dy + c02 * dz) * inv_det
    ly = (c10 * dx + c11 * dy + c12 * dz) * inv_det
    lz = (c20 * dx + c21 * dy + c22 * dz) * inv_det

    p00, p01, p02, pt0, p10, p11, p12, pt1, p20, p21, p22, pt2 = prev
    pwx = p00 * lx + p01 * ly + p02 * lz + pt0
    pwy = p10 * lx + p11 * ly + p12 * lz + pt1
    pwz = p20 * lx + p21 * ly + p22 * lz + pt2

    vp = prev_proj @ prev_view  # 4x4, scalar entries
    clip_x = vp[0, 0] * pwx + vp[0, 1] * pwy + vp[0, 2] * pwz + vp[0, 3]
    clip_y = vp[1, 0] * pwx + vp[1, 1] * pwy + vp[1, 2] * pwz + vp[1, 3]
    w = vp[3, 0] * pwx + vp[3, 1] * pwy + vp[3, 2] * pwz + vp[3, 3]
    good = w > 0.0
    inv_w = 1.0 / jnp.maximum(w, 1e-20)
    ux = (clip_x * inv_w) * 0.5 + 0.5
    uy = 1.0 - ((clip_y * inv_w) * 0.5 + 0.5)
    px = jnp.round(ux * width).astype(jnp.int32)
    py = jnp.round(uy * height).astype(jnp.int32)
    return jnp.where(good, px, -1), jnp.where(good, py, -1)


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
