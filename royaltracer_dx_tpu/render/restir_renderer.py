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

TPU layout (see render/megakernel.py for the rationale):
  * inside the passes everything is PLANAR (component planes, utils/pvec);
    reservoirs/sample records cross pass boundaries as dicts of planes and
    only materialize as the AoS structs for the persistent inter-frame
    state (checkpointing keeps its format);
  * neighbor taps (temporal reprojection, spatial disk) gather ONE packed
    wide row per pixel instead of a dozen per-field row gathers (~7 ns/row
    on TPU) — int fields ride along bitcast to f32;
  * spatial candidate tries run UNROLLED, one flat [N] pipeline per try
    (gather 32 B accept shard -> accept chain -> claim a first-k slot);
    [T, N] try-major tensors pad T=9 to 16 sublanes and measured ~10x
    slower end-to-end (profile_r4s).  Chosen candidates re-gather their
    payload shards by pixel index — narrow-row gathers are ~free
    (profile_r4p).

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
    is_valid_di_p,
    is_valid_gi_p,
    planes_to_di,
    planes_to_gi,
    planes_to_sdata,
    update_reservoir_p,
)
from royaltracer_dx_tpu.render.framebuffer import Framebuffer, accumulate
from royaltracer_dx_tpu.scene.scene import Scene
from royaltracer_dx_tpu.utils import math3d as m3
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.utils.rng import (
    pixel_seed,
    tea_batch_at,
    tea_batch_major,
    tea_random,
)
from royaltracer_dx_tpu.utils.image import write_png  # noqa: F401 (convenience)

_DI_KEYS = ("x2", "n2", "l2")
_GI_KEYS = ("xn", "nn", "e3")


def _pixel_grid(cfg):
    ys, xs = jnp.meshgrid(jnp.arange(cfg.height), jnp.arange(cfg.width), indexing="ij")
    return xs.ravel(), ys.ravel()


def _sentinel(mid):
    return mid == jnp.uint32(MISS_MATERIAL_ID).astype(jnp.int32)


def _zero_di(like: jax.Array) -> dict:
    z = like * 0.0
    zv = (z, z, z)
    return dict(x2=zv, n2=zv, l2=zv, w_sum=z, w=z, m=z)


# ----------------------- packed wide-row gathers -------------------------

_F = jnp.float32
_I = jnp.int32


def _tap_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Every packed-record row gather (pass-2 reprojection, pass-3 taps
    and payloads) goes through this seam: profilers stub it for
    gather-vs-math decompositions, and the formulation is pinned in one
    place (r5f, honest harness: narrow [N, 8] rows ~5.9 ns/row f32 /
    ~4.2 f16; wide merges LOSE at N-sized tables — 24-col rows cost 5x)."""
    return table[idx]


def _pack_record(sd: dict, res: dict, keys: tuple,
                 dtype=jnp.float32) -> tuple:
    """sdata planes + reservoir planes -> THREE [N, 8] shard arrays.

    Shard layout (measured: gathers from a 2M-row table cost ~5 ns/row
    at 32 B rows but ~41 ns/row at 104 B — profile_r3j — so the record
    is stored as narrow shards and each consumer gathers only the shards
    it needs; pass 3 reads S0 for all 9 accept tries and S1/S2 only for
    the k chosen candidates):

      S0: x1(3) n1(3) mid flags     -- every accept test's columns
      S1: vec0(3) vec1(3) w_sum obj -- GI jacobian tries + payloads
      S2: o(3) vec2(3) w m          -- chosen-candidate epilogue

    flags = (|l1| == 0) + 2 * is_valid, evaluated on the STORED-dtype
    values so half-precision records stay self-consistent; l1 itself is
    not stored — no consumer reads more than its zero test (the actual
    emissive radiance state lives in last_sdata / the sharded renderer's
    l1 buffer).  Int ids travel as float VALUES (exact for |id| < 2^24;
    the miss sentinel -2 too); bitcasting would make small ids f32
    denormals, which the TPU flushes to zero.

    dtype=float16 is the reference's half-precision reservoir storage
    (RayGen_v6 reservoirs compiled with -enable-16bit-types,
    DXRHelper.h:122-133): rows shrink to 16 bytes/shard, compute stays
    f32 (cfg.record_dtype).  fp16 keeps ids exact below 2^11 — asserted
    at flatten time."""
    v0, v1, v2 = (res[k] for k in keys)
    stored = [jnp.stack(list(sd["x1"]) + list(sd["n1"]), -1),
              jnp.stack(list(v0) + list(v1) + [res["w_sum"]], -1),
              jnp.stack(list(sd["o"]) + list(v2)
                        + [res["w"], res["m"]], -1)]
    stored = [s.astype(dtype).astype(_F) for s in stored]
    def len_sq(v3):
        # pv.length(v) == 0 / > 0 tests reduce to sum-of-squares tests
        # (sqrt is exact at 0); keeping the same arithmetic preserves the
        # reference predicates bit-for-bit, including underflow behavior
        return (v3[..., 0] * v3[..., 0] + v3[..., 1] * v3[..., 1]
                + v3[..., 2] * v3[..., 2])

    l1s = jnp.stack(list(sd["l1"]), -1).astype(dtype).astype(_F)
    l1_zero = len_sq(l1s) == 0.0
    w_sum_s = stored[1][..., 6]
    m_s = stored[2][..., 7]
    if keys[0] == "x2":     # DI validity (reservoir.is_valid_di_p)
        valid = ((len_sq(stored[1][..., 3:6]) > 0.0)      # n2
                 & (len_sq(stored[2][..., 3:6]) > 0.0)    # l2
                 & (w_sum_s > 0.0) & (m_s > 0.0))
    else:                   # GI validity (reservoir.is_valid_gi_p)
        valid = (w_sum_s > 0.0) & (m_s > 0.0)
    flags = l1_zero.astype(_F) + 2.0 * valid.astype(_F)
    s0 = jnp.concatenate(
        [stored[0], sd["mid"].astype(_F)[..., None], flags[..., None]],
        axis=-1)
    s1 = jnp.concatenate([stored[1], sd["obj"].astype(_F)[..., None]],
                         axis=-1)
    return (s0.astype(dtype), s1.astype(dtype), stored[2].astype(dtype))


def _unpack_record(rows: tuple, keys: tuple) -> tuple[dict, dict]:
    """Gathered shard rows (s0, s1, s2) -> (sdata planes, reservoir
    planes) with [...] leaves.  Half-precision rows upcast on load.
    sd carries ``l1_zero`` (the only l1 fact stored) and ``flags``;
    res carries a pre-baked ``valid``."""
    r0, r1, r2 = (r.astype(_F) for r in rows)
    flags = r0[..., 7]
    sd = dict(
        x1=(r0[..., 0], r0[..., 1], r0[..., 2]),
        n1=(r0[..., 3], r0[..., 4], r0[..., 5]),
        o=(r2[..., 0], r2[..., 1], r2[..., 2]),
        mid=r0[..., 6].astype(_I),
        obj=r1[..., 7].astype(_I),
        l1_zero=(jnp.floor(flags * 0.5) * 2.0 != flags),  # bit0
    )
    res = {keys[0]: (r1[..., 0], r1[..., 1], r1[..., 2]),
           keys[1]: (r1[..., 3], r1[..., 4], r1[..., 5]),
           keys[2]: (r2[..., 3], r2[..., 4], r2[..., 5]),
           "w_sum": r1[..., 6], "w": r2[..., 6], "m": r2[..., 7],
           "valid": flags >= 2.0}
    return sd, res


def _shards_from_legacy(rows: jax.Array, keys: tuple) -> tuple:
    """Convert a round-2 monolithic [N, 26] packed table (column order
    x1 n1 o l1 mid obj vec0 vec1 vec2 w_sum w m) into the shard tuple —
    checkpoint backward compatibility only."""
    c = rows.astype(_F)
    sd = dict(x1=(c[..., 0], c[..., 1], c[..., 2]),
              n1=(c[..., 3], c[..., 4], c[..., 5]),
              o=(c[..., 6], c[..., 7], c[..., 8]),
              l1=(c[..., 9], c[..., 10], c[..., 11]),
              mid=c[..., 12].astype(_I), obj=c[..., 13].astype(_I))
    res = {keys[0]: (c[..., 14], c[..., 15], c[..., 16]),
           keys[1]: (c[..., 17], c[..., 18], c[..., 19]),
           keys[2]: (c[..., 20], c[..., 21], c[..., 22]),
           "w_sum": c[..., 23], "w": c[..., 24], "m": c[..., 25]}
    return _pack_record(sd, res, keys, rows.dtype)


def _unpack_res(r1: jax.Array, r2: jax.Array, keys: tuple) -> dict:
    """Reservoir planes from gathered S1/S2 rows only (skips the S0
    gather when the caller already has the sdata columns — e.g. pass 2's
    GI record, whose sdata half duplicates the DI table's)."""
    r1 = r1.astype(_F)
    r2 = r2.astype(_F)
    return {keys[0]: (r1[..., 0], r1[..., 1], r1[..., 2]),
            keys[1]: (r1[..., 3], r1[..., 4], r1[..., 5]),
            keys[2]: (r2[..., 3], r2[..., 4], r2[..., 5]),
            "w_sum": r1[..., 6], "w": r2[..., 6], "m": r2[..., 7]}


# ================================ PASS 1 =================================


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass1_di(scene, cam: dict, frame: jax.Array, cfg: RenderConfig,
             xs=None, ys=None):
    """Primary trace + SampleRIS + visibility W (pass1:49-171).

    xs/ys: optional GLOBAL pixel coordinates of this call's lanes (defaults
    to the full image grid; a pixel-band shard passes its band).
    Returns (reservoir_DI planes, sdata planes, gi_inputs dict, seed)."""
    if xs is None:
        xs, ys = _pixel_grid(cfg)
    seed = pixel_seed(xs, ys, 1, frame)
    origins, dirs = generate_rays(cam, cfg.width, cfg.height, None,
                                  xs=xs, ys=ys)
    dirs = m3.normalize(dirs)

    hit = restir.trace_closest_p(scene, origins, dirs, cfg, t_min=1e-4)
    mid = hit["mid"]
    mat = restir.fetch_material_p(scene, mid)
    emissive = pv.length(mat["ke"]) > 0.0
    sampling = hit["valid"] & ~emissive
    zero = sampling.astype(jnp.float32) * 0.0

    outgoing = pv.neg(pv.from_aos(dirs, axis=1))
    reservoir = _zero_di(zero)

    # ---- SampleRIS (Sampler_v6.hlsl:653-736)
    strategy, _, seed = bsdf.select_strategy_p(
        mat["ks"], mat["metal"], mat["rough"], hit["normal"], outgoing, seed
    )
    m1, m2 = cfg.nee_samples_di, cfg.bsdf_samples_di
    # NEE candidates stream one at a time in flat [N] layout (counters
    # 3i..3i+2 of seed_c; bit-identical to the old [M, N] batch, whose
    # M=4 rows padded to 8 sublanes — see nee_candidate_at_p)
    seed_c = seed
    _, seed = tea_random(seed)
    # wi = mi * p_hat / pdf_candidate with the balance-heuristic mi; the
    # pdf cancels algebraically (wi = p_hat / (M1*pdf_l + M2*pdf_b)), which
    # avoids the 0/0 at clamped-pdf candidates
    for i in range(m1):
        c = restir.nee_candidate_at_p(
            scene, hit["pos"], hit["normal"], outgoing, mat, seed_c, i
        )
        wi = c["p_hat"] / jnp.maximum(
            m1 * c["pdf_light"] + m2 * c["pdf_bsdf"], 1e-20)
        ok = sampling & (c["p_hat"] > 0.0) & jnp.isfinite(wi)
        reservoir, _, seed = update_reservoir_p(
            reservoir, _DI_KEYS, ok, wi, zero,
            (c["x2"], c["n2"], c["emission"]), seed,
        )
    for _ in range(m2):
        bc, seed = restir.bsdf_candidate_p(
            scene, hit["pos"], hit["normal"], outgoing, mat, strategy, seed,
            cfg, live=sampling,
        )
        wi = bc["p_hat"] / jnp.maximum(m1 * bc["pdf_light"] + m2 * bc["pdf_bsdf"], 1e-20)
        ok = sampling & (bc["p_hat"] > 0.0) & jnp.isfinite(wi) & (bc["pdf_bsdf"] > 0.0)
        reservoir, _, seed = update_reservoir_p(
            reservoir, _DI_KEYS, ok, wi, zero,
            (bc["x2"], bc["n2"], bc["emission"]), seed,
        )
    reservoir["m"] = jnp.where(sampling, 1.0, reservoir["m"])

    zv = pv.splat(zero)
    sdata = dict(
        x1=pv.where(sampling, hit["pos"], zv),
        n1=pv.where(sampling, pv.normalize(hit["normal"]), zv),
        o=pv.where(sampling, outgoing, zv),
        l1=pv.where(hit["valid"], mat["ke"], zv),
        mid=mid,
        obj=hit["obj"],
    )

    # visibility-checked W (pass1:166-167); lanes that never fed the
    # reservoir (miss/emissive, or w_sum == 0 where get_w is 0 anyway)
    # trace dead shadow segments
    p_hat = restir.get_p_hat_di_p(
        scene, sdata["x1"], sdata["n1"], reservoir["x2"], reservoir["n2"],
        reservoir["l2"], sdata["o"], mat, True, cfg,
        vis_mask=sampling & (reservoir["w_sum"] > 0.0),
    )
    reservoir["w"] = jnp.where(sampling, get_w(reservoir["w_sum"], p_hat), 0.0)

    gi_inputs = dict(
        x1=sdata["x1"], n1=hit["normal"], o=sdata["o"], mid=mid, sampling=sampling
    )
    return reservoir, sdata, gi_inputs, seed


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass1_gi_init(scene, gi_inputs, seed, cfg: RenderConfig):
    st = restir_gi.gi_init(
        scene, cfg, gi_inputs["x1"], gi_inputs["n1"], gi_inputs["o"],
        gi_inputs["mid"], seed, live=gi_inputs["sampling"],
    )
    st["active"] = st["active"] & gi_inputs["sampling"]
    return st


pass1_gi_bounce = jax.jit(restir_gi.gi_bounce, static_argnames=("cfg",))


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass1_gi_bounce_compact(scene, cfg: RenderConfig, st: dict,
                            bounce: jax.Array) -> dict:
    """gi_bounce with WAVEFRONT COMPACTION (SURVEY §7 Stage 3).

    Active lanes are stably partitioned to the front and, when they fit,
    the bounce runs on a half-width prefix while the dead tail passes
    through untouched — the ray-queue compaction the DXR scheduler does in
    hardware (the implicit component behind Renderer.cpp:646-654).  Seeds
    travel with their lanes, so results are BIT-IDENTICAL to the
    uncompacted bounce (tested).  Measured GI occupancy falls 0.98 → 0.38
    over three bounces, so bounces 1+ typically run at half width.
    """
    n = st["active"].shape[0]
    half = n // 2
    cnt = jnp.sum(st["active"].astype(jnp.int32))
    order = jnp.argsort(~st["active"], stable=True)
    inverse = jnp.argsort(order, stable=True)
    stp = jax.tree.map(lambda a: a[order], st)

    def run_half(stp):
        head = jax.tree.map(lambda a: a[:half], stp)
        head = restir_gi.gi_bounce(scene, cfg, head, bounce)
        return jax.tree.map(
            lambda h, t: jnp.concatenate([h, t[half:]], axis=0), head, stp)

    def run_full(stp):
        return restir_gi.gi_bounce(scene, cfg, stp, bounce)

    stp = jax.lax.cond(cnt <= half, run_half, run_full, stp)
    return jax.tree.map(lambda a: a[inverse], stp)


@functools.partial(jax.jit, static_argnames=("cfg",))
def pass1_gi_final(scene, gi_inputs, st, cfg: RenderConfig):
    """gi_finalize + W_GI (pass1:176-181)."""
    reservoir, _, seed = restir_gi.gi_finalize(scene, cfg, st)
    mat = restir.fetch_material_p(scene, gi_inputs["mid"])
    f_c = pv.length(
        restir.get_p_hat_gi_p(
            scene, gi_inputs["x1"], pv.normalize(gi_inputs["n1"]),
            reservoir["xn"], reservoir["e3"], gi_inputs["o"], mat, False, cfg,
        )
    )
    sampling = gi_inputs["sampling"]
    reservoir["w"] = jnp.where(sampling, get_w(reservoir["w_sum"], f_c), 0.0)
    reservoir["m"] = jnp.where(sampling, 1.0, 0.0)
    return reservoir, seed


# ================================ PASS 2 =================================


@functools.partial(jax.jit, static_argnames=("cfg", "band_h"))
def pass2_temporal(scene, cam, frame, cur_di: dict, cur_gi: dict,
                   sdata: dict, last_packed_di, last_packed_gi,
                   cfg: RenderConfig, xs=None, ys=None, row0=0,
                   band_h: int | None = None):
    """Temporal reuse (RayGen_v6_pass2.hlsl:47-204).

    cur_*/sdata are planar dicts; last_packed_* are the [N, 26] packed
    last-frame records (one gather each instead of 12 per-field ones).
    Under pixel-band sharding, xs/ys are the band's GLOBAL coordinates,
    row0 its first row, band_h its height, and last_packed_* hold only the
    band's rows: reprojections leaving the band reject temporal reuse (a
    safe fallback to the current-frame reservoir; documented deviation)."""
    if xs is None:
        xs, ys = _pixel_grid(cfg)
    if band_h is None:
        band_h = cfg.height
    seed = pixel_seed(xs, ys, 2, frame)
    cam_pos = tuple(cam["view_inv"][c, 3] for c in range(3))

    shading = ~((sdata["l1"][0] != 0.0) | (sdata["l1"][1] != 0.0)
                | (sdata["l1"][2] != 0.0))

    px, py = restir.reproject_to_prev_pixel_p(
        scene, sdata["x1"], sdata["obj"], cam["prev_view"],
        cam["prev_proj"], cfg.width, cfg.height,
    )
    # global image bounds (the reference indexes garbage out of bounds),
    # then the local window: band_h/row0 may describe a halo-extended
    # band (parallel/shard.py) whose local rows cover [row0, row0+band_h)
    ly = py - row0
    in_bounds = ((px >= 0) & (px < cfg.width)
                 & (py >= 0) & (py < cfg.height)
                 & (ly >= 0) & (ly < band_h))
    idx = jnp.clip(ly, 0, band_h - 1) * cfg.width + jnp.clip(px, 0, cfg.width - 1)

    # 3 + 2 narrow shard gathers (S0/S1/S2 of the DI table; the GI table
    # shares sdata columns with DI, so only its S1/S2 rows are fetched)
    l_sd, l_di = _unpack_record(tuple(_tap_gather(s, idx)
                                      for s in last_packed_di),
                                _DI_KEYS)
    l_gi = _unpack_res(_tap_gather(last_packed_gi[1], idx),
                       _tap_gather(last_packed_gi[2], idx),
                       _GI_KEYS)

    mat = restir.fetch_material_p(scene, sdata["mid"])

    # ---- DI acceptance (pass2:89-97); the reference omits the bounds
    # check and reads garbage — we require in_bounds
    accept_di = (
        shading & in_bounds
        & l_sd["l1_zero"]
        & l_di["valid"]
        & ~restir.reject_distance_p(sdata["x1"], l_sd["x1"], cam_pos, 0.1)
        & (l_di["x2"][0] != 0.0) & (l_di["x2"][1] != 0.0) & (l_di["x2"][2] != 0.0)
        & (l_sd["mid"] == sdata["mid"])
    )

    cap = float(cfg.temporal_m_cap)
    m_sum = jnp.minimum(cap, cur_di["m"]) + jnp.minimum(cap, l_di["m"])
    mi_c = restir.pairwise_mis_canonical_temporal(cur_di["m"], l_di["m"], m_sum, cap)
    mi_t = restir.pairwise_mis_noncanonical_temporal(cur_di["m"], l_di["m"], m_sum, cap)
    last_n2_zero = pv.length(l_di["n2"]) == 0.0
    mi_c = jnp.where(last_n2_zero, 1.0, mi_c)
    mi_t = jnp.where(last_n2_zero, 0.0, mi_t)

    # the two visibility-bearing p-hats of this pass (DI last + GI last)
    # share ONE batched shadow trace (bit-identical results; the
    # traversal's fixed costs are paid once for the 2N batch).  The GI
    # acceptance is evaluated early (it depends only on gathered last-
    # frame fields) so BOTH queries mask their rejected lanes out of the
    # trace — masked segments go dead and stop fattening cull unions.
    accept_gi = (
        shading & in_bounds
        & l_sd["l1_zero"]
        & ~restir.reject_w_sum(l_gi["w_sum"], cfg.w_sum_threshold)
        & ~restir.reject_distance_p(sdata["x1"], l_sd["x1"], cam_pos, 0.1)
        & is_valid_gi_p(l_gi)
        & (l_sd["mid"] == sdata["mid"])
    )
    vis_t, vis_t_gi = restir.visibility_batch_p(
        scene,
        [(sdata["x1"], sdata["n1"], l_di["x2"], accept_di),
         (sdata["x1"], sdata["n1"], l_gi["xn"], accept_gi)], cfg)

    w_c = mi_c * restir.get_p_hat_di_p(
        scene, sdata["x1"], sdata["n1"], cur_di["x2"], cur_di["n2"],
        cur_di["l2"], sdata["o"], mat, False, cfg,
    ) * cur_di["w"]
    w_t = mi_t * restir.get_p_hat_di_p(
        scene, sdata["x1"], sdata["n1"], l_di["x2"], l_di["n2"], l_di["l2"],
        sdata["o"], mat, False, cfg,
    ) * vis_t * l_di["w"]

    merged = dict(
        cur_di,
        m=jnp.where(accept_di, jnp.minimum(cap, cur_di["m"]), cur_di["m"]),
        w_sum=jnp.where(accept_di, w_c, cur_di["w_sum"]),
    )
    merged, _, seed = update_reservoir_p(
        merged, _DI_KEYS, accept_di, w_t, jnp.minimum(cap, l_di["m"]),
        (l_di["x2"], l_di["n2"], l_di["l2"]), seed,
    )
    p_hat = restir.get_p_hat_di_p(
        scene, sdata["x1"], sdata["n1"], merged["x2"], merged["n2"],
        merged["l2"], sdata["o"], mat, False, cfg,
    )
    merged["w"] = jnp.where(accept_di, get_w(merged["w_sum"], p_hat), merged["w"])

    # ---- GI acceptance (pass2:99-106) — accept_gi computed above the
    # shared visibility batch; is_valid_gi_p evaluated inline (w_sum/m
    # are gathered fields — identical to the baked GI flag)
    cap_gi = float(cfg.temporal_m_cap_gi)
    m_sum_gi = jnp.minimum(cap_gi, cur_gi["m"]) + jnp.minimum(cap_gi, l_gi["m"])
    mi_c_gi = restir.pairwise_mis_canonical_temporal(
        cur_gi["m"], l_gi["m"], m_sum_gi, cap_gi)
    mi_t_gi = restir.pairwise_mis_noncanonical_temporal(
        cur_gi["m"], l_gi["m"], m_sum_gi, cap_gi)

    f_c = restir.get_p_hat_gi_p(scene, sdata["x1"], sdata["n1"], cur_gi["xn"],
                                cur_gi["e3"], sdata["o"], mat, False, cfg)
    w_c_gi = mi_c_gi * pv.length(f_c) * cur_gi["w"]
    f_t = restir.get_p_hat_gi_p(scene, sdata["x1"], sdata["n1"], l_gi["xn"],
                                l_gi["e3"], sdata["o"], mat, False, cfg)
    w_t_gi = mi_t_gi * pv.length(f_t) * vis_t_gi * l_gi["w"]

    merged_gi = dict(
        cur_gi,
        m=jnp.where(accept_gi, jnp.minimum(cap_gi, cur_gi["m"]), cur_gi["m"]),
        w_sum=jnp.where(accept_gi, w_c_gi, cur_gi["w_sum"]),
    )
    merged_gi, _, seed = update_reservoir_p(
        merged_gi, _GI_KEYS, accept_gi, w_t_gi, jnp.minimum(cap_gi, l_gi["m"]),
        (l_gi["xn"], l_gi["nn"], l_gi["e3"]), seed,
    )
    p_hat_gi = pv.length(
        restir.get_p_hat_gi_p(scene, sdata["x1"], sdata["n1"], merged_gi["xn"],
                              merged_gi["e3"], sdata["o"], mat, False, cfg)
    )
    merged_gi["w"] = jnp.where(
        accept_gi, get_w(merged_gi["w_sum"], p_hat_gi), merged_gi["w"]
    )
    return merged, merged_gi


# ================================ PASS 3 =================================


def _pick_first_k(accept: jax.Array, k: int):
    """Indices of the first k True tries per lane: (idx [N,k], ok [N,k]).

    Kept in the reference [N, T] orientation for tests; the pass kernel
    streams the same first-k selection per try in flat [N] layout (see
    the DI block in pass3_spatial)."""
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


def _pick_first_k_major(accept: jax.Array, k: int):
    """Try-major first-k pick: accept [T, N] -> (idx list of k [N], ok
    list).  Superseded in the pass kernel by the streamed per-try claim
    loop (same selection, flat [N] layout — profile_r4s measured the
    [T, N] machinery ~10x slower); kept for the r3/r4 profiler scripts
    that decompose the old pipeline."""
    c = jnp.cumsum(accept.astype(jnp.int32), axis=0)
    idxs, oks = [], []
    for v in range(k):
        hitv = accept & (c == v + 1)
        idxs.append(jnp.argmax(hitv, axis=0).astype(jnp.int32))
        oks.append(jnp.any(hitv, axis=0))
    return idxs, oks


def _select_try(planes, idx_v: jax.Array):
    """One-hot select row ``idx_v`` [N] out of a [T, N] plane (or pytree
    of planes) — gather-free.  Profiler-script support (see
    _pick_first_k_major)."""
    def sel(p):
        t_count = p.shape[0]
        acc = p[0]
        for t in range(1, t_count):
            acc = jnp.where(idx_v == t, p[t], acc)
        return acc
    return jax.tree.map(sel, planes)


def _spatial_tries(xs, ys, cfg, seed, row0=0, band_h=None):
    """TRY-MAJOR weighted-disk neighbor picks: the [T, N] batch form of
    ``_spatial_try_at`` (identical draws/values, stacked).  Superseded in
    the pass kernel by the per-try flat form; kept for the r3/r4 profiler
    scripts.  Returns (pidx [T, N], is_center [T, N], advanced seed)."""
    if band_h is None:
        band_h = cfg.height
    tries = cfg.spatial_max_tries
    us, seed = tea_batch_major(seed, 2 * tries)        # [2T, N]
    r = cfg.spatial_radius * jnp.power(us[0::2], cfg.spatial_exponent)
    ang = us[1::2] * 6.2831853
    ox = (jnp.cos(ang) * r).astype(jnp.int32)
    oy = (jnp.sin(ang) * r).astype(jnp.int32)
    nx = restir.mirror_clamp(xs + ox, cfg.width)
    ny = restir.mirror_clamp(ys + oy, cfg.height)      # GLOBAL row mirror
    nx = jnp.clip(nx, 0, cfg.width - 1)
    ly = jnp.clip(ny - row0, 0, band_h - 1)            # local window row
    is_center = (nx == xs) & (ny == ys)
    return ly * cfg.width + nx, is_center, seed


def _spatial_try_at(xs, ys, cfg, seed, t, row0=0, band_h=None):
    """One weighted-disk neighbor pick — try #t of the reference's spatial
    candidate loop (Common_v6.hlsl:203-241) — as flat [N] planes.

    Draws are ``tea_batch_at`` counters 2t/2t+1, bit-identical to rows
    [2t], [2t+1] of the old try-major [2T, N] batch; the seed itself is
    advanced ONCE per try-batch by the caller.  Flat [N] layout matters:
    [T, N] tensors pad T=9 up to 16 sublanes and every downstream op pays
    the padded traffic — the unrolled per-try pipeline measured ~10x
    cheaper at 1080p (profile_r4s: 105 -> 9.5 ms).

    Rows mirror-clamp at IMAGE borders exactly like the reference
    (Common_v6.hlsl:223-236).  Under pixel-band sharding, band_h/row0
    describe the halo-extended local window (halo >= spatial_radius, see
    parallel/shard.py), so every globally-mirrored tap resolves to a
    locally-present row and multi-chip taps match single-chip exactly.
    Returns (pidx [N] — LOCAL indices, is_center [N])."""
    if band_h is None:
        band_h = cfg.height
    u_r = tea_batch_at(seed, 2 * t)
    u_a = tea_batch_at(seed, 2 * t + 1)
    r = cfg.spatial_radius * jnp.power(u_r, cfg.spatial_exponent)
    ang = u_a * 6.2831853
    ox = (jnp.cos(ang) * r).astype(jnp.int32)
    oy = (jnp.sin(ang) * r).astype(jnp.int32)
    nx = restir.mirror_clamp(xs + ox, cfg.width)
    ny = restir.mirror_clamp(ys + oy, cfg.height)      # GLOBAL row mirror
    # single-reflection mirroring assumes radius << size; clip keeps tiny
    # images (size < radius) in range on both axes
    nx = jnp.clip(nx, 0, cfg.width - 1)
    ly = jnp.clip(ny - row0, 0, band_h - 1)            # local window row
    is_center = (nx == xs) & (ny == ys)
    return ly * cfg.width + nx, is_center


def _gi_candidates(scene, cur_gi, sdata, mat, packed_gi, cam_pos, xs, ys,
                   cfg, seed, row0, band_h):
    """GI candidate picks (pass3:144-189), streamed per try in flat [N]
    layout (see the DI block in pass3_spatial).  Each try gathers S0
    (accept columns) + S1 (xn/nn for the jacobian, w_sum) and claims
    first-k slots; the k chosen candidates re-gather all three shards by
    pixel index (narrow-row gathers are ~free — profile_r4p).

    Returns (gi_ok, nb_gi, nb_sd_g, seed)."""
    k = cfg.spatial_candidate_count
    rough_ok = mat["rough"] > 0.3
    # The accept chain reads S0 AND S1 every try.  Both are merged into
    # ONE dedicated f16 ACCEPT table (32 B rows): its columns are
    # geometry (x1/n1/xn/nn), exact small ids/flags, and w_sum whose
    # only accept use is a > threshold test (f16 overflow goes inf,
    # which still passes) — so quantization can only flip borderline
    # accepts, and the MIS math stays internally consistent (no bias).
    # This halves the try-loop gather count AND halves the row bytes
    # (r5i: in-pass row gathers ~21 ms each at 1080p, 945 ms total;
    # r5f: 2-byte rows gather ~30% cheaper).  ALL payload rows — even
    # the S0 x1/n1 origins — re-gather from the f32 shards (quantized
    # origins in the MIS p_from compound through the temporal loop;
    # see the DI block note).
    s01 = jnp.concatenate([packed_gi[0], packed_gi[1]], axis=-1)
    if s01.dtype != jnp.float16:
        s01 = s01.astype(jnp.float16)
    cnt = jnp.zeros(xs.shape, _I)
    sel_pidx = None
    gi_ok = [jnp.zeros(xs.shape, bool) for _ in range(k)]
    for t in range(cfg.spatial_max_tries):
        pidx_t, is_center_t = _spatial_try_at(xs, ys, cfg, seed, t,
                                              row0, band_h)
        g01 = _tap_gather(s01, pidx_t).astype(_F)                # [N, 16]
        g0, g1 = g01[:, :8], g01[:, 8:]
        g_x1 = (g0[:, 0], g0[:, 1], g0[:, 2])
        g_mid = g0[:, 6].astype(_I)
        g_xn = (g1[:, 0], g1[:, 1], g1[:, 2])
        g_nn = (g1[:, 3], g1[:, 4], g1[:, 5])
        jac = restir.jacobian_reconnection_p(g_x1, sdata["x1"], g_xn, g_nn)
        accept_t = (
            ~is_center_t
            & rough_ok
            & ~restir.reject_distance_p(sdata["x1"], g_x1, cam_pos, 0.1)
            & ~restir.reject_below_surface_p(
                pv.normalize(pv.sub(g_xn, sdata["x1"])), sdata["n1"]
            )
            & ~restir.reject_w_sum(g1[:, 6], cfg.w_sum_threshold)
            & (g0[:, 7] == 3.0)   # pack-baked is_valid_gi & |l1| == 0
            & ~restir.reject_jacobian(jac, cfg.j_threshold)
            & ~_sentinel(g_mid)
            & (g_mid == sdata["mid"])
        )
        if sel_pidx is None:
            # lanes with no accepted try keep try 0's pick — same garbage
            # the old argmax-of-all-false default chose; gi_ok masks it
            # at every consumer
            sel_pidx = [pidx_t] * k
        for v in range(k):
            take = accept_t & (cnt == v)
            sel_pidx[v] = jnp.where(take, pidx_t, sel_pidx[v])
            gi_ok[v] = gi_ok[v] | take
        cnt = cnt + accept_t.astype(_I)
    _, seed = tea_random(seed)
    nb_gi, nb_sd_g = [], []
    for v in range(k):
        g0v = _tap_gather(packed_gi[0], sel_pidx[v]).astype(_F)
        g1v = _tap_gather(packed_gi[1], sel_pidx[v]).astype(_F)
        g2v = _tap_gather(packed_gi[2], sel_pidx[v]).astype(_F)
        nb_gi.append(dict(
            xn=(g1v[:, 0], g1v[:, 1], g1v[:, 2]),
            nn=(g1v[:, 3], g1v[:, 4], g1v[:, 5]),
            w_sum=g1v[:, 6],
            e3=(g2v[:, 3], g2v[:, 4], g2v[:, 5]),
            w=g2v[:, 6],
            m=g2v[:, 7],
        ))
        nb_sd_g.append(dict(
            x1=(g0v[:, 0], g0v[:, 1], g0v[:, 2]),
            n1=(g0v[:, 3], g0v[:, 4], g0v[:, 5]),
            o=(g2v[:, 0], g2v[:, 1], g2v[:, 2]),
        ))
    return gi_ok, nb_gi, nb_sd_g, seed


@functools.partial(jax.jit, static_argnames=("cfg", "band_h"))
def pass3_spatial(scene, cam, frame, cur_di: dict, cur_gi: dict,
                  sdata: dict, cfg: RenderConfig, xs=None, ys=None,
                  row0=0, band_h: int | None = None,
                  packed_di_ext=None, packed_gi_ext=None):
    """Spatial reuse + final shade (RayGen_v6_pass3.hlsl:47-463).

    Returns (radiance sample [N,3], shaded_mask, out_di planes, out_gi
    planes).  See pass2_temporal for the pixel-band sharding contract;
    packed_di_ext/packed_gi_ext are the halo-extended current-frame
    candidate tables a band shard passes in (parallel/shard.py) so
    spatial taps can cross band borders — without them the tables are
    built locally (single-chip path, identical result)."""
    if xs is None:
        xs, ys = _pixel_grid(cfg)
    seed = pixel_seed(xs, ys, 3, frame)
    cam_pos = tuple(cam["view_inv"][c, 3] for c in range(3))
    shading = ~((sdata["l1"][0] != 0.0) | (sdata["l1"][1] != 0.0)
                | (sdata["l1"][2] != 0.0))
    mat = restir.fetch_material_p(scene, sdata["mid"])
    k = cfg.spatial_candidate_count
    zero = shading.astype(jnp.float32) * 0.0

    if packed_di_ext is None:
        rd = _rec_dtype(cfg)
        packed_di = _pack_record(sdata, cur_di, _DI_KEYS, rd)  # 3 shards
        packed_gi = _pack_record(sdata, cur_gi, _GI_KEYS, rd)
    else:
        packed_di, packed_gi = packed_di_ext, packed_gi_ext

    # ---- DI candidates (pass3:107-142), streamed per try in flat [N]
    # layout: each try gathers ONLY the 16-byte f16 ACCEPT row (x1/n1/
    # mid/flags — geometry and exact small values, so quantization can
    # only flip borderline accepts; see the GI accept-table note), runs
    # the accept chain, and claims first-k slots.  Try-major [T, N]
    # tensors pad T=9 to 16 sublanes and every downstream op pays the
    # padding — the unrolled per-try pipeline measured ~10x cheaper
    # (profile_r4s: 105 -> 9.5 ms at 1080p).  The k chosen candidates'
    # payload — INCLUDING the S0 x1/n1 the MIS p_from and visibility
    # origins read — re-gathers from the f32 shards: feeding QUANTIZED
    # origins into p_from breaks the pairwise-MIS equilibrium and the
    # temporal feedback loop compounds it (measured: DI-only cornell w
    # inflates ~8%/frame without bound).  f16 is confined to the accept
    # tests, whose only possible harm is flipping borderline accepts.
    acc_di = (packed_di[0] if packed_di[0].dtype == jnp.float16
              else packed_di[0].astype(jnp.float16))
    cnt = jnp.zeros(xs.shape, _I)
    sel_pidx = None
    di_ok = [jnp.zeros(xs.shape, bool) for _ in range(k)]
    for t in range(cfg.spatial_max_tries):
        pidx_t, is_center_t = _spatial_try_at(xs, ys, cfg, seed, t,
                                              row0, band_h)
        r0 = _tap_gather(acc_di, pidx_t).astype(_F)            # [N, 8]
        c_mid = r0[:, 6].astype(_I)
        accept_t = (
            ~is_center_t
            & ~restir.reject_normal_p(
                sdata["n1"], (r0[:, 3], r0[:, 4], r0[:, 5]), 0.9)
            & ~restir.reject_distance_p(
                sdata["x1"], (r0[:, 0], r0[:, 1], r0[:, 2]), cam_pos, 0.1)
            & (r0[:, 7] == 3.0)   # pack-baked is_valid_di & |l1| == 0
            & ~_sentinel(c_mid)
            & (c_mid == sdata["mid"])
        )
        if sel_pidx is None:
            # lanes with no accepted try keep try 0's pick — same garbage
            # the old argmax-of-all-false default chose; di_ok masks it
            # at every consumer
            sel_pidx = [pidx_t] * k
        for v in range(k):
            take = accept_t & (cnt == v)
            sel_pidx[v] = jnp.where(take, pidx_t, sel_pidx[v])
            di_ok[v] = di_ok[v] | take
        cnt = cnt + accept_t.astype(_I)
    _, seed = tea_random(seed)
    nb_di, nb_sd = [], []
    for v in range(k):
        r0v = _tap_gather(packed_di[0], sel_pidx[v]).astype(_F)
        r2v = _tap_gather(packed_di[2], sel_pidx[v]).astype(_F)
        nb_di.append(_unpack_res(
            _tap_gather(packed_di[1], sel_pidx[v]), r2v, _DI_KEYS))
        nb_sd.append(dict(
            x1=(r0v[:, 0], r0v[:, 1], r0v[:, 2]),
            n1=(r0v[:, 3], r0v[:, 4], r0v[:, 5]),
            o=(r2v[:, 0], r2v[:, 1], r2v[:, 2]),
        ))

    cap = float(cfg.spatial_m_cap)
    m_sum = jnp.minimum(cap, cur_di["m"])
    for v in range(k):
        m_sum = m_sum + jnp.where(di_ok[v], jnp.minimum(cap, nb_di[v]["m"]), 0.0)

    # canonical MIS (MIS_v6.hlsl:2-35); p_hat_from uses VISIBILITY rays
    c_m_min = jnp.minimum(cap, cur_di["m"])
    c_m_max = m_sum - c_m_min
    p_c = restir.get_p_hat_di_p(scene, sdata["x1"], sdata["n1"], cur_di["x2"],
                                cur_di["n2"], cur_di["l2"], sdata["o"], mat,
                                False, cfg)
    c_m_num = c_m_min * p_c
    mi_c = c_m_min / jnp.maximum(m_sum, 1e-9)
    # ALL of this pass's visibility-bearing p-hats (k DI p_hat_from, k GI
    # p_hat_from, k GI shift targets — mutually independent; the GI
    # candidate picks happen below but depend only on the packed tables)
    # share ONE batched 3k*N shadow trace (bit-identical per query)
    gi_ok, nb_gi, nb_sd_g, seed = _gi_candidates(
        scene, cur_gi, sdata, mat, packed_gi, cam_pos, xs, ys, cfg, seed,
        row0, band_h)
    vis_all = [] if k == 0 else restir.visibility_batch_p(
        scene,
        [(nb_sd[v]["x1"], nb_sd[v]["n1"], cur_di["x2"],
          shading & di_ok[v]) for v in range(k)]
        + [(nb_sd_g[v]["x1"], nb_sd_g[v]["n1"], cur_gi["xn"],
            shading & gi_ok[v]) for v in range(k)]
        + [(sdata["x1"], sdata["n1"], nb_gi[v]["xn"],
            shading & gi_ok[v]) for v in range(k)],
        cfg)
    vis_from = vis_all[:k]
    vis_from_g = vis_all[k:2 * k]
    vis_fs = vis_all[2 * k:]
    for v in range(k):
        p_from = restir.get_p_hat_di_p(
            scene, nb_sd[v]["x1"], nb_sd[v]["n1"], cur_di["x2"], cur_di["n2"],
            cur_di["l2"], nb_sd[v]["o"], mat, False, cfg,
        ) * vis_from[v]
        n_m_min = jnp.minimum(cap, nb_di[v]["m"])
        m_den = c_m_num + c_m_max * p_from
        ratio = jnp.where(
            m_den > 0.0,
            (n_m_min / jnp.maximum(m_sum, 1e-9))
            * (c_m_num / jnp.maximum(m_den, 1e-20)),
            0.0,
        )
        mi_c = mi_c + jnp.where(di_ok[v], ratio, 0.0)

    w_c = mi_c * p_c * cur_di["w"]
    out_di = dict(
        cur_di,
        m=jnp.where(shading, c_m_min, cur_di["m"]),
        w_sum=jnp.where(shading, w_c, cur_di["w_sum"]),
    )

    # noncanonical merges (MIS_v6.hlsl:38-60)
    for v in range(k):
        nb, nbs = nb_di[v], nb_sd[v]
        p_from = restir.get_p_hat_di_p(
            scene, nbs["x1"], nbs["n1"], cur_di["x2"], cur_di["n2"],
            cur_di["l2"], nbs["o"], mat, False, cfg,
        )
        m_num = (m_sum - c_m_min) * p_from
        m_den = m_num + c_m_min * p_c
        mi_s = jnp.where(
            m_den > 0.0,
            (jnp.minimum(cap, nb["m"]) / jnp.maximum(m_sum, 1e-9))
            * (m_num / jnp.maximum(m_den, 1e-20)),
            0.0,
        )
        w_s = mi_s * restir.get_p_hat_di_p(
            scene, sdata["x1"], sdata["n1"], nb["x2"], nb["n2"], nb["l2"],
            sdata["o"], mat, False, cfg,
        ) * nb["w"]
        ok = shading & di_ok[v]
        out_di, _, seed = update_reservoir_p(
            out_di, _DI_KEYS, ok, w_s, jnp.minimum(cap, nb["m"]),
            (nb["x2"], nb["n2"], nb["l2"]), seed,
        )

    cap_g = float(cfg.spatial_m_cap_gi)
    m_sum_g = jnp.minimum(cap_g, cur_gi["m"])
    for v in range(k):
        m_sum_g = m_sum_g + jnp.where(
            gi_ok[v], jnp.minimum(cap_g, nb_gi[v]["m"]), 0.0)

    cg_m_min = jnp.minimum(cap_g, cur_gi["m"])
    cg_m_max = m_sum_g - cg_m_min
    p_c_gi = pv.length(
        restir.get_p_hat_gi_p(scene, sdata["x1"], sdata["n1"], cur_gi["xn"],
                              cur_gi["e3"], sdata["o"], mat, False, cfg)
    )
    cg_num = cg_m_min * p_c_gi
    mi_c_gi = cg_m_min / jnp.maximum(m_sum_g, 1e-9)
    for v in range(k):
        nbs = nb_sd_g[v]
        j_v = restir.jacobian_reconnection_p(
            sdata["x1"], nbs["x1"], cur_gi["xn"], cur_gi["nn"])
        p_from = pv.length(
            restir.get_p_hat_gi_p(scene, nbs["x1"], nbs["n1"], cur_gi["xn"],
                                  cur_gi["e3"], nbs["o"], mat, False, cfg)
        ) * vis_from_g[v] * j_v
        m_den = cg_num + cg_m_max * p_from
        ratio = jnp.where(
            m_den > 0.0,
            (jnp.minimum(cap_g, nb_gi[v]["m"]) / jnp.maximum(m_sum_g, 1e-9))
            * (cg_num / jnp.maximum(m_den, 1e-20)),
            0.0,
        )
        mi_c_gi = mi_c_gi + jnp.where(gi_ok[v], ratio, 0.0)
    mi_c_gi = jnp.clip(mi_c_gi, 0.0, 1.0)

    w_c_gi = mi_c_gi * p_c_gi * cur_gi["w"]
    out_gi = dict(
        cur_gi,
        m=jnp.where(shading, cg_m_min, cur_gi["m"]),
        w_sum=jnp.where(shading, w_c_gi, cur_gi["w_sum"]),
    )

    for v in range(k):
        nb, nbs = nb_gi[v], nb_sd_g[v]
        j_mis = restir.jacobian_reconnection_p(
            sdata["x1"], nbs["x1"], cur_gi["xn"], cur_gi["nn"])
        p_from = pv.length(
            restir.get_p_hat_gi_p(scene, nbs["x1"], nbs["n1"], cur_gi["xn"],
                                  cur_gi["e3"], nbs["o"], mat, False, cfg)
        ) * j_mis
        m_num = (m_sum_g - cg_m_min) * p_from
        m_den = m_num + cg_m_min * p_c_gi
        mi_s = jnp.where(
            m_den > 0.0,
            jnp.clip((jnp.minimum(cap_g, nb["m"]) / jnp.maximum(m_sum_g, 1e-9))
                     * (m_num / jnp.maximum(m_den, 1e-20)), 0.0, 1.0),
            0.0,
        )
        j_shift = restir.jacobian_reconnection_p(
            nbs["x1"], sdata["x1"], nb["xn"], nb["nn"])
        f_s = pv.length(
            restir.get_p_hat_gi_p(scene, sdata["x1"], sdata["n1"], nb["xn"],
                                  nb["e3"], sdata["o"], mat, False, cfg)
        ) * vis_fs[v]
        w_s = mi_s * f_s * nb["w"] * j_shift
        ok = shading & gi_ok[v] & (j_shift != 0.0)
        out_gi, _, seed = update_reservoir_p(
            out_gi, _GI_KEYS, ok, w_s, jnp.minimum(cap_g, nb["m"]),
            (nb["xn"], nb["nn"], nb["e3"]), seed,
        )

    # ---- final shade (pass3:334-372); non-shading / empty-reservoir
    # lanes trace dead shadow segments
    p_hat_final = restir.get_p_hat_di_p(
        scene, sdata["x1"], sdata["n1"], out_di["x2"], out_di["n2"],
        out_di["l2"], sdata["o"], mat, True, cfg,
        vis_mask=shading & (out_di["w_sum"] != 0.0),
    )
    out_di["w"] = jnp.where(
        shading, get_w(out_di["w_sum"], p_hat_final), out_di["w"])
    radiance = pv.scale(
        restir.reconnect_di_p(sdata["x1"], sdata["n1"], out_di["x2"],
                              out_di["n2"], out_di["l2"], sdata["o"], mat),
        out_di["w"],
    )

    f_gi_final = restir.get_p_hat_gi_p(
        scene, sdata["x1"], sdata["n1"], out_gi["xn"], out_gi["e3"],
        sdata["o"], mat, False, cfg,
    )
    out_gi["w"] = jnp.where(
        shading, get_w(out_gi["w_sum"], pv.length(f_gi_final)), out_gi["w"])
    radiance = pv.add(radiance, pv.scale(f_gi_final, out_gi["w"]))
    radiance = pv.where(shading, radiance, pv.splat(zero))
    return pv.to_aos(radiance, axis=1), shading, out_di, out_gi


# ============================== RENDERER =================================


def _rec_dtype(cfg: RenderConfig):
    return {"f16": jnp.float16, "bf16": jnp.bfloat16}.get(
        cfg.record_dtype, jnp.float32)


@functools.partial(jax.jit, static_argnames=("dtype",))
def _pack_last(last_di: ReservoirDI, last_gi: ReservoirGI,
               last_sdata: SampleData, dtype=jnp.float32):
    """Persistent structs -> the two packed shard-tuple gather tables."""
    from royaltracer_dx_tpu.ops.reservoir import (
        di_to_planes, gi_to_planes, sdata_to_planes,
    )
    sd = sdata_to_planes(last_sdata)
    return (
        _pack_record(sd, di_to_planes(last_di), _DI_KEYS, dtype),
        _pack_record(sd, gi_to_planes(last_gi), _GI_KEYS, dtype),
    )


def _frame_body(scene, cam_base: dict, cfg: RenderConfig, st: dict,
                frame: jax.Array) -> dict:
    """One full ReSTIR frame as a pure state -> state function.

    st: dict(last_di, last_gi, last_sdata, fb, l1, prev_view, prev_proj).
    Mirrors RestirRenderer.render() exactly (equality-tested:
    tests/test_restir.py render_many case); camera and scene are static
    across the batch.  Used by render_many to run k frames in ONE jit —
    a 64^2 frame is ~90 ms of per-dispatch tunnel overhead but <1 ms of
    device work, so convergence studies were dispatch-bound (r5 bench:
    1201 oracle frames in 110 s)."""
    cam = dict(cam_base)
    cam["prev_view"] = st["prev_view"]
    cam["prev_proj"] = st["prev_proj"]
    res_di, sdata, gi_in, seed = pass1_di(scene, cam, frame, cfg)
    gst = pass1_gi_init(scene, gi_in, seed, cfg)
    compact = restir.wants_gi_compaction(scene, cfg)
    bounce_fn = pass1_gi_bounce_compact if compact else pass1_gi_bounce
    gst = jax.lax.fori_loop(
        0, cfg.gi_bounces,
        lambda b, s: bounce_fn(scene, cfg, s, b.astype(jnp.uint32)), gst)
    res_gi, _ = pass1_gi_final(scene, gi_in, gst, cfg)
    if cfg.temporal_reuse:
        packed_di, packed_gi = _pack_last(
            st["last_di"], st["last_gi"], st["last_sdata"], _rec_dtype(cfg))
        res_di, res_gi = pass2_temporal(
            scene, cam, frame, res_di, res_gi, sdata, packed_di,
            packed_gi, cfg)
    sample, shaded, out_di, out_gi = pass3_spatial(
        scene, cam, frame, res_di, res_gi, sdata, cfg)
    out_di = planes_to_di(out_di)
    out_gi = planes_to_gi(out_gi)
    sdata_s = planes_to_sdata(sdata)
    changed = jnp.any(jnp.abs(cam["view"] - st["prev_view"]) > S_BIAS)
    fb = accumulate(st["fb"], sample, changed, cfg.max_accum_frames)
    sh3 = shaded[:, None]

    def pick(new, old):
        return jnp.where(sh3 if new.ndim == 2 else shaded, new, old)

    return dict(
        last_di=jax.tree.map(pick, out_di, st["last_di"]),
        last_gi=jax.tree.map(pick, out_gi, st["last_gi"]),
        last_sdata=jax.tree.map(pick, sdata_s, st["last_sdata"]),
        fb=fb,
        l1=sdata_s.l1,
        prev_view=cam["view"],
        prev_proj=cam["proj"],
    )


# NOTE: no buffer donation — the fresh-state reservoirs alias one zeros
# buffer across fields (ReservoirDI.zeros_like_lanes), which XLA rejects
# as a double-donate; the state copy is ~100 MB at 1080p and fori_loop
# double-buffers internally regardless.
@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def _render_many(scene, st: dict, cam_base: dict, frame0: jax.Array,
                 cfg: RenderConfig, k: int) -> dict:
    return jax.lax.fori_loop(
        0, k,
        lambda i, s: _frame_body(scene, cam_base, cfg, s,
                                 frame0 + i.astype(jnp.uint32)),
        st)


class RestirRenderer:
    """Progressive ReSTIR DI+GI renderer over a Scene (flagship pipeline)."""

    def __init__(self, scene: Scene, camera: Camera, cfg: RenderConfig):
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.materials = scene.build_materials()
        self.scene_arrays = scene.flatten(
            self.materials, build_bvh=cfg.accel == "bvh",
            bvh_leaf_size=cfg.bvh_leaf_size,
            build_clusters=cfg.accel == "cluster",
            cluster_group=cfg.cluster_group,
            build_stream=_wants_stream(scene, cfg),
        )
        if cfg.record_dtype in ("f16", "bf16"):
            # half-precision id columns are exact only below 2^mantissa+1
            lim = 2048 if cfg.record_dtype == "f16" else 256
            n_mat = len(scene._materials)
            n_inst = len(scene.instance_mesh)
            if n_mat >= lim or n_inst >= lim:
                raise ValueError(
                    f"record_dtype='{cfg.record_dtype}' needs material "
                    f"({n_mat}) and instance ({n_inst}) counts < {lim}")
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
        # opt-in per-pass timing/occupancy (each sync is a device round
        # trip — the FPS-title analog, Renderer.cpp:482-505, but per pass)
        self.profile = False

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
        # seed term: frame counter (deterministic) or wall-clock nanos
        # truncated to uint32 — the reference's camera-buffer time
        # (Renderer.cpp:1754-1761 static_cast<uint32_t>(nanos))
        if cfg.seed_mode == "time":
            frame = jnp.uint32(time.time_ns() & 0xFFFFFFFF)
        else:
            frame = jnp.uint32(self.frame)
        t0 = time.perf_counter()
        pass_times: dict = {}
        occupancy: dict = {}

        def tick(label, *sync):
            """Per-pass timing + occupancy (profile mode only: every sync
            is a ~5 ms round trip through the device tunnel)."""
            if not self.profile:
                return
            for s in sync:
                jax.block_until_ready(s)
            now = time.perf_counter()
            pass_times[label] = now - (t0 + sum(pass_times.values()))

        res_di, sdata, gi_in, seed = pass1_di(scene, cam, frame, cfg)
        tick("pass1_di", res_di["w_sum"])
        occ_dev = [jnp.mean(gi_in["sampling"].astype(jnp.float32))]
        st = pass1_gi_init(scene, gi_in, seed, cfg)
        # compaction pays two argsorts + two full-state permutation
        # shuffles per bounce; that only amortizes when the per-lane
        # trace+shade it saves is expensive (windowed stream traversal on
        # big scenes).  At flat-path scene sizes it is a catastrophic
        # loss (measured: 1080p garage frame 3.7 s -> 18.4 s when it
        # engaged on the 2.2k-tri scene).  Decision pinned by
        # tests/test_dispatch.py.
        compact = restir.wants_gi_compaction(scene, cfg)
        bounce_fn = pass1_gi_bounce_compact if compact else pass1_gi_bounce
        for b in range(cfg.gi_bounces):
            occ_dev.append(jnp.mean(st["active"].astype(jnp.float32)))
            st = bounce_fn(scene, cfg, st, jnp.uint32(b))
        res_gi, _ = pass1_gi_final(scene, gi_in, st, cfg)
        tick("pass1_gi", res_gi["w_sum"])

        if cfg.temporal_reuse:
            packed_di, packed_gi = _pack_last(
                self.last_di, self.last_gi, self.last_sdata, _rec_dtype(cfg))
            tick("pack_last", packed_di[0])
            res_di, res_gi = pass2_temporal(
                scene, cam, frame, res_di, res_gi, sdata, packed_di,
                packed_gi, cfg,
            )
        tick("pass2_temporal", res_di["w_sum"])

        sample, shaded, out_di, out_gi = pass3_spatial(
            scene, cam, frame, res_di, res_gi, sdata, cfg
        )
        tick("pass3_spatial", sample)
        out_di = planes_to_di(out_di)
        out_gi = planes_to_gi(out_gi)
        sdata_s = planes_to_sdata(sdata)

        changed = jnp.any(jnp.abs(cam["view"] - self._prev_view) > S_BIAS)
        self.fb = accumulate(self.fb, sample, changed, cfg.max_accum_frames)
        self.l1 = sdata_s.l1

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
            sdata_s, self.last_sdata,
        )
        self.fb.accum.block_until_ready()
        dt = time.perf_counter() - t0
        self._prev_view = cam["view"]
        self._prev_proj = cam["proj"]
        self.frame += 1
        # Ray accounting.  Lock-step LANES per pixel (masked lanes still
        # pay VPU time): pass1 = primary + bsdf-DI + W-visibility +
        # GI(init + per-bounce cont + final shadow); pass2 = 2 vis;
        # pass3 = (2k+1) DI vis + 2k GI vis.  The DEFAULT mrays_per_s is
        # the honest ACTIVE-ray number: mask-gated sites scaled by the
        # measured pass-1 sampling fraction / per-bounce GI occupancy
        # (one stacked device->host transfer per frame).
        k = cfg.spatial_candidate_count
        b_gi = cfg.gi_bounces
        lanes_pp = (3 + 1) + (1 + b_gi + 1) + 2 + (3 * k + 1 + 2)
        lanes = cfg.num_pixels * lanes_pp
        ov = np.asarray(jnp.stack(occ_dev), np.float64)
        s1, occs = float(ov[0]), ov[1:]
        active_pp = (1.0                       # primary (all lanes)
                     + (1 + 1 + 1 + 1) * s1    # DI bsdf+vis, GI init+shadow
                     + float(occs.sum())       # GI continuations
                     + 2.0 * s1                # pass2 vis
                     + (3 * k + 1 + 2) * s1)   # pass3 vis
        rays_active = cfg.num_pixels * active_pp
        self.metrics = dict(
            frame_time_s=dt,
            fps=1.0 / max(dt, 1e-9),
            frame=self.frame,
            rays_traced=rays_active,
            ray_lanes=lanes,
            pass1_sampling=s1,
            mrays_per_s=rays_active / dt / 1e6,
            mray_lanes_per_s=lanes / dt / 1e6,
        )
        if self.profile:
            occupancy["pass1_sampling"] = s1
            for b in range(b_gi):
                occupancy[f"gi_bounce{b}_active"] = float(ov[1 + b])
            self.metrics["pass_times_s"] = pass_times
            self.metrics["occupancy"] = occupancy

    def render_many(self, k: int) -> None:
        """Render k frames in ONE jit dispatch (lax.fori_loop over the
        frame body).  Semantically identical to k render() calls
        (equality-tested) but pays ONE dispatch + sync instead of ~10*k:
        small-resolution convergence runs are dispatch-overhead-bound
        (~90 ms/frame at 64^2 through the tunnel vs <1 ms device work).
        Camera and scene are static across the batch; per-pass profiling
        and per-frame metrics are unavailable inside it."""
        if self.cfg.seed_mode == "time":
            raise ValueError("render_many needs deterministic seed_mode="
                             "'frame' (time advances per dispatch, not "
                             "per frame)")
        cam = self._camera_arrays()
        cam_base = {kk: v for kk, v in cam.items()
                    if kk not in ("prev_view", "prev_proj")}
        state = dict(last_di=self.last_di, last_gi=self.last_gi,
                     last_sdata=self.last_sdata, fb=self.fb, l1=self.l1,
                     prev_view=self._prev_view, prev_proj=self._prev_proj)
        t0 = time.perf_counter()
        state = _render_many(self.scene_arrays, state, cam_base,
                             jnp.uint32(self.frame), self.cfg, int(k))
        state["fb"].accum.block_until_ready()
        dt = time.perf_counter() - t0
        self.last_di = state["last_di"]
        self.last_gi = state["last_gi"]
        self.last_sdata = state["last_sdata"]
        self.fb = state["fb"]
        self.l1 = state["l1"]
        self._prev_view = state["prev_view"]
        self._prev_proj = state["prev_proj"]
        self.frame += int(k)
        self.metrics = dict(frame_time_s=dt / max(k, 1),
                            fps=k / max(dt, 1e-9), frame=self.frame,
                            batch_frames=int(k), batch_time_s=dt)

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


def _wants_stream(scene, cfg) -> bool:
    """Build the stream accel for traversal="stream" or a big-scene auto."""
    from royaltracer_dx_tpu.config import STREAM_AUTO_MIN_TRIS

    if cfg.accel == "stream":
        return True
    return cfg.accel == "auto" and scene.num_triangles >= STREAM_AUTO_MIN_TRIS
