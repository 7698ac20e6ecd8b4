"""Multi-chip data parallelism: pixel-sharded rendering over a device Mesh.

The reference is single-GPU (SURVEY.md section 2.3); its only parallel axis
is the per-pixel DispatchRays grid.  On TPU that axis becomes a 1-D
jax.sharding.Mesh: pixels (and their RNG lanes and framebuffer rows) shard
across chips, the scene + BVH + light table replicate, and the only
cross-chip traffic is the scalar camera-changed flag and whatever psum the
caller wants for global metrics — the render itself is embarrassingly
parallel, so collectives ride ICI only for reductions.

Spatial-reuse passes (ReSTIR pass 3) keep their neighbor taps intra-shard
by mirror-clamping at shard borders exactly like the reference clamps at
image borders (Common_v6.hlsl:223-236) — see restir shard notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.render.megakernel import trace_paths_impl

try:  # jax>=0.6 stable API
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_exp(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


PIXEL_AXIS = "pixels"


def pixel_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (PIXEL_AXIS,))


def pad_to_devices(n: int, n_devices: int) -> int:
    """Smallest N' >= n divisible by n_devices (pixel padding)."""
    return ((n + n_devices - 1) // n_devices) * n_devices


def make_sharded_trace(mesh: Mesh, cfg: RenderConfig):
    """jit(shard_map(trace_paths)) with scene replicated, rays sharded.

    Returns fn(scene_arrays, origins, dirs, seeds) -> (radiance [N,3],
    rays_traced [] — psummed across chips).
    """

    def local(scene, origins, dirs, seeds):
        radiance, rays = trace_paths_impl(scene, origins, dirs, seeds, cfg)
        return radiance, jax.lax.psum(rays, PIXEL_AXIS)

    sharded = shard_map(
        local,
        mesh,
        in_specs=(P(), P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS)),
        out_specs=(P(PIXEL_AXIS), P()),
    )
    return jax.jit(sharded)


def _band_geometry(mesh: Mesh, cfg: RenderConfig):
    n_dev = mesh.devices.size
    if cfg.height % n_dev:
        raise ValueError(f"height {cfg.height} not divisible by {n_dev} devices")
    band_h = cfg.height // n_dev
    halo_rows = min(cfg.spatial_radius, band_h)
    return n_dev, band_h, halo_rows


def _make_halo_extend(n_dev: int, hw: int):
    def _halo_extend_one(a):
        """[band_n, C] -> [band_n + 2*hw, C]: neighbors' adjacent rows
        stacked above/below (zero-filled at the image's outer edges, which
        globally-mirrored taps never address)."""
        if n_dev == 1:
            return jnp.pad(a, ((hw, hw), (0, 0)))
        from_above = jax.lax.ppermute(
            a[-hw:], PIXEL_AXIS, [(i, i + 1) for i in range(n_dev - 1)])
        from_below = jax.lax.ppermute(
            a[:hw], PIXEL_AXIS, [(i, i - 1) for i in range(1, n_dev)])
        return jnp.concatenate([from_above, a, from_below], axis=0)

    def halo_extend(packed):
        """Per-shard halo exchange of a packed-record shard tuple."""
        return jax.tree.map(_halo_extend_one, packed)

    return halo_extend


def _stage1_local(scene, cam, frame, xs, ys, cfg, compact: bool):
    """Pass 1 (primary + DI RIS + GI path sampling) on a band shard.

    Returns (res_di, res_gi, sdata, occ) — occ is the [1 + gi_bounces]
    pmean'd occupancy vector (pass-1 sampling fraction, then per-bounce
    GI active fractions), the same quantities the single-chip renderer
    folds into its ACTIVE-ray metrics (VERDICT r3 #6)."""
    from royaltracer_dx_tpu.render import restir_renderer as rr

    res_di, sdata, gi_in, seed = rr.pass1_di(scene, cam, frame, cfg, xs, ys)
    st = rr.pass1_gi_init(scene, gi_in, seed, cfg)
    occ = [jnp.mean(gi_in["sampling"].astype(jnp.float32))]
    bounce_fn = (rr.pass1_gi_bounce_compact.__wrapped__ if compact
                 else rr.pass1_gi_bounce.__wrapped__)
    for b in range(cfg.gi_bounces):
        occ.append(jnp.mean(st["active"].astype(jnp.float32)))
        st = bounce_fn(scene, cfg, st, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(scene, gi_in, st, cfg)
    occ_v = jax.lax.pmean(jnp.stack(occ), PIXEL_AXIS)
    return res_di, res_gi, sdata, occ_v


def _stage2_local(scene, cam, frame, res_di, res_gi, sdata,
                  packed_di, packed_gi, xs, ys, cfg,
                  halo_extend, halo_rows, band_h):
    from royaltracer_dx_tpu.render import restir_renderer as rr

    if not cfg.temporal_reuse:
        return res_di, res_gi
    row0 = ys[0] - halo_rows
    bh_ext = band_h + 2 * halo_rows
    return rr.pass2_temporal(
        scene, cam, frame, res_di, res_gi, sdata,
        halo_extend(packed_di), halo_extend(packed_gi),
        cfg, xs=xs, ys=ys, row0=row0, band_h=bh_ext,
    )


def _stage3_local(scene, cam, frame, res_di, res_gi, sdata,
                  packed_di, packed_gi, xs, ys, cfg,
                  halo_extend, halo_rows, band_h):
    from royaltracer_dx_tpu.render import restir_renderer as rr
    from royaltracer_dx_tpu.utils import pvec as pv

    row0 = ys[0] - halo_rows
    bh_ext = band_h + 2 * halo_rows
    rd = rr._rec_dtype(cfg)
    cur_di = rr._pack_record(sdata, res_di, rr._DI_KEYS, rd)
    cur_gi = rr._pack_record(sdata, res_gi, rr._GI_KEYS, rd)
    sample, shaded, out_di, out_gi = rr.pass3_spatial(
        scene, cam, frame, res_di, res_gi, sdata, cfg,
        xs=xs, ys=ys, row0=row0, band_h=bh_ext,
        packed_di_ext=halo_extend(cur_di),
        packed_gi_ext=halo_extend(cur_gi),
    )
    # ping-pong: the 'last' tables update only for shaded lanes
    sh = shaded[:, None]
    new_di = jax.tree.map(
        lambda new, old: jnp.where(sh, new, old),
        rr._pack_record(sdata, out_di, rr._DI_KEYS, rd), packed_di)
    new_gi = jax.tree.map(
        lambda new, old: jnp.where(sh, new, old),
        rr._pack_record(sdata, out_gi, rr._GI_KEYS, rd), packed_gi)
    l1 = pv.to_aos(sdata["l1"], axis=1)
    return sample, new_di, new_gi, l1


def make_sharded_restir_frame(mesh: Mesh, cfg: RenderConfig,
                              compact: bool = False):
    """The flagship ReSTIR DI+GI frame under pixel-BAND data parallelism.

    The image shards by rows into ``n_devices`` bands; scene/camera
    replicate.  Cross-pixel reuse CROSSES band borders through a row-halo
    exchange (round 3): each band ppermutes its top/bottom
    ``spatial_radius`` rows of packed records to its neighbors, so pass-3
    spatial taps (globally image-mirrored, radius <= halo) and pass-2
    temporal reprojections landing within the halo match the single-chip
    renderer EXACTLY.  Only reprojections jumping further than the halo
    (fast camera/object motion) fall back to rejecting temporal reuse —
    the documented residual deviation.  Per-frame collectives: two
    ppermute pairs of [halo*W, 8] shard rows over ICI plus one pmean of
    the occupancy vector.

    ``compact`` enables the GI wavefront-compacted bounce (same decision
    the single-chip renderer takes — restir.wants_gi_compaction).

    Returns fn(scene, cam, frame, xs, ys, packed_di, packed_gi) ->
    (sample [N,3], new_packed_di, new_packed_gi, l1 [N,3],
    occ [1+gi_bounces] replicated) with xs/ys the GLOBAL pixel
    coordinates and packed_* the 3-shard last-frame record tables
    (render/restir_renderer.py pack layout).
    """
    n_dev, band_h, halo_rows = _band_geometry(mesh, cfg)
    halo_extend = _make_halo_extend(n_dev, halo_rows * cfg.width)

    def local(scene, cam, frame, xs, ys, packed_di, packed_gi):
        res_di, res_gi, sdata, occ = _stage1_local(
            scene, cam, frame, xs, ys, cfg, compact)
        res_di, res_gi = _stage2_local(
            scene, cam, frame, res_di, res_gi, sdata, packed_di, packed_gi,
            xs, ys, cfg, halo_extend, halo_rows, band_h)
        sample, new_di, new_gi, l1 = _stage3_local(
            scene, cam, frame, res_di, res_gi, sdata, packed_di, packed_gi,
            xs, ys, cfg, halo_extend, halo_rows, band_h)
        return sample, new_di, new_gi, l1, occ

    sharded = shard_map(
        local,
        mesh,
        in_specs=(P(), P(), P(), P(PIXEL_AXIS), P(PIXEL_AXIS),
                  P(PIXEL_AXIS), P(PIXEL_AXIS)),
        out_specs=(P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS),
                   P(PIXEL_AXIS), P()),
    )
    return jax.jit(sharded)


def make_sharded_restir_stages(mesh: Mesh, cfg: RenderConfig,
                               compact: bool = False):
    """The same frame as three separately-jitted sharded stages (pass 1 /
    pass 2 / pass 3) so the renderer's profile mode can sync between them
    — the single-chip per-pass tick analog.  Composing the stages is
    arithmetically identical to the fused frame (same locals)."""
    n_dev, band_h, halo_rows = _band_geometry(mesh, cfg)
    halo_extend = _make_halo_extend(n_dev, halo_rows * cfg.width)
    band = P(PIXEL_AXIS)

    s1 = jax.jit(shard_map(
        lambda scene, cam, frame, xs, ys: _stage1_local(
            scene, cam, frame, xs, ys, cfg, compact),
        mesh,
        in_specs=(P(), P(), P(), band, band),
        out_specs=(band, band, band, P()),
    ))
    s2 = jax.jit(shard_map(
        lambda scene, cam, frame, rd_, rg_, sd_, pdi, pgi, xs, ys:
            _stage2_local(scene, cam, frame, rd_, rg_, sd_, pdi, pgi,
                          xs, ys, cfg, halo_extend, halo_rows, band_h),
        mesh,
        in_specs=(P(), P(), P(), band, band, band, band, band, band, band),
        out_specs=(band, band),
    ))
    s3 = jax.jit(shard_map(
        lambda scene, cam, frame, rd_, rg_, sd_, pdi, pgi, xs, ys:
            _stage3_local(scene, cam, frame, rd_, rg_, sd_, pdi, pgi,
                          xs, ys, cfg, halo_extend, halo_rows, band_h),
        mesh,
        in_specs=(P(), P(), P(), band, band, band, band, band, band, band),
        out_specs=(band, band, band, band),
    ))
    return s1, s2, s3


def shard_pixels(mesh: Mesh, *arrays):
    """Device_put arrays (or pytrees of arrays, e.g. packed-record shard
    tuples) with their leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(PIXEL_AXIS))
    return tuple(
        jax.tree.map(lambda x: jax.device_put(x, sharding), a)
        for a in arrays)


def replicate(mesh: Mesh, tree):
    """Device_put a pytree fully replicated."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


class ShardedRestirRenderer:
    """Multi-chip RestirRenderer: the product-facing wrapper over
    ``make_sharded_restir_frame`` (render/update/radiance/image/metrics
    match RestirRenderer so callers and the CLI can switch on device
    count).  Pixels shard by row bands; the framebuffer, reservoir and
    sample-record state live sharded on their owning chips; scene and
    camera replicate.
    """

    def __init__(self, scene, camera, cfg: RenderConfig, devices=None):
        import time as _time

        from royaltracer_dx_tpu.ops import restir
        from royaltracer_dx_tpu.render import restir_renderer as rr
        from royaltracer_dx_tpu.render.framebuffer import Framebuffer

        self._rr = rr
        self._time = _time
        self.mesh = pixel_mesh(devices)
        n_dev = self.mesh.devices.size
        if cfg.height % n_dev:
            raise ValueError(
                f"height {cfg.height} not divisible by {n_dev} devices")
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.materials = scene.build_materials()
        self.scene_arrays = replicate(self.mesh, scene.flatten(
            self.materials,
            build_bvh=cfg.accel == "bvh",
            build_clusters=cfg.accel == "cluster",
            build_stream=_wants_stream(scene, cfg),
        ))
        # same GI-compaction decision as the single-chip renderer
        # (restir.wants_gi_compaction; pinned by tests/test_dispatch.py)
        self._compact = restir.wants_gi_compaction(self.scene_arrays, cfg)
        self._frame_fn = make_sharded_restir_frame(self.mesh, cfg,
                                                   compact=self._compact)
        self._stage_fns = None   # built lazily on first profiled frame
        # opt-in per-pass timing/occupancy, matching RestirRenderer
        self.profile = False

        n = cfg.num_pixels
        ys, xs = np.meshgrid(np.arange(cfg.height), np.arange(cfg.width),
                             indexing="ij")
        self.xs, self.ys = shard_pixels(
            self.mesh, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()))
        # zero packed shards: mid = miss sentinel (S0 col 6), flags = 1
        # (|l1| == 0, not valid — matching _pack_record on zero state)
        s0 = np.zeros((n, 8), np.float32)
        s0[:, 6] = float(jnp.uint32(rr.MISS_MATERIAL_ID).astype(jnp.int32))
        s0[:, 7] = 1.0
        rd = rr._rec_dtype(cfg)
        packed0 = (jnp.asarray(s0, rd), jnp.zeros((n, 8), rd),
                   jnp.zeros((n, 8), rd))
        self.packed_di, self.packed_gi = shard_pixels(
            self.mesh, packed0, packed0)
        fb = Framebuffer.create(n)
        self.fb = jax.tree.map(
            lambda a: shard_pixels(self.mesh, a)[0], fb)
        self.l1 = shard_pixels(self.mesh, jnp.zeros((n, 3)))[0]
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

    def update(self, camera=None):
        if camera is not None:
            self.camera = camera
        self.scene_arrays = replicate(self.mesh, self.scene.flatten(
            self.materials, prev=self.scene_arrays))

    def render(self) -> None:
        from royaltracer_dx_tpu.render.framebuffer import accumulate

        cfg = self.cfg
        cam = self._camera_arrays()
        # seed term: frame counter or wall-clock nanos (the reference's
        # camera-buffer time) — same rule as RestirRenderer.render
        if cfg.seed_mode == "time":
            frame = jnp.uint32(self._time.time_ns() & 0xFFFFFFFF)
        else:
            frame = jnp.uint32(self.frame)
        t0 = self._time.perf_counter()
        pass_times: dict = {}

        if self.profile:
            # per-pass timing: the 3-stage composition (arithmetically
            # identical to the fused frame; each sync is a device round
            # trip, so profiled frames are indicative, not additive)
            if self._stage_fns is None:
                self._stage_fns = make_sharded_restir_stages(
                    self.mesh, cfg, compact=self._compact)
            s1, s2, s3 = self._stage_fns

            def tick(label, x):
                jax.block_until_ready(x)
                now = self._time.perf_counter()
                pass_times[label] = now - (t0 + sum(pass_times.values()))

            res_di, res_gi, sdata, occ = s1(
                self.scene_arrays, cam, frame, self.xs, self.ys)
            tick("pass1", res_di["w_sum"])
            res_di, res_gi = s2(
                self.scene_arrays, cam, frame, res_di, res_gi, sdata,
                self.packed_di, self.packed_gi, self.xs, self.ys)
            tick("pass2_temporal", res_di["w_sum"])
            sample, self.packed_di, self.packed_gi, self.l1 = s3(
                self.scene_arrays, cam, frame, res_di, res_gi, sdata,
                self.packed_di, self.packed_gi, self.xs, self.ys)
            tick("pass3_spatial", sample)
        else:
            sample, self.packed_di, self.packed_gi, self.l1, occ = (
                self._frame_fn(self.scene_arrays, cam, frame,
                               self.xs, self.ys,
                               self.packed_di, self.packed_gi))
        changed = jnp.any(jnp.abs(cam["view"] - self._prev_view) > 1e-6)
        self.fb = accumulate(self.fb, sample, changed, cfg.max_accum_frames)
        self.fb.accum.block_until_ready()
        dt = self._time.perf_counter() - t0
        self._prev_view = cam["view"]
        self._prev_proj = cam["proj"]
        self.frame += 1
        # ACTIVE-ray accounting, same formula as RestirRenderer.render
        # (VERDICT r3 #6: lock-step lane counts overstated rays_traced)
        k = cfg.spatial_candidate_count
        b_gi = cfg.gi_bounces
        lanes_pp = (3 + 1) + (1 + b_gi + 1) + 2 + (3 * k + 1 + 2)
        lanes = cfg.num_pixels * lanes_pp
        ov = np.asarray(occ, np.float64)
        s1f, occs = float(ov[0]), ov[1:]
        active_pp = (1.0
                     + (1 + 1 + 1 + 1) * s1f
                     + float(occs.sum())
                     + 2.0 * s1f
                     + (3 * k + 1 + 2) * s1f)
        rays_active = cfg.num_pixels * active_pp
        self.metrics = dict(
            frame_time_s=dt, fps=1.0 / max(dt, 1e-9), frame=self.frame,
            rays_traced=rays_active, ray_lanes=lanes,
            pass1_sampling=s1f,
            mrays_per_s=rays_active / dt / 1e6,
            mray_lanes_per_s=lanes / dt / 1e6,
            devices=int(self.mesh.devices.size),
        )
        if self.profile:
            occupancy = {"pass1_sampling": s1f}
            for b in range(b_gi):
                occupancy[f"gi_bounce{b}_active"] = float(ov[1 + b])
            self.metrics["pass_times_s"] = pass_times
            self.metrics["occupancy"] = occupancy

    def radiance(self):
        avg = self.fb.accum / np.maximum(np.asarray(self.fb.count), 1.0)[:, None]
        l1 = np.asarray(self.l1)
        emissive = (l1 != 0).any(axis=-1)
        out = np.where(emissive[:, None], l1, np.asarray(avg))
        return out.reshape(self.cfg.height, self.cfg.width, 3)

    def image(self, srgb: bool = True):
        from royaltracer_dx_tpu.utils import math3d as m3

        img = np.nan_to_num(self.radiance(), nan=0.0, posinf=0.0)
        if srgb:
            img = np.asarray(m3.srgb_gamma(jnp.clip(jnp.asarray(img), 0.0, None)))
        return np.clip(img, 0.0, 1.0)


def _wants_stream(scene, cfg) -> bool:
    """Build the stream accel for traversal="stream" or a big-scene auto."""
    from royaltracer_dx_tpu.config import STREAM_AUTO_MIN_TRIS

    if cfg.accel == "stream":
        return True
    return cfg.accel == "auto" and scene.num_triangles >= STREAM_AUTO_MIN_TRIS
