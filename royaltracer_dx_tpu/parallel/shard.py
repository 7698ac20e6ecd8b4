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


def make_sharded_restir_frame(mesh: Mesh, cfg: RenderConfig):
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
    ppermute pairs of [halo*W, 8] shard rows over ICI.

    Returns fn(scene, cam, frame, xs, ys, packed_di, packed_gi) ->
    (sample [N,3], new_packed_di, new_packed_gi, l1 [N,3]) with xs/ys the
    GLOBAL pixel coordinates and packed_* the 3-shard last-frame record
    tables (render/restir_renderer.py pack layout).
    """
    from royaltracer_dx_tpu.render import restir_renderer as rr
    from royaltracer_dx_tpu.utils import pvec as pv

    n_dev = mesh.devices.size
    if cfg.height % n_dev:
        raise ValueError(f"height {cfg.height} not divisible by {n_dev} devices")
    band_h = cfg.height // n_dev
    halo_rows = min(cfg.spatial_radius, band_h)
    hw = halo_rows * cfg.width

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

    def local(scene, cam, frame, xs, ys, packed_di, packed_gi):
        row0 = ys[0] - halo_rows          # first GLOBAL row of the
        bh_ext = band_h + 2 * halo_rows   # halo-extended local window
        res_di, sdata, gi_in, seed = rr.pass1_di(scene, cam, frame, cfg, xs, ys)
        st = rr.pass1_gi_init(scene, gi_in, seed, cfg)
        for b in range(cfg.gi_bounces):
            st = rr.pass1_gi_bounce(scene, cfg, st, jnp.uint32(b))
        res_gi, _ = rr.pass1_gi_final(scene, gi_in, st, cfg)
        res_di, res_gi = rr.pass2_temporal(
            scene, cam, frame, res_di, res_gi, sdata,
            halo_extend(packed_di), halo_extend(packed_gi),
            cfg, xs=xs, ys=ys, row0=row0, band_h=bh_ext,
        )
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

    sharded = shard_map(
        local,
        mesh,
        in_specs=(P(), P(), P(), P(PIXEL_AXIS), P(PIXEL_AXIS),
                  P(PIXEL_AXIS), P(PIXEL_AXIS)),
        out_specs=(P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS)),
    )
    return jax.jit(sharded)


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
        self._frame_fn = make_sharded_restir_frame(self.mesh, cfg)

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
        t0 = self._time.perf_counter()
        sample, self.packed_di, self.packed_gi, self.l1 = self._frame_fn(
            self.scene_arrays, cam, jnp.uint32(self.frame),
            self.xs, self.ys, self.packed_di, self.packed_gi)
        changed = jnp.any(jnp.abs(cam["view"] - self._prev_view) > 1e-6)
        self.fb = accumulate(self.fb, sample, changed, cfg.max_accum_frames)
        self.fb.accum.block_until_ready()
        dt = self._time.perf_counter() - t0
        self._prev_view = cam["view"]
        self._prev_proj = cam["proj"]
        self.frame += 1
        k = cfg.spatial_candidate_count
        rays_per_pixel = (3 + 1) + (1 + cfg.gi_bounces + 1) + 2 + (3 * k + 3)
        rays = cfg.num_pixels * rays_per_pixel
        self.metrics = dict(
            frame_time_s=dt, fps=1.0 / max(dt, 1e-9), frame=self.frame,
            rays_traced=rays, mrays_per_s=rays / dt / 1e6,
            devices=int(self.mesh.devices.size),
        )

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
