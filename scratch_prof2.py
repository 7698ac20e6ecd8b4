"""Per-pass timing of the ReSTIR pipeline on the garage+monke scene."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from royaltracer_dx_tpu import cache  # noqa: F401
from royaltracer_dx_tpu.camera import Camera
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.render import restir_renderer as rr
from royaltracer_dx_tpu.cli import build_scene

scene, camera = build_scene("reference")
cfg = RenderConfig(width=256, height=256)
r = rr.RestirRenderer(scene, camera, cfg)
print("tris:", r.scene_arrays.num_triangles, "lights:", r.scene_arrays.lights.count,
      "mats:", r.scene_arrays.materials.count)

# one full render to compile everything
r.render()
print("frame0 metrics:", {k: round(v, 3) for k, v in r.metrics.items()})

scene_a = r.scene_arrays
cam = r._camera_arrays()
frame = jnp.uint32(1)


def bench(name, fn, *args, iters=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:22s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")
    return out


res_di, sdata, gi_in, seed = bench("pass1_di", rr.pass1_di, scene_a, cam, frame, cfg=cfg)
st = bench("pass1_gi_init", rr.pass1_gi_init, scene_a, gi_in, seed, cfg=cfg)
st2 = bench("pass1_gi_bounce", rr.pass1_gi_bounce, scene_a, cfg, st, jnp.uint32(0))
for b in range(1, cfg.gi_bounces):
    st2 = rr.pass1_gi_bounce(scene_a, cfg, st2, jnp.uint32(b))
res_gi, _ = bench("pass1_gi_final", rr.pass1_gi_final, scene_a, gi_in, st2, cfg=cfg)
packed_di, packed_gi = rr._pack_last(r.last_di, r.last_gi, r.last_sdata)
m2 = bench("pass2_temporal", rr.pass2_temporal, scene_a, cam, frame, res_di, res_gi,
           sdata, packed_di, packed_gi, cfg=cfg)
bench("pass3_spatial", rr.pass3_spatial, scene_a, cam, frame, m2[0], m2[1], sdata, cfg=cfg)

r.render()
print("frame metrics:", {k: round(v, 3) for k, v in r.metrics.items()})
