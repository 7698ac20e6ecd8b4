"""Per-pass profile of the 1080p garage ReSTIR frame (VERDICT #2 target).

Run alone (single tunneled chip).  Prints per-pass wall times from the
renderer's profile mode plus the honest per-frame metrics.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu  # noqa: F401
import royaltracer_dx_tpu.cache  # noqa: F401


def main():
    import jax

    from royaltracer_dx_tpu.cli import build_scene
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer

    print("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    w, h = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=w, height=h)
    r = RestirRenderer(scene, camera, cfg)
    print(f"{w}x{h}, tris={int(scene.flatten(r.materials).tri_verts.shape[0])}, "
          f"traversal={cfg.accel}")

    # warm up / compile
    t0 = time.perf_counter()
    r.render()
    jax.block_until_ready(r.fb.accum)
    print(f"frame 0 (compile): {time.perf_counter()-t0:.1f}s")

    # steady-state frames
    for i in range(3):
        t0 = time.perf_counter()
        r.render()
        jax.block_until_ready(r.fb.accum)
        print(f"frame {i+1}: {time.perf_counter()-t0:.3f}s  "
              f"metrics={ {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.metrics.items() if not isinstance(v, dict)} }")

    # one profiled frame (per-pass sync timing)
    r.profile = True
    t0 = time.perf_counter()
    r.render()
    jax.block_until_ready(r.fb.accum)
    total = time.perf_counter() - t0
    print(f"profiled frame: {total:.3f}s")
    for k, v in r.metrics.get("pass_times_s", {}).items():
        print(f"  {k:24s} {v*1e3:8.1f} ms")
    occ = r.metrics.get("gi_occupancy")
    if occ is not None:
        print("  gi occupancy:", [round(float(x), 3) for x in np.asarray(occ)])


if __name__ == "__main__":
    main()
