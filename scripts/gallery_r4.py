"""Round-4 gallery renders: sponza/bunny/dragon + the 1080p garage
flagship (docs/), VERDICT r3 #9.

Run alone (single tunneled chip).  Each render uses the product CLI path
(auto traversal -> stream for the big scenes)."""

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
    from royaltracer_dx_tpu.utils.image import write_png

    print("device:", jax.devices()[0], flush=True)
    jobs = [
        ("reference", "garage_1080p", 1920, 1080, 24),
        ("sponza", None, 384, 384, 160),
        ("bunny", None, 384, 384, 120),
        ("dragon", None, 384, 384, 120),
    ]
    for name, out_name, w, h, frames in jobs:
        t0 = time.perf_counter()
        scene, cam = build_scene(name)
        r = RestirRenderer(scene, cam, RenderConfig(width=w, height=h))
        for i in range(frames):
            r.render()
        img = r.image()
        assert np.isfinite(np.asarray(img)).all()
        out = f"/root/repo/docs/{out_name or name}_{w}x{h}.png"
        write_png(out, img)
        print(f"{name}: {frames} frames {time.perf_counter()-t0:.0f}s "
              f"-> {out}  (last frame {r.metrics['frame_time_s']*1e3:.0f} ms,"
              f" {r.metrics['mrays_per_s']:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
