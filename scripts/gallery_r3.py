"""Round-3 gallery renders: sponza atrium, bunny, dragon (docs/).

Run alone (single tunneled chip).  Each render uses the product CLI path
(auto traversal -> stream for the big scenes).
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
    from royaltracer_dx_tpu.utils.image import write_png

    print("device:", jax.devices()[0], flush=True)
    jobs = [
        ("sponza", 384, 240),
        ("bunny", 384, 160),
        ("dragon", 384, 160),
    ]
    for name, res, frames in jobs:
        t0 = time.perf_counter()
        scene, cam = build_scene(name)
        r = RestirRenderer(scene, cam, RenderConfig(width=res, height=res))
        for i in range(frames):
            r.render()
        img = r.image()
        assert np.isfinite(np.asarray(img)).all()
        out = f"/root/repo/docs/{name}_{res}.png"
        write_png(out, img)
        print(f"{name}: {frames} frames {time.perf_counter()-t0:.0f}s "
              f"-> {out}  (last frame {r.metrics['frame_time_s']*1e3:.0f} ms,"
              f" {r.metrics['mrays_per_s']:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
