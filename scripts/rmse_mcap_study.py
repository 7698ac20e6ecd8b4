"""DI full-reuse M-cap study (VERDICT r3 #5).

Round 3 measured converged DI full-reuse RMSE 0.0076 at 128^2 (bar 5e-3)
and attributed the 0.0055 bias to the temporal<->spatial feedback the
reference's own last-buffer structure creates: pass 3 writes spatially-
merged reservoirs into the 'last' tables that pass 2 merges temporally
next frame, correlating the pairwise-MIS inputs.  The feedback strength
is governed by the M caps (temporal cap 16 / spatial cap 128,
Common_v6.hlsl:18-21): a lower temporal cap discounts the recycled
history faster.  This sweep measures converged DI full-reuse RMSE /
rel_mean vs the MIS-free DiOracle across cap settings to decide whether
the bar is met by a cap tweak or the residual is accepted as the
reference's own estimator structure (PARITY.md accuracy statement).

Usage: python scripts/rmse_mcap_study.py [res] [oracle_frames] [frames]
CPU-safe (forces the cpu backend unless RUN_TPU=1 in env).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if os.environ.get("RUN_TPU", "") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import royaltracer_dx_tpu.cache  # noqa: F401,E402


def main():
    import jax

    from royaltracer_dx_tpu.camera import Camera
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.di_oracle import DiOracle
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
    from royaltracer_dx_tpu.scene.procedural import cornell_box
    from royaltracer_dx_tpu.utils.metrics import rel_mean, rmse

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    of = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    rf = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    cam = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))
    print(f"device {jax.devices()[0]} res {res} frames {of}/{rf}", flush=True)

    t0 = time.time()
    dora = DiOracle(cornell_box(emission=18.0), cam,
                    RenderConfig(width=res, height=res))
    for _ in range(of):
        dora.render()
    ora = dora.radiance()
    print(f"oracle done {time.time()-t0:.0f}s", flush=True)

    # (temporal_m_cap, spatial_m_cap, label)
    configs = [
        (16, 128, "reference defaults"),
        (8, 128, "temporal cap 8"),
        (4, 128, "temporal cap 4"),
        (2, 128, "temporal cap 2"),
        (16, 32, "spatial cap 32"),
        (16, 8, "spatial cap 8"),
        (4, 32, "both reduced"),
    ]
    for tc, sc, label in configs:
        t0 = time.time()
        r = RestirRenderer(
            cornell_box(emission=18.0), cam,
            RenderConfig(width=res, height=res, aa_jitter=False,
                         gi_bounces=0, temporal_m_cap=tc, spatial_m_cap=sc))
        for _ in range(rf):
            r.render()
        img = r.radiance()
        print(json.dumps({
            "label": label, "temporal_m_cap": tc, "spatial_m_cap": sc,
            "rmse": round(rmse(img, ora), 5),
            "rel_mean": round(rel_mean(img, ora), 5),
            "frames": rf, "s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
