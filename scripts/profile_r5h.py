"""Round-5 part H: flagship frame re-measure after the r5 perf landings
(wide tri-table gather, defer closest epilogue).

Prints garage-256 frame ms, 1080p frame s + per-pass profile ticks, and
channel means (gallery-parity check).  Run alone on the chip."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.cli import build_scene
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.render import restir_renderer as rr

T0 = time.perf_counter()


def say(*a):
    print(*a, flush=True)


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")

    r256 = rr.RestirRenderer(scene, camera,
                             RenderConfig(width=256, height=256))
    r256.render()
    t0 = time.perf_counter()
    for _ in range(5):
        r256.render()
    say(f"garage-256 frame {(time.perf_counter()-t0)/5*1e3:.1f} ms "
        f"[t={time.perf_counter()-T0:.0f}s]")

    fr = rr.RestirRenderer(scene, camera,
                           RenderConfig(width=1920, height=1080))
    t0 = time.perf_counter()
    fr.render()
    say(f"1080p first frame {time.perf_counter()-t0:.1f} s (compile)")
    t0 = time.perf_counter()
    for _ in range(3):
        fr.render()
    fdt = (time.perf_counter() - t0) / 3
    img = np.asarray(fr.radiance())
    say(f"1080p frame {fdt*1e3:.1f} ms  channel means "
        f"{[round(float(c), 4) for c in img.mean(axis=(0, 1))]} "
        f"finite={np.isfinite(img).all()} [t={time.perf_counter()-T0:.0f}s]")

    fr.profile = True
    fr.render()
    say("pass ticks:", {k: round(v * 1e3, 1)
                        for k, v in fr.metrics.get("pass_times_s", {}).items()})
    say(f"done [t={time.perf_counter()-T0:.0f}s]")


if __name__ == "__main__":
    main()
