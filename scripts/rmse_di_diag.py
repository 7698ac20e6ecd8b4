"""DI bias diagnosis: whose estimator moves with its candidate count?

The 128^2 study found di_noreuse converges +1.0% vs the mb1 oracle —
with reuse OFF, so one of the two RIS estimators is biased.  An
unbiased estimator's converged mean must be INDEPENDENT of its
candidate count; sweep M on each side and see whose mean moves:

  oracle mb1 @ ris_m 1/10/32           (megakernel RIS NEE)
  restir di_noreuse @ nee_samples_DI 1/4/16  (SampleRIS + W)

Usage: python scripts/rmse_di_diag.py [res] [frames]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu  # noqa: F401
import royaltracer_dx_tpu.cache  # noqa: F401


def main():
    import jax

    from royaltracer_dx_tpu.camera import Camera
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.renderer import Renderer
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
    from royaltracer_dx_tpu.scene.procedural import cornell_box

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    cam = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))
    print(f"device {jax.devices()[0]} res {res} frames {nf}", flush=True)

    means = {}

    def conv(label, make):
        t0 = time.perf_counter()
        r = make()
        for _ in range(nf):
            r.render()
        img = np.asarray(r.radiance())
        means[label] = float(img.mean())
        print(json.dumps({
            "config": label, "mean": round(float(img.mean()), 6),
            "secs": round(time.perf_counter() - t0, 1)}), flush=True)
        return img

    for m in (1, 10, 32):
        conv(f"oracle_mb1_ris{m}", lambda m=m: Renderer(
            cornell_box(emission=18.0), cam,
            RenderConfig(width=res, height=res, max_bounces=1,
                         aa_jitter=False, reference_mis_quirk=False,
                         ris_m=m)))
    for m in (1, 4, 16):
        conv(f"restir_noreuse_nee{m}", lambda m=m: RestirRenderer(
            cornell_box(emission=18.0), cam,
            RenderConfig(width=res, height=res, gi_bounces=0,
                         aa_jitter=False, temporal_reuse=False,
                         spatial_candidate_count=0, nee_samples_di=m)))
    # pure-NEE variant: no BSDF candidate in the RIS mix
    conv("restir_noreuse_nee4_nobsdf", lambda: RestirRenderer(
        cornell_box(emission=18.0), cam,
        RenderConfig(width=res, height=res, gi_bounces=0,
                     aa_jitter=False, temporal_reuse=False,
                     spatial_candidate_count=0, bsdf_samples_di=0)))
    # quirk-free variant: the ReSTIR renderer defaults to the
    # reference's emissive-hit MIS quirk (missing 1/area,
    # include/Hit.hlsl:160-165) for behavioral parity, while the oracle
    # runs quirk-free — the quirk skews the DI bsdf-candidate MIS too
    conv("restir_noreuse_noquirk", lambda: RestirRenderer(
        cornell_box(emission=18.0), cam,
        RenderConfig(width=res, height=res, gi_bounces=0,
                     aa_jitter=False, temporal_reuse=False,
                     spatial_candidate_count=0,
                     reference_mis_quirk=False)))

    base_o = means.get("oracle_mb1_ris10")
    base_r = means.get("restir_noreuse_nee4")
    rel = {k: round(v / base_o, 5) for k, v in means.items()}
    print(json.dumps({"rel_vs_oracle_ris10": rel,
                      "restir4_vs_oracle10": round(base_r / base_o, 5)}),
          flush=True)


if __name__ == "__main__":
    main()
