"""RMSE study (VERDICT r2 #5): converged runs at 128^2, DI and DI+GI,
with bias/noise separation.

Bias vs noise: the converged ReSTIR mean (many frames, frame-seeded) is
an estimate of the pipeline's expectation; the quirk-free megakernel
oracle converges to the physically-correct expectation.  RMSE between
the two converged images mixes residual noise with systematic bias —
separating them:

  * noise floor: split the ReSTIR frames into two halves; rmse(half1,
    half2)/sqrt(2) estimates residual per-image noise.
  * bias: rmse of the two converged means minus the noise floors (in
    quadrature) — what remains is systematic.

Usage: python scripts/rmse_study.py [res] [oracle_frames] [restir_frames]
Writes a JSON line per config; run alone (single tunneled chip).
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
    from royaltracer_dx_tpu.utils.metrics import rel_mean, rmse

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    of = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    rf = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    cam = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))
    print(f"device {jax.devices()[0]} res {res} frames {of}/{rf}",
          flush=True)

    def oracle_halves(mb, frames):
        """Oracle as two seed-independent halves: (mean image, per-half
        noise rmse).  The oracle's own residual noise must be subtracted
        from the bias estimate — at these frame counts it is comparable
        to the ReSTIR residual.

        mb=1 (the DI target) uses the MIS-free pure-NEE DiOracle: the v5
        megakernel at max_bounces=1 truncates the emissive-hit MIS
        complement of its NEE weight and under-counts direct light ~1%
        (tests/test_rmse.py module docstring, round-3 arbitration).
        Deeper targets keep the quirk-free megakernel."""
        from royaltracer_dx_tpu.render.di_oracle import DiOracle

        hs = []
        for h in range(2):
            if mb == 1:
                o = DiOracle(cornell_box(emission=18.0), cam,
                             RenderConfig(width=res, height=res))
            else:
                o = Renderer(cornell_box(emission=18.0), cam,
                             RenderConfig(width=res, height=res,
                                          max_bounces=mb, aa_jitter=False,
                                          reference_mis_quirk=False))
            o.frame = h * 100_003
            for _ in range(frames // 2):
                o.render()
            hs.append(o.radiance())
        return 0.5 * (hs[0] + hs[1]), rmse(hs[0], hs[1]) / np.sqrt(2.0)

    ora = ora_noise = None
    if "ablate" not in sys.argv and "matched" not in sys.argv:
        t0 = time.perf_counter()
        ora, ora_noise = oracle_halves(5, of)
        print(f"oracle {of} frames: {time.perf_counter()-t0:.0f}s "
              f"noise_half {ora_noise:.6f}", flush=True)

    configs = [
        ("di_only", dict(gi_bounces=0)),
        ("full", dict()),
    ]
    if "ablate_full" in sys.argv:
        # full-pipeline (DI+GI) reuse ladder vs the mb5 oracle: attributes
        # the converged full-config bias between truncation (present in
        # every row) and reuse correlation (the no-reuse -> full delta)
        configs = [
            ("full_noreuse", dict(temporal_reuse=False,
                                  spatial_candidate_count=0)),
            ("full_temporal_only", dict(spatial_candidate_count=0)),
            ("full_spatial_only", dict(temporal_reuse=False)),
            ("full", dict()),
        ]
    elif "matched" in sys.argv:
        # matched-transport comparison: the product default (gi_bounces=3)
        # carries less transport than the mb5 oracle; gi6-vs-mb8 compares
        # both near transport convergence, so the residual isolates the
        # reuse-correlation part from the truncation part.
        configs = [("full_matched_gi6_mb8", dict(gi_bounces=6))]
    if "ablate" in sys.argv:
        # reuse-ablation ladder: converged bias by reuse stage.  If the
        # no-reuse run lands within the noise floors, the residual bias
        # of the full config is attributable to reuse correlation — the
        # reference's own algorithmic structure, not a port defect.
        configs = [
            ("di_noreuse", dict(gi_bounces=0, temporal_reuse=False,
                                spatial_candidate_count=0)),
            ("di_temporal_only", dict(gi_bounces=0,
                                      spatial_candidate_count=0)),
            ("di_spatial_only", dict(gi_bounces=0, temporal_reuse=False)),
            ("di_only", dict(gi_bounces=0)),
        ]
    di_target = None
    for label, kw in configs:
        t0 = time.perf_counter()
        # DI-only ReSTIR converges to the 1-bounce oracle (test_rmse.py)
        if label.startswith("di"):
            if di_target is None:
                di_target = oracle_halves(1, of)
            target, t_noise = di_target
        elif "mb8" in label:
            target, t_noise = oracle_halves(8, of)
        else:
            target, t_noise = ora, ora_noise

        halves = []
        for h in range(2):
            rr = RestirRenderer(cornell_box(emission=18.0), cam,
                                RenderConfig(width=res, height=res,
                                             aa_jitter=False, **kw))
            rr.frame = h * 100_003   # independent seed stream per half
            for _ in range(rf // 2):
                rr.render()
            halves.append(rr.radiance())
        img = 0.5 * (halves[0] + halves[1])
        noise = rmse(halves[0], halves[1]) / np.sqrt(2.0)
        total = rmse(img, target)
        # seam-robust variant: wall-seam pixels whose primary hit lands
        # an ulp on the other side of a plane differ by their FULL value
        # between independently-jitted renderers (binary visibility);
        # trimming the top 0.1% |diff| pixels shows whether the residual
        # is a handful of such pixels or broad structure
        diff2 = ((img - target) ** 2).mean(axis=-1).ravel()
        keep = np.sort(diff2)[: int(len(diff2) * 0.999)]
        trim999 = float(np.sqrt(keep.mean()))
        # subtract BOTH converged-mean noise floors (each mean-of-two-
        # halves has variance noise^2/2) — what remains is systematic
        bias = float(np.sqrt(max(
            total**2 - 0.5 * noise**2 - 0.5 * float(t_noise)**2, 0.0)))
        out = {
            "config": label,
            "res": res,
            "frames": [of, rf],
            "rmse": round(float(total), 6),
            "rmse_trim999": round(trim999, 6),
            "rel_mean": round(float(rel_mean(img, target)), 6),
            "noise_half_rmse": round(float(noise), 6),
            "oracle_noise_half_rmse": round(float(t_noise), 6),
            "bias_estimate": round(bias, 6),
            "secs": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
