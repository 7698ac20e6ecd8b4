"""Converged-image RMSE harness: ReSTIR vs the v5 megakernel oracle.

Replaces the round-1 0.3x-3x mean-energy sanity check with per-pixel
comparisons against the oracle (include/RayGen.hlsl:80-137 semantics) at
matched transport settings, pixel-aligned primaries (aa_jitter=False) and
the CORRECTED emissive-hit MIS (reference_mis_quirk=False).

What the harness established (round 2, 32x32..48x48 cornell):
  * DI-only (gi_bounces=0 vs megakernel max_bounces=1): rel_mean 1.008,
    RMSE 0.014 — the RIS + temporal + spatial + MIS DI chain is unbiased.
  * Full DI+GI vs a quirk-free mb5 oracle: rel_mean 0.983, RMSE 0.038 at
    modest frame counts — the flagship pipeline is energy-correct.
  * The reference's v5 emissive-hit MIS quirk (pdf_light missing 1/area,
    include/Hit.hlsl:160-165, kept behind cfg.reference_mis_quirk)
    OVER-counts bounce-order >= 2 direct light by ~70%% (order-2 energy
    0.111 with the quirk vs 0.065 corrected).  RMSE oracles must disable
    it; parity renders of the reference scene keep it.

Round-3 bias decomposition (32^2 cornell, converged; scripts/rmse_study.py
re-measures at 128^2 on device).  The round-2 "1.7%% deficit" of the full
pipeline vs the mb5 oracle splits into two explained parts:
  * ~0.8%% transport truncation: the oracle ladder is mb3/4/5/6 = 96.6 /
    98.4 / 99.3 / 99.7%% of mb8, and gi_bounces=3 carries less transport
    than mb5 (restir gi2/3/4/5 = 96.0 / 97.6 / 98.3 / 98.9%% of mb8 —
    the gap closes with more bounces, so it is support, not bias).
  * ~1.0%% reuse-correlation bias with the REFERENCE'S OWN structure:
    converged rel_mean vs mb5 is 0.992 with no reuse, 0.991 with
    temporal only, 0.995 with spatial only, but 0.982 with both —
    each stage alone is energy-neutral; feeding spatially-merged
    reservoirs back into the next frame's temporal pass (exactly what
    RayGen_v6_pass3's last-buffer write does) correlates the pairwise-MIS
    inputs.  Not an implementation bug; documented algorithmic behavior.
  * NOT the cause (measured): w_sum_threshold (+0.1%% when lifted),
    j_threshold (clamp removal LOWERS energy: fireflies guard),
    temporal_r_threshold, M caps (uncapping slows convergence instead).

Round-3 DI arbitration (64^2/128^2, scripts/rmse_di_diag.py + a pure-NEE
quadrature): the residual "+1%% DI bias" was the mb1 ORACLE's defect, not
the pipeline's.  Proof chain: (a) both estimators are candidate-count-
independent (oracle ris_m 1/10/32 -> 0.56590/0.56589/0.56591; restir
nee 1/4 -> 0.571086/0.571109), so no MIS-weight bug on either side; (b)
forcing ALL visibility transparent preserves the +1.03%% split — it is
estimator math, not shadow epsilons; (c) an MIS-free uniform-light-area
quadrature with the v6 blended BRDF (render/di_oracle.py) converges to
0.5714 = the ReSTIR side.  The v5 megakernel's NEE carries MIS weight
pdf_l/(pdf_l + pdf_b) whose complement arrives via the MIS-weighted
emissive hit of the NEXT bounce's continuation ray (Hit.hlsl:126-174);
max_bounces=1 truncates that complement, so mb1 under-counts direct
light ~1%% (a property of every finite-depth MIS path tracer's LAST
bounce).  DI comparisons therefore target DiOracle; deep-transport
comparisons keep the megakernel ladder with the truncation documented.
"""

import numpy as np

from royaltracer_dx_tpu.camera import Camera
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.render.renderer import Renderer
from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
from royaltracer_dx_tpu.scene.procedural import cornell_box
from royaltracer_dx_tpu.utils.metrics import rel_mean, rmse

W = 32
CAM = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))


def _oracle(max_bounces, frames=200):
    r = Renderer(cornell_box(emission=18.0), CAM,
                 RenderConfig(width=W, height=W, max_bounces=max_bounces,
                              aa_jitter=False, reference_mis_quirk=False))
    for _ in range(frames):
        r.render()
    return np.asarray(r.radiance())


def _restir(frames=100, **extra):
    rr = RestirRenderer(cornell_box(emission=18.0), CAM,
                        RenderConfig(width=W, height=W, aa_jitter=False,
                                     **extra))
    for _ in range(frames):
        rr.render()
    return np.asarray(rr.radiance())


def test_di_chain_unbiased_vs_oracle():
    """DI-only ReSTIR (RIS + temporal + spatial + MIS + visibility) must
    converge to the direct-lighting oracle: the class of subtle MIS-weight
    bug ReSTIR is famous for would move rel_mean off 1.

    The target is the MIS-free pure-NEE DiOracle (see module docstring:
    the mb1 megakernel under-counts ~1% by truncating its emissive-hit
    MIS complement)."""
    from royaltracer_dx_tpu.render.di_oracle import DiOracle

    o = DiOracle(cornell_box(emission=18.0), CAM,
                 RenderConfig(width=W, height=W, traversal="brute"))
    for _ in range(600):
        o.render()
    a = o.radiance()
    b = _restir(gi_bounces=0)
    assert 0.97 < rel_mean(b, a) < 1.03, (rel_mean(b, a), rmse(b, a))
    assert rmse(b, a) < 0.05, rmse(b, a)


def test_full_pipeline_energy_correct():
    """Full DI+GI vs the quirk-free deep oracle: measured 0.983/0.038 at
    these frame counts; bounds leave noise headroom only."""
    a = _oracle(max_bounces=5, frames=250)
    b = _restir(frames=120)
    r = rel_mean(b, a)
    assert 0.94 < r < 1.04, (r, rmse(b, a))
    assert rmse(b, a) < 0.08, rmse(b, a)


def test_mis_quirk_overcounts_indirect():
    """Pin the characterization: the reference's emissive-hit MIS quirk
    inflates bounce-2 energy by tens of percent (it is parity behavior,
    never an oracle setting)."""
    a1 = _oracle(max_bounces=1, frames=120)
    a2 = _oracle(max_bounces=2, frames=120)
    q = Renderer(cornell_box(emission=18.0), CAM,
                 RenderConfig(width=W, height=W, max_bounces=2,
                              aa_jitter=False, reference_mis_quirk=True))
    for _ in range(120):
        q.render()
    q2 = np.asarray(q.radiance())
    order2 = (a2 - a1).mean()
    order2_quirk = (q2 - a1).mean()
    assert order2_quirk > 1.3 * order2, (order2_quirk, order2)


def test_megakernel_self_convergence():
    """The oracle's accumulation variance shrinks with frame count."""
    r = Renderer(cornell_box(emission=18.0), CAM,
                 RenderConfig(width=W, height=W, max_bounces=2,
                              aa_jitter=False, reference_mis_quirk=False))
    snaps = []
    for f in range(1, 121):
        r.render()
        if f in (15, 120):
            snaps.append(np.asarray(r.radiance()))
    ref = _oracle(max_bounces=2, frames=240)
    assert rmse(snaps[1], ref) < 0.7 * rmse(snaps[0], ref)
