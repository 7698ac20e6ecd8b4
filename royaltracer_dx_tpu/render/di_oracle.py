"""MIS-free direct-illumination oracle (pure NEE quadrature).

Why this exists: the v5 megakernel at max_bounces=1 is NOT a valid
direct-light oracle.  Its NEE contribution carries the balance weight
pdf_l/(pdf_l + pdf_b) (Hit.hlsl:183-337 semantics, megakernel.py
_ris_nee), whose complement is delivered by the MIS-weighted emissive
HIT of the bounce-1 continuation ray — which max_bounces=1 truncates.
The missing complement is ~1% of direct energy on the Cornell box
(measured: mb1 converges 0.56589 where this oracle and the ReSTIR DI
pipeline both converge 0.5711-0.5714 — scripts/rmse_di_diag.py and the
/tmp/di_arbiter2 quadrature, 2026-08-18).  Light-area NEE alone covers
ALL direct transport (area lights, no delta lobes), so a single
uniform-area light sample per frame with the v6 blended BRDF is a
complete, unbiased, estimator-trivial oracle for pass-1 DI.

Shadow-ray epsilons mirror visibility_check_p (origin biased S_BIAS
along the normal, segment shortened 10*S_BIAS) so the comparison
isolates estimator math, not contact-shadow epsilon policy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from royaltracer_dx_tpu.camera import Camera
from royaltracer_dx_tpu.config import RenderConfig, S_BIAS
from royaltracer_dx_tpu.ops import bsdf, light_sampling, restir
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.utils.rng import pixel_seed, tea_batch_major


class DiOracle:
    """Progressive pure-NEE DI renderer over a Scene (oracle use only)."""

    def __init__(self, scene, camera: Camera, cfg: RenderConfig):
        self.cfg = cfg
        self.scene_arrays = scene.flatten(scene.build_materials())
        sa = self.scene_arrays
        # Primary-hit geometry comes from the PIPELINE'S OWN jitted
        # pass1_di (sdata planes), not an eager re-trace: XLA fuses the
        # ray-gen + normalize + trace chain differently inside pass1's
        # jit than op-by-op eager execution, and the resulting ulp-level
        # position differences flip wall-seam hits to the other side of
        # the plane — binary shadow visibility then amplifies that to
        # full-value pixel differences (measured: 6 cornell corner-seam
        # pixels carried 97% of the converged DI residual RMSE).  Using
        # pass1's sdata makes the oracle's geometry bit-identical and
        # isolates estimator math.
        from royaltracer_dx_tpu.render import restir_renderer as _rr

        ca = {k: jnp.asarray(v)
              for k, v in camera.matrices(cfg.width / cfg.height).items()}
        ca.setdefault("prev_view", jnp.zeros((4, 4), jnp.float32))
        ca.setdefault("prev_proj", jnp.zeros((4, 4), jnp.float32))
        _, sdata, gi_in, _ = _rr.pass1_di(sa, ca, jnp.uint32(0), cfg)
        self._mat = restir.fetch_material_p(sa, sdata["mid"])
        self._shading = gi_in["sampling"]
        self._x1 = sdata["x1"]
        self._n1 = sdata["n1"]
        self._outgoing = sdata["o"]
        self._l1 = sdata["l1"]
        ys, xs = np.meshgrid(np.arange(cfg.height), np.arange(cfg.width),
                             indexing="ij")
        self._xs = jnp.asarray(xs.ravel())
        self._ys = jnp.asarray(ys.ravel())
        self._cols = light_sampling.light_tables(sa.lights, sa.object_to_world)
        self._acc = np.zeros((cfg.num_pixels, 3), np.float64)
        # frame is the SEED counter (callers may pre-offset it for
        # independent streams); _n_frames counts accumulated frames
        self.frame = 0
        self._n_frames = 0

    def _frame(self, seed):
        return _di_frame(self.scene_arrays, self._mat, self._x1, self._n1,
                         self._outgoing, self._shading, self._l1,
                         tuple(self._cols), seed, self.cfg)

    def render(self) -> None:
        seed = pixel_seed(self._xs, self._ys, 7, jnp.uint32(self.frame))
        c = self._frame(seed)
        self._acc += np.stack([np.asarray(p) for p in c], axis=1)
        self.frame += 1
        self._n_frames += 1

    def render_many(self, k: int) -> None:
        """Accumulate k frames in ONE jit dispatch (see
        RestirRenderer.render_many: small frames are dispatch-bound).
        The on-device partial sum is f32 (relative error ~sqrt(k)*eps,
        orders below the noise it averages); the running total stays the
        host f64 accumulator."""
        c = _di_frames(self.scene_arrays, self._mat, self._x1, self._n1,
                       self._outgoing, self._shading, self._l1,
                       tuple(self._cols), self._xs, self._ys,
                       jnp.uint32(self.frame), self.cfg, int(k))
        self._acc += np.stack([np.asarray(p, np.float64) for p in c], axis=1)
        self.frame += int(k)
        self._n_frames += int(k)

    def radiance(self) -> np.ndarray:
        cfg = self.cfg
        return (self._acc / max(self._n_frames, 1)).astype(
            np.float32).reshape(cfg.height, cfg.width, 3)


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def _di_frames(sa, mat, x1, n1, outgoing, shading, l1, cols, xs, ys,
               frame0, cfg: RenderConfig, k: int):
    """Sum of k _di_frame samples (seeds = frame0..frame0+k-1), matching
    k sequential render() calls exactly per frame."""
    def body(i, acc):
        seed = pixel_seed(xs, ys, 7, frame0 + i.astype(jnp.uint32))
        c = _di_frame(sa, mat, x1, n1, outgoing, shading, l1, cols, seed,
                      cfg)
        return tuple(a + p for a, p in zip(acc, c))
    z = jnp.zeros_like(x1[0])
    return jax.lax.fori_loop(0, k, body, (z, z, z))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _di_frame(sa, mat, x1, n1, outgoing, shading, l1, cols, seed,
              cfg: RenderConfig):
    us, seed = tea_batch_major(seed, 3)
    rec = light_sampling.select_light_records(list(cols), sa.lights.cdf, us[0])
    lv = [(rec[0], rec[1], rec[2]), (rec[3], rec[4], rec[5]),
          (rec[6], rec[7], rec[8])]
    nl = (rec[9], rec[10], rec[11])
    pdf = rec[12]
    em = (rec[13], rec[14], rec[15])
    bu, bv, bw = light_sampling.fold_barycentric(us[1], us[2])
    y = tuple(bu * a + bv * b + bw * c for a, b, c in zip(*lv))
    lvec = pv.sub(y, x1)
    dist = pv.length(lvec)
    ln = pv.scale(lvec, 1.0 / jnp.maximum(dist, 1e-20))
    cosx = jnp.maximum(pv.dot(n1, ln), 0.0)
    # one-sided emitters, like the pipelines' NEE (v6 flips nl toward
    # the receiver; for a receiver-facing sample the two agree)
    cosy = jnp.maximum(pv.dot(nl, pv.neg(ln)), 0.0)
    g = cosx * cosy / jnp.maximum(dist * dist, 1e-12)
    occ = restir.trace_occluded(
        sa, pv.to_aos(pv.add(x1, pv.scale(n1, S_BIAS))), pv.to_aos(ln),
        jnp.zeros_like(dist),
        jnp.maximum(dist - 10.0 * S_BIAS, 2.0 * S_BIAS), cfg)
    vis = jnp.where(occ, 0.0, 1.0)
    f = bsdf.eval_bsdf_blend_p(mat["kd"], mat["ks"], mat["metal"],
                               mat["rough"], mat["lut"], n1, ln, outgoing)
    c = pv.scale(pv.mul(em, f), g * vis / jnp.maximum(pdf, 1e-20))
    c = pv.where(shading, c, pv.splat(jnp.zeros_like(dist)))
    return pv.add(c, l1)
