"""Render configuration.

Mirrors the reference's compile-time constants (names and defaults from
/root/reference/Pathtracer/include/Common_v6.hlsl:1-28 and the v5 set in
include/Common.hlsl:1-8, include/RayGen.hlsl:62-64) as one runtime dataclass.
"""

from __future__ import annotations

import dataclasses


# The reference defines PI as 3.1415f (Common_v6.hlsl:1).  We keep the exact
# constant for behavioral parity in BSDF/pdf math; tests that check against
# analytic values account for it.
REF_PI = 3.1415

# Shadow-ray bias (Common_v6.hlsl:2; the v5 set uses 1e-5, Common.hlsl:2).
S_BIAS = 2.0e-5
# Float-precision epsilon (Common_v6.hlsl:3; v5 uses 1e-4).
EPSILON = 1.0e-6

# auto traversal threshold: brute below this many triangles, stream above.
# Scenes in [threshold, 8k tris] take stream's single-level FLAT path
# (ops/stream_trace._trace_flat — measured 21 vs brute's 37 ns/ray on the
# 2.2k-tri garage at 1080p); below the threshold a dense brute sweep still
# wins (a 1-2 cluster worklist is brute plus sort/cull overhead).
STREAM_AUTO_MIN_TRIS = 1500

LUT_SIZE_THETA = 16

# Sentinel materialID written by the miss shader (Miss_v6.hlsl:7,
# Common_v6.hlsl:70-74).
MISS_MATERIAL_ID = 4294967294


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Tunable render parameters (defaults = the reference's)."""

    width: int = 1920
    height: int = 1080

    # --- path tracing (v5 megakernel & GI path sampler) ---
    max_bounces: int = 8          # v5 loops "forever" with RR; we cap statically
    rr_threshold: int = 3         # russian roulette start depth (RayGen.hlsl:64)
    samples_per_pixel: int = 1    # samples per frame (RayGen.hlsl:62)
    ris_m: int = 10               # v5 RIS candidate count (Common.hlsl:8)

    # --- ReSTIR v6 constants (Common_v6.hlsl:8-28) ---
    nee_samples: int = 4
    nee_samples_di: int = 4
    bsdf_samples_di: int = 1
    gi_bounces: int = 3
    gi_rr_threshold: int = 1
    spatial_candidate_count: int = 3
    spatial_max_tries: int = 9
    spatial_radius: int = 20
    spatial_exponent: float = 1.0
    spatial_m_cap: int = 128
    spatial_m_cap_gi: int = 128
    # temporal_m_cap: the reference ships 16 (Common_v6.hlsl:20) and the
    # default stays parity-faithful.  The measured accuracy knob (r4 M-cap
    # study, PARITY.md "Full-reuse DI residual"): full temporal+spatial
    # reuse at cap 16 carries RMSE 0.0072 from temporal history
    # correlation; temporal_m_cap=8 meets the 5e-3 bar (RMSE 0.0046,
    # rel_mean 0.99997) at slightly higher noise.  Set 8 when the
    # accuracy bar matters more than variance.
    temporal_m_cap: int = 16
    # Dead-lane trace retirement (r5): GI continuation / BSDF-candidate
    # traces collapse masked-out lanes to dead segments (t_max < t_min)
    # so the flat sweep's per-tile unions thin as occupancy decays.
    # Bit-identical to tracing them (equality-tested); the knob exists
    # for A/B measurement only.
    retire_dead_lanes: bool = True
    temporal_m_cap_gi: int = 16
    temporal_r_threshold: float = 0.09
    w_sum_threshold: float = 5.0
    j_threshold: float = 5.0
    exposure: float = 1.0

    # --- accumulation (RayGen_v6_pass3.hlsl:386) ---
    max_accum_frames: int = 2_000_000

    # Megakernel subpixel AA jitter (RayGen.hlsl:81-84 jitters; the v6
    # ReSTIR passes use pixel centers).  Turn off to use the megakernel as
    # a pixel-aligned RMSE oracle for the ReSTIR pipeline.
    aa_jitter: bool = True

    # --- acceleration structure ---
    # "auto"    = brute below STREAM_AUTO_MIN_TRIS, stream above (the
    #             stream path's fixed per-batch costs only amortize once
    #             the scene outgrows a dense sweep)
    # "brute"   = dense Moller-Trumbore sweep (oracle; fine to ~10k tris)
    # "stream"  = two-level stream traversal (ops/stream_trace.py; the
    #             TPU-native scheme for big scenes, device build/refit)
    # "cluster" = tile-clustered traversal (ops/cluster_traverse.py;
    #             round-1 scheme, superseded by "stream")
    # "bvh"     = LBVH skip-link traversal (legacy; gather-bound on TPU)
    traversal: str = "auto"
    stream_wb: int = 16       # stream: block-worklist window width (r3q: 16
                              # beat 32/8 with the exact per-ray block cull)
    # GI wavefront compaction (SURVEY §7 Stage 3): "auto" = on for
    # stream-accelerated (big) scenes where a bounce costs enough to pay
    # the partition; "on"/"off" force it.  Bit-identical results.
    gi_compaction: str = "auto"
    cluster_group: int = 128
    cluster_tile: int = 128
    # deprecated alias for traversal="bvh" (kept for older callers)
    use_bvh: bool = False
    bvh_leaf_size: int = 4

    @property
    def accel(self) -> str:
        """Effective traversal mode ('brute' | 'cluster' | 'bvh')."""
        return "bvh" if self.use_bvh else self.traversal

    # --- numerics ---
    s_bias: float = S_BIAS
    epsilon: float = EPSILON

    # Use the reference's exact-but-quirky emissive-hit MIS pdf (missing the
    # 1/area factor, include/Hit.hlsl:160-165).  True = bit-behavioral parity
    # with the reference; False = mathematically consistent MIS.
    reference_mis_quirk: bool = True

    # Diagnostic toggle: skip pass 2 entirely (temporal reuse off) so the
    # RMSE study can attribute converged bias to its reuse stage
    # (spatial reuse turns off via spatial_candidate_count=0).  The
    # reference has no such switch — ON is the product behavior.
    temporal_reuse: bool = True

    # RNG seed source for the per-pixel TEA seeds (pixel_seed "time" term,
    # RayGen_v6_pass1.hlsl:76-77):
    #   "frame" = the frame counter (deterministic replays/tests; default)
    #   "time"  = wall-clock nanoseconds cast to uint32, the reference's
    #             camera-buffer time (Renderer.cpp:1754-1761)
    seed_mode: str = "frame"

    # Storage precision of the packed inter-pixel reservoir/sample records
    # (the gather tables of pass 2/3): "f32" (default), "f16", or
    # "bf16" — 2-byte modes halve the shard rows, compute stays f32.
    # "f16" mirrors the reference's half-precision reservoir storage
    # (-enable-16bit-types, DXRHelper.h:122-133) but inherits its RANGE
    # hazard: a bright close light drives DI w_sum past 65504 and the
    # stored reservoir goes inf (measured, r5: cornell emission-18 blows
    # the DI chain's rel_mean to 408); "bf16" has f32 range but its
    # 8-bit mantissa fails the energy bars (rel_mean 0.77 same test).
    # So the DEFAULT stays f32 for the payload tables — VERDICT r4 #5
    # closed as measured-harmful, not neutral — and the gather-cost win
    # comes from pass 3's dedicated f16 ACCEPT tables instead (x1/n1/
    # mid/flags/xn/nn geometry — range-safe; see pass3_spatial), which
    # ship at every record_dtype.
    record_dtype: str = "f32"

    @property
    def num_pixels(self) -> int:
        return self.width * self.height
