"""Dispatch-decision guard tests (VERDICT r3 #7).

The trace dispatcher's tuned constants (_FLAT_MAX_CLUSTERS,
_TRACE_CHUNK_RAYS, STREAM_AUTO_MIN_TRIS, the scattered-batch crossover,
presort and GI-compaction gates) were each measured on one host and can
silently reroute the flagship if edited (it happened in round 3: the
compaction auto-rule engaged on the 2.2k-tri garage and the frame went
3.7 -> 18.4 s before a hand profile caught it).  This module pins the
DECISION — not the result — for every (scene size x batch type) cell
the product renders, so a constant tweak that flips a cell fails loudly
and must update the table deliberately.

Scene sizes mirror the product workloads: garage 2.2k (reference scene),
8k (flat-path ceiling), bunny 82k, sponza 262k, terrain/dragon ~1M.
Batch types: pixel-coherent (primary/visibility), GI-scattered
(coherent=False BSDF continuations), at renderer (256^2=0.59M lanes for
the fused pass-3 batch at 256^2; 18.7M at 1080p).
"""

import types

import pytest

from royaltracer_dx_tpu.config import STREAM_AUTO_MIN_TRIS, RenderConfig
from royaltracer_dx_tpu.ops import restir
from royaltracer_dx_tpu.ops.stream_trace import _FLAT_MAX_CLUSTERS, G, S


def scene_stub(num_tris: int, with_stream: bool = True):
    """Static-attribute stand-in for SceneArrays: the dispatch decisions
    read only scene.num_triangles and scene.stream.num_blocks."""
    stream = None
    if with_stream and num_tris >= STREAM_AUTO_MIN_TRIS:
        blocks = max(1, -(-num_tris // (S * G)))
        stream = types.SimpleNamespace(num_blocks=blocks)
    return types.SimpleNamespace(num_triangles=num_tris, stream=stream)


CFG = RenderConfig(width=256, height=256)

# (tris, n_rays, coherent) -> expected closest-hit dispatch mode.
# 2.2k  = garage (reference scene), flat stream path
# 8k    = the flat-path ceiling (128 clusters * 64)
# 96k   = bunny-class, windowed stream
# 262k  = sponza-class, windowed stream
# 1M    = terrain/dragon, windowed stream
CLOSEST_TABLE = [
    # pixel-coherent batches (primary rays, visibility segments)
    (2_200, 65_536, True, "stream"),          # garage 256^2: flat sweep
    (2_200, 2_073_600, True, "stream"),       # garage 1080p
    (2_200, 589_824, True, "stream"),         # fused 9x vis at 256^2
    (8_192, 262_144, True, "stream"),         # flat ceiling
    (96_000, 262_144, True, "stream"),        # bunny-class: windowed
    (262_144, 262_144, True, "stream"),       # sponza-class
    (1_000_000, 262_144, True, "stream"),     # terrain-1M
    # GI-scattered batches (BSDF continuations, coherent=False):
    # flat scenes go brute below 1M rays (r3t crossover), stream above
    (2_200, 65_536, False, "brute"),
    (2_200, 589_824, False, "brute"),
    (2_200, 2_073_600, False, "stream"),      # 1080p continuations >= 1M
    (8_192, 262_144, False, "brute"),
    # windowed scenes keep stream for scattered batches (presort pays)
    (96_000, 262_144, False, "stream"),
    (262_144, 2_073_600, False, "stream"),
    (1_000_000, 262_144, False, "stream"),
    # below the stream-auto floor everything is brute
    (1_254, 65_536, True, "brute"),           # garage.obj alone
    (968, 65_536, False, "brute"),            # monke.obj alone
]


@pytest.mark.parametrize("tris,n,coherent,expected", CLOSEST_TABLE)
def test_closest_dispatch_choice(tris, n, coherent, expected):
    scene = scene_stub(tris)
    assert restir.resolve_closest_mode(scene, CFG, n, coherent) == expected


ANY_TABLE = [
    (2_200, 589_824, "stream"),     # garage fused pass-3 visibility
    (2_200, 18_662_400, "stream"),  # 1080p fused pass-3 visibility
    (96_000, 262_144, "stream"),
    (1_000_000, 262_144, "stream"),
    (1_254, 65_536, "brute"),
]


@pytest.mark.parametrize("tris,n,expected", ANY_TABLE)
def test_any_dispatch_choice(tris, n, expected):
    scene = scene_stub(tris)
    assert restir.resolve_any_mode(scene, CFG, n) == expected


# (tris) -> (is_flat, wants_presort).  Presort ONLY on windowed scenes.
FLAT_TABLE = [
    (2_200, True, False),       # garage: flat, no presort
    (8_192, True, False),       # exactly at the 128-cluster ceiling
    (8_193, False, True),       # first windowed size
    (96_000, False, True),      # bunny
    (262_144, False, True),     # sponza
    (1_000_000, False, True),   # terrain/dragon
]


@pytest.mark.parametrize("tris,flat,presort", FLAT_TABLE)
def test_flat_and_presort_choice(tris, flat, presort):
    scene = scene_stub(tris)
    assert restir._is_flat(scene) == flat
    assert restir._wants_presort(scene) == presort
    # the flat ceiling itself: pinned so a G/S re-tune is a deliberate edit
    assert _FLAT_MAX_CLUSTERS == 128 and S * G == 2048


def test_flat_fine_path_stays_off():
    """The gf=16 fine flat path is a measured NEGATIVE result (round 4:
    garage-256 frame 254.9 ms fine vs 175.2 ms coarse, bit-identical
    images; it carried the whole BENCH_r03 flagship regression).  It
    must stay opt-in until a measurement says otherwise."""
    from royaltracer_dx_tpu.ops import stream_trace as st

    assert st._FLAT_FINE_G is None


# GI compaction: 'auto' engages ONLY on windowed-scale accels.  The 2.2k
# garage case is the round-3 misfire (3.7 -> 18.4 s/frame) — it must
# stay False forever unless deliberately re-measured.
COMPACTION_TABLE = [
    (2_200, "auto", False),
    (8_192, "auto", False),
    (96_000, "auto", True),
    (262_144, "auto", True),
    (1_000_000, "auto", True),
    (2_200, "on", True),
    (1_000_000, "off", False),
]


@pytest.mark.parametrize("tris,mode,expected", COMPACTION_TABLE)
def test_gi_compaction_choice(tris, mode, expected):
    scene = scene_stub(tris)
    cfg = RenderConfig(width=256, height=256, gi_compaction=mode)
    assert restir.wants_gi_compaction(scene, cfg) == expected


def test_gi_compaction_no_stream():
    # brute-only scenes (below the stream floor) never compact on auto
    scene = scene_stub(1_254)
    assert scene.stream is None
    assert not restir.wants_gi_compaction(scene, CFG)


# chunking: product batch sizes vs the 4M-ray chunk cap.  The 1080p
# fused pass-3 visibility batch (18.7M segments) MUST chunk (it was a
# 16.6 GB program unchunked); per-pixel batches at product resolutions
# must NOT (the in-pass chunked trace measured 2x the unit rate).
CHUNK_TABLE = [
    (65_536, False),        # 256^2 pixels
    (589_824, False),       # 256^2 fused 9x visibility
    (2_073_600, False),     # 1080p pixels
    (4_147_200, False),     # 1080p pass-2 fused 2x visibility
    (18_662_400, True),     # 1080p fused 9x pass-3 visibility
]


@pytest.mark.parametrize("n,expected", CHUNK_TABLE)
def test_chunking_choice(n, expected):
    assert restir.wants_chunking(n) == expected


def test_renderer_uses_resolved_modes():
    """End-to-end: a real flattened garage-class scene resolves the same
    decisions the table pins (the stub mirrors reality)."""
    from royaltracer_dx_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    arrays = scene.flatten(scene.build_materials())
    # cornell box is tiny: brute everywhere, no compaction
    assert restir.resolve_closest_mode(arrays, CFG, 65_536, True) == "brute"
    assert restir.resolve_any_mode(arrays, CFG, 65_536) == "brute"
    assert not restir.wants_gi_compaction(arrays, CFG)
