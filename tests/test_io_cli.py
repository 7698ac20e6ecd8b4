"""Checkpoint/resume, AOVs, image IO."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from royaltracer_dx_tpu.camera import Camera
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.io.checkpoint import load_renderer_state, save_renderer_state
from royaltracer_dx_tpu.render.aov import render_aovs
from royaltracer_dx_tpu.render.renderer import Renderer
from royaltracer_dx_tpu.scene.procedural import cornell_box
from royaltracer_dx_tpu.utils.image import rmse, write_png

CAM = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))
CFG = RenderConfig(width=32, height=32, max_bounces=2)


def test_checkpoint_roundtrip_megakernel():
    r1 = Renderer(cornell_box(), CAM, CFG)
    r1.render()
    r1.render()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_renderer_state(path, r1)

        r2 = Renderer(cornell_box(), CAM, CFG)
        load_renderer_state(path, r2)
        assert r2.frame == 2
        np.testing.assert_array_equal(np.asarray(r2.fb.accum), np.asarray(r1.fb.accum))

        # continuing both produces identical frames
        r1.render()
        r2.render()
        np.testing.assert_array_equal(r1.radiance(), r2.radiance())


def test_checkpoint_format_mismatch_raises():
    """A checkpoint must not silently restore into the wrong renderer
    type or resolution (ADVICE r2)."""
    import pytest

    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer

    r1 = Renderer(cornell_box(), CAM, CFG)
    r1.render()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_renderer_state(path, r1)
        rr = RestirRenderer(cornell_box(), CAM, CFG)
        with pytest.raises(ValueError, match="format"):
            load_renderer_state(path, rr)
        r_small = Renderer(cornell_box(), CAM,
                           RenderConfig(width=16, height=16, max_bounces=2))
        with pytest.raises(ValueError, match="resolution"):
            load_renderer_state(path, r_small)


def test_aovs():
    scene = cornell_box().flatten(cornell_box().build_materials(with_lut=False))
    cam = {k: jnp.asarray(v) for k, v in CAM.matrices(1.0).items()}
    aovs = render_aovs(scene, cam, CFG)
    assert set(aovs) >= {"albedo", "normal", "depth", "material_id"}
    depth = np.asarray(aovs["depth"])
    assert (depth >= 0).all() and depth.max() < 10
    mid = np.asarray(aovs["material_id"])
    assert mid.max() >= 1  # multiple materials visible
    normal = np.asarray(aovs["normal"])
    assert (normal >= 0).all() and (normal <= 1).all()


def test_png_roundtrip_and_rmse():
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.png")
        write_png(path, img)
        assert os.path.getsize(path) > 100
    assert rmse(img, img) == 0.0
    assert rmse(img, img * 0.5) > 0.1


def test_cli_smoke(capsys):
    from royaltracer_dx_tpu import cli

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "o.png")
        cli.main([
            "--scene", "cornell", "--renderer", "megakernel",
            "--width", "24", "--height", "24", "--frames", "2",
            "--bounces", "2", "--out", out, "--cpu",
            "--checkpoint", os.path.join(d, "ck.npz"),
        ])
        assert os.path.exists(out)
        assert os.path.exists(os.path.join(d, "ck.npz"))
