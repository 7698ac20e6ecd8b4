"""Checkpoint/resume of progressive render state.

The reference has no checkpointing (SURVEY.md section 5); its closest analog
is the persistent accumulation texture + last-frame reservoir buffers.  Here
that state is a pytree, so save/resume is one npz round-trip: framebuffer,
reservoir ping-pong buffers, frame counter, camera history.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _flatten(prefix: str, tree) -> dict:
    out = {}
    if hasattr(tree, "__dataclass_fields__"):
        for f in tree.__dataclass_fields__:
            out.update(_flatten(f"{prefix}{f}.", getattr(tree, f)))
    elif isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(f"{prefix}{k}.", v))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _format_of(renderer) -> str:
    if hasattr(renderer, "packed_di"):
        return "sharded_restir"
    if hasattr(renderer, "last_di"):
        return "restir"
    return "megakernel"


def save_renderer_state(path: str, renderer) -> None:
    """Save a Renderer/RestirRenderer's progressive state."""
    state = {
        "format": np.asarray(_format_of(renderer)),
        "frame": np.asarray(renderer.frame),
        "prev_view": np.asarray(renderer._prev_view),
    }
    state.update(_flatten("fb.", renderer.fb))
    if hasattr(renderer, "packed_di"):  # ShardedRestirRenderer
        for i, (sdi, sgi) in enumerate(zip(renderer.packed_di,
                                           renderer.packed_gi)):
            state[f"packed_di.{i}"] = np.asarray(sdi)
            state[f"packed_gi.{i}"] = np.asarray(sgi)
        state["l1"] = np.asarray(renderer.l1)
        state["prev_proj"] = np.asarray(renderer._prev_proj)
    if hasattr(renderer, "last_di"):
        state.update(_flatten("last_di.", renderer.last_di))
        state.update(_flatten("last_gi.", renderer.last_gi))
        state.update(_flatten("last_sdata.", renderer.last_sdata))
        state["l1"] = np.asarray(renderer.l1)
        state["prev_proj"] = np.asarray(renderer._prev_proj)
    np.savez_compressed(path, **state)


def load_renderer_state(path: str, renderer) -> None:
    """Restore state saved by save_renderer_state into a compatible
    renderer (same config/resolution).

    Raises ValueError on a renderer/checkpoint format mismatch instead of
    silently restoring a partial state (ADVICE r2: a sharded renderer fed
    a single-device npz used to keep stale zero reservoirs)."""
    data = np.load(path)
    want = _format_of(renderer)
    have = str(data["format"]) if "format" in data else (
        "sharded_restir" if ("packed_di" in data or "packed_di.0" in data)
        else "restir" if "last_di.x2" in data else "megakernel")
    if want != have:
        raise ValueError(
            f"checkpoint format {have!r} does not match renderer "
            f"{type(renderer).__name__} (expects {want!r})")
    fb_n = int(data["fb.accum"].shape[0])
    if fb_n != int(renderer.fb.accum.shape[0]):
        raise ValueError(
            f"checkpoint resolution ({fb_n} pixels) does not match the "
            f"renderer ({int(renderer.fb.accum.shape[0])})")
    renderer.frame = int(data["frame"])
    renderer._prev_view = jnp.asarray(data["prev_view"])
    renderer.fb = renderer.fb.replace(
        accum=jnp.asarray(data["fb.accum"]), count=jnp.asarray(data["fb.count"])
    )
    if hasattr(renderer, "packed_di") and (
            "packed_di" in data or "packed_di.0" in data):
        # ShardedRestirRenderer: re-shard the restored state onto the mesh
        from royaltracer_dx_tpu.parallel.shard import replicate, shard_pixels
        from royaltracer_dx_tpu.render.restir_renderer import (
            _DI_KEYS, _GI_KEYS, _shards_from_legacy,
        )

        if "packed_di.0" in data:
            pdi = tuple(jnp.asarray(data[f"packed_di.{i}"])
                        for i in range(3))
            pgi = tuple(jnp.asarray(data[f"packed_gi.{i}"])
                        for i in range(3))
        else:   # round-2/3 legacy monolithic [N, 26] tables
            pdi = _shards_from_legacy(jnp.asarray(data["packed_di"]),
                                      _DI_KEYS)
            pgi = _shards_from_legacy(jnp.asarray(data["packed_gi"]),
                                      _GI_KEYS)
        renderer.packed_di, renderer.packed_gi, renderer.l1 = shard_pixels(
            renderer.mesh, pdi, pgi, jnp.asarray(data["l1"]))
        renderer.fb = renderer.fb.replace(
            accum=shard_pixels(renderer.mesh, renderer.fb.accum)[0],
            count=shard_pixels(renderer.mesh, renderer.fb.count)[0])
        renderer._prev_proj = jnp.asarray(data["prev_proj"])
    if hasattr(renderer, "last_di") and "last_di.x2" in data:
        renderer.last_di = renderer.last_di.replace(
            **{f: jnp.asarray(data[f"last_di.{f}"]) for f in
               renderer.last_di.__dataclass_fields__}
        )
        renderer.last_gi = renderer.last_gi.replace(
            **{f: jnp.asarray(data[f"last_gi.{f}"]) for f in
               renderer.last_gi.__dataclass_fields__}
        )
        renderer.last_sdata = renderer.last_sdata.replace(
            **{f: jnp.asarray(data[f"last_sdata.{f}"]) for f in
               renderer.last_sdata.__dataclass_fields__}
        )
        renderer.l1 = jnp.asarray(data["l1"])
        renderer._prev_proj = jnp.asarray(data["prev_proj"])
