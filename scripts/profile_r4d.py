"""Round-4 part D: is the terrain sweep fetch-bound, and can gathers run
at bandwidth?

Hypothesis (VERDICT r3 #3 decomposition): at terrain-1M the sweep
executes ~323M MT tests = ~79k fetched cluster rows (64 rays x 64 tris
per row).  At the measured ~136 ns/row XLA gather cost that is ~11 ms of
the 16.4 ms trace — fetch-bound, not test-bound.  If ONE bulk gather of
all worklist rows runs near HBM bandwidth (181 MB -> ~1 ms), a
pre-gathered sweep buys most of the next 2x.

Measures:
  1. bulk row-gather rate vs batch size (rows of [C, 576] f32),
     sorted vs unsorted indices;
  2. the full closest trace baseline;
  3. a fetch-ablated sweep (rows replaced by a resident constant row —
     same loop structure, no gathers) to attribute fetch cost directly.

Run alone (single tunneled chip).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.camera import Camera, generate_rays
from royaltracer_dx_tpu.ops import stream_trace as st
from royaltracer_dx_tpu.scene.procedural import heightfield


def say(*a):
    print(*a, flush=True)


def slope(step, init, reps=(2, 6)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, k, lambda i, c: step(c), c)
        r = loop(init)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(init)
            np.asarray(jax.tree.leaves(r)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    return (times[k2] - times[k1]) / (k2 - k1)


def main():
    say("device:", jax.devices()[0])
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    t0 = time.perf_counter()
    accel = st.build_stream_accel(tris)
    np.asarray(accel.top_lo[0, 0])
    say(f"build {time.perf_counter()-t0:.0f}s; "
        f"blocks {accel.num_blocks} clusters {accel.num_blocks*st.S}")
    cl_flat = accel.cl_flat                    # [C, 576]
    c_all = cl_flat.shape[0]

    # ---- 1. bulk gather rate vs size, sorted vs random indices
    for nrows in (4096, 16384, 65536, 131072):
        for mode in ("sorted", "random"):
            rng = np.random.default_rng(0)
            ind = rng.integers(0, c_all, nrows).astype(np.int32)
            if mode == "sorted":
                ind = np.sort(ind)
            ind_d = jnp.asarray(ind)

            def g_step(c, ind_d=ind_d):
                rows = cl_flat[ind_d + (c[0, 0] * 0).astype(jnp.int32)]
                return rows * 1.0000001
            dt = slope(g_step, jnp.zeros((1, 1)) + cl_flat[:1] * 0.0)
            say(f"bulk gather {nrows:7d} rows {mode:7s}: "
                f"{dt*1e3:7.2f} ms  {dt/nrows*1e9:6.1f} ns/row  "
                f"{nrows*2304/dt/1e9:6.1f} GB/s")

    # ---- 1b. same via one-hot matmul f32-highest (the small-table path)
    nrows = 16384
    ind_d = jnp.asarray(np.sort(
        np.random.default_rng(0).integers(0, c_all, nrows).astype(np.int32)))

    def oh_step(c):
        cid = ind_d + (c[0, 0] * 0).astype(jnp.int32)
        oh = (cid[:, None] == jnp.arange(c_all, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
        rows = jnp.dot(oh, cl_flat, precision=jax.lax.Precision.HIGHEST)
        return rows * 1.0000001
    dt = slope(oh_step, jnp.zeros((1, 1)))
    say(f"one-hot matmul {nrows} rows: {dt*1e3:.2f} ms  "
        f"{dt/nrows*1e9:.1f} ns/row")

    # ---- 2. full closest baseline
    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(vv) for k, vv in cam.matrices(1.0).items()}
    o, d = generate_rays(ca, W, H)
    order, _ = st.swizzle_order(W, H, tile_w=8, tile_h=8)
    o = o[jnp.asarray(order)]
    d = d[jnp.asarray(order)]
    n = o.shape[0]

    def base_step(c):
        h = st.closest_hit_stream_xla(c, d, accel)
        return c + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
    dt_base = slope(base_step, o)
    say(f"closest baseline: {dt_base*1e3:.2f} ms  {n/dt_base/1e6:.2f} Mrays/s")

    # ---- 3. fetch-ablated sweep: tiny resident table instead of the
    # real gather.  MT results become garbage, which is fine for timing:
    # the loop bound comes from ccnt (unchanged), and the fake table is
    # sized > _ONEHOT_MAX_CLUSTERS so the fetch stays a GATHER (not the
    # small-table one-hot path) — only its working set shrinks to ~1.4 MB
    # (VMEM-resident), isolating the HBM-gather cost.
    const_row = cl_flat[0]

    # build the real worklists once (window 0 machinery)
    oc = tuple(o[:, c] for c in range(3))
    dc = tuple(d[:, c] for c in range(3))
    t_min = jnp.zeros((n,)) + 1e-4
    t_max = jnp.zeros((n,)) + 1e4
    tiles = n // st.TILE
    o_t = [c.reshape(tiles, st.TILE)[..., None] for c in oc]
    d_t = [c.reshape(tiles, st.TILE)[..., None] for c in dc]
    tmin_t = t_min.reshape(tiles, st.TILE)[..., None]
    tmax_t = t_max.reshape(tiles, st.TILE)[..., None]
    rays = (o_t, d_t, tmin_t, tmax_t)

    @jax.jit
    def worklists():
        sbid, skey, bcnt, tb = st._block_sort(oc, dc, t_min, t_max, accel,
                                              rays)
        return st._cluster_window(sbid, skey, tb, accel, 16, 0, rays)
    ccid, centry, ccnt = worklists()
    ccid = jax.block_until_ready(ccid)
    say(f"worklists: mean {float(jnp.mean(ccnt)):.1f} "
        f"p99 {float(jnp.percentile(ccnt, 99)):.0f} clusters/tile; "
        f"total rows ~ {float(jnp.sum(ccnt)):.0f}")

    zero = jnp.zeros((tiles, st.TILE), jnp.float32)
    best0 = (zero + st.INF, zero.astype(jnp.int32) - 1, zero, zero)

    def sweep_step(c, table):
        rays_c = ([cc + c * 0.0 for cc in o_t], d_t, tmin_t, tmax_t)
        b = st._sweep_closest(best0, ccid, centry, ccnt, rays_c, table)
        return c + b[0][:, :1] * 1e-12

    dt_real = slope(lambda c: sweep_step(c, cl_flat), o_t[0] * 0.0)
    say(f"sweep (real fetch):  {dt_real*1e3:.2f} ms")

    nfake = st._ONEHOT_MAX_CLUSTERS + 88       # stay on the gather path
    fake = jnp.broadcast_to(const_row[None, :], (nfake, 576)) * 1.0
    ccid2 = jax.jit(lambda: ccid % nfake)()

    def sweep_fake(c):
        rays_c = ([cc + c * 0.0 for cc in o_t], d_t, tmin_t, tmax_t)
        b = st._sweep_closest(best0, ccid2, centry, ccnt, rays_c, fake)
        return c + b[0][:, :1] * 1e-12
    dt_fake = slope(sweep_fake, o_t[0] * 0.0)
    say(f"sweep (const fetch): {dt_fake*1e3:.2f} ms   "
        f"=> fetch cost ~ {(dt_real-dt_fake)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
