"""Slope-timed microbenchmarks for the round-3 traversal restructure.

Methodology (BASELINE.md environment notes): run the op k and 2k times
inside ONE jit with a data dependence between iterations, sync via a tiny
host transfer, slope = (T(2k)-T(k))/k.  Raw per-dispatch timings on this
host are unusable (~5 ms sync; block_until_ready may return early).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

TILES = 4096
B = 489
WS = 1024


def slope(make_step, init, reps=(8, 16), warm=2):
    """make_step: carry -> carry (jit-able); returns seconds per step."""
    times = {}
    for k in reps:
        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, k, lambda i, c: make_step(c), c)
        r = loop(init)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])   # hard sync
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
    key = jax.random.PRNGKey(0)
    print("device:", jax.devices()[0])

    # --- lane sort [TILES, B]
    k1 = jax.random.uniform(key, (TILES, B))

    def lane_step(c):
        s = jax.lax.sort((c, c), dimension=1, num_keys=1)[0]
        return s + 1e-7
    dt = slope(lane_step, k1)
    print(f"lane sort [{TILES},{B}] : {dt*1e3:.2f} ms/step")

    k2 = jax.random.uniform(key, (TILES, WS))
    dt = slope(lane_step, k2)
    print(f"lane sort [{TILES},{WS}]: {dt*1e3:.2f} ms/step")

    # --- flat packed 1D sort, same element counts
    kf1 = jax.random.uniform(key, (TILES * B,))

    def flat_step(c):
        s = jax.lax.sort((c, c), dimension=0, num_keys=1)[0]
        return s + 1e-7
    dt = slope(flat_step, kf1)
    print(f"flat sort [{TILES*B}]   : {dt*1e3:.2f} ms/step")

    kf2 = jax.random.uniform(key, (TILES * WS,))
    dt = slope(flat_step, kf2)
    print(f"flat sort [{TILES*WS}]  : {dt*1e3:.2f} ms/step")

    # --- per-ray cluster cull [TILES, 64, 256] -> [TILES, 256] any
    o = jax.random.uniform(key, (TILES, 64, 3))
    d = jax.random.uniform(key, (TILES, 64, 3)) + 0.1
    lo = jax.random.uniform(key, (TILES, 256, 3))
    hi = lo + 0.1

    def cull_step(c):
        oo = o + c * 1e-9
        inv = 1.0 / d
        tn = jnp.zeros((TILES, 64, 256))
        tf = jnp.full((TILES, 64, 256), 1e9)
        for ax in range(3):
            t0c = (lo[:, None, :, ax] - oo[:, :, None, ax]) * inv[:, :, None, ax]
            t1c = (hi[:, None, :, ax] - oo[:, :, None, ax]) * inv[:, :, None, ax]
            tn = jnp.maximum(tn, jnp.minimum(t0c, t1c))
            tf = jnp.minimum(tf, jnp.maximum(t0c, t1c))
        return jnp.any(tn <= tf, axis=1).astype(jnp.float32).sum() * 1e-9 + c
    dt = slope(cull_step, jnp.float32(0.0))
    print(f"per-ray cull [{TILES},64,256]: {dt*1e3:.2f} ms/step")

    # --- MT round shapes
    for p, r, g in [(4096, 64, 64), (2048, 64, 128), (8192, 32, 128),
                    (1024, 64, 128)]:
        rows = jax.random.uniform(key, (p, 9 * g))
        oo = [jax.random.uniform(key, (p, r, 1)) for _ in range(3)]
        dd = [jax.random.uniform(key, (p, r, 1)) + 0.1 for _ in range(3)]

        def mt_step(c, g=g, p=p, r=r, rows=rows, oo=oo, dd=dd):
            pl = [rows[:, k * g:(k + 1) * g][:, None, :] + c * 1e-9
                  for k in range(9)]
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = pl
            ox, oy, oz = oo
            dx, dy, dz = dd
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (t > 0))
            t = jnp.where(ok, t, 1e9)
            return jnp.min(t) * 1e-9 + c
        dt = slope(mt_step, jnp.float32(0.0))
        tests = p * r * g
        print(f"MT [{p},{r},{g}]: {dt*1e3:.2f} ms/step  "
              f"{tests/dt/1e9:.1f} Gtests/s")

    # --- gather of cluster rows [P, 9G] from [C, 9G]
    cl = jax.random.uniform(key, (32 * 489, 576))
    idx = jax.random.randint(key, (4096,), 0, 32 * 489)

    def gather_step(c):
        rows = cl[(idx + c.astype(jnp.int32)) % (32 * 489)]
        return c + rows.sum() * 1e-12
    dt = slope(gather_step, jnp.float32(0.0))
    print(f"gather 4096x[576f]: {dt*1e3:.2f} ms/step "
          f"({dt/4096*1e9:.0f} ns/row)")


if __name__ == "__main__":
    main()
