"""Round-4 part T: gather cost model, NON-HOISTABLE this time.

Every earlier gather row (r4j "2.4 ms", r4p "0.01 ns/row") let the
gather's index input stay loop-invariant, so XLA hoisted the whole
gather out of the fori timing loop.  Here the indices pass through
`jnp.where(x > 1e30, 0, idx)` — the carry-dependent predicate keeps
the gather inside the loop while never changing its value.

Measures: [9, 2M]-row gathers from [2M, w] tables at w = 8f32 / 8f16 /
4f32; uniform-random vs local (+-30 image rows) indices; and the real
pass-3 DI tap block (gather + accept + first-k pick) with loop-variant
indices, [T, N] vs per-try list layout.

Run alone (single tunneled chip).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401


def say(*a):
    print(*a, flush=True)


def slope(fn, args=(), reps=(1, 3)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(x, a):
            return jax.lax.fori_loop(0, k, lambda i, x: fn(x, *a), x)
        r = loop(jnp.float32(0.0), args)
        np.asarray(r.ravel()[0] if hasattr(r, "ravel") else r)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(jnp.float32(0.0), args)
            np.asarray(r.ravel()[0] if hasattr(r, "ravel") else r)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    return (times[k2] - times[k1]) / (k2 - k1)


def vary(x, idx):
    """Loop-variant identity on indices: XLA cannot hoist through the
    carry-dependent predicate, and the branch never fires."""
    return jnp.where(x > 1e30, jnp.int32(0), idx)


def main():
    say("device:", jax.devices()[0])
    n = 2073600
    t_taps = 9
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (t_taps, n), 0, n, dtype=jnp.int32)
    rows = t_taps * n

    for w, dt_ in ((8, jnp.float32), (8, jnp.float16), (4, jnp.float32)):
        tab = (jnp.arange(n, dtype=jnp.float32)[:, None]
               * jnp.ones((1, w))).astype(dt_)

        def g(x, tab, idx):
            r0 = tab[vary(x, idx)].astype(jnp.float32)
            return x + jnp.sum(r0) * 1e-12
        dt = slope(g, (tab, idx))
        say(f"  gather [9xN] from [N,{w}] {dt_.__name__:8s}: "
            f"{dt*1e3:8.1f} ms ({dt/rows*1e9:5.2f} ns/row)")

    # local indices (+-30 image rows at 1920 wide, like the disk taps)
    wpx = 1920
    off = jax.random.randint(key, (t_taps, n), -30 * wpx, 30 * wpx,
                             dtype=jnp.int32)
    idx_loc = jnp.clip(jnp.arange(n, dtype=jnp.int32)[None, :] + off,
                       0, n - 1)
    tab = (jnp.arange(n, dtype=jnp.float32)[:, None]
           * jnp.ones((1, 8))).astype(jnp.float32)

    def g2(x, tab, idx_loc):
        r0 = tab[vary(x, idx_loc)]
        return x + jnp.sum(r0) * 1e-12
    dt = slope(g2, (tab, idx_loc))
    say(f"  gather local +-30 rows [N,8] f32 : {dt*1e3:8.1f} ms "
        f"({dt/rows*1e9:5.2f} ns/row)")

    # single-candidate payload-style gather: [N] indices
    idx1 = idx[0]

    def g3(x, tab, idx1):
        r0 = tab[vary(x, idx1)]
        return x + jnp.sum(r0) * 1e-12
    dt = slope(g3, (tab, idx1))
    say(f"  gather [N] from [N,8] f32        : {dt*1e3:8.1f} ms "
        f"({dt/n*1e9:5.2f} ns/row)")

    # [T*N] flat vs [T, N] shaped gather output (sublane padding probe)
    def g4(x, tab, idx):
        r0 = tab[vary(x, idx).reshape(-1)]          # [T*N, 8]
        return x + jnp.sum(r0) * 1e-12
    dt = slope(g4, (tab, idx))
    say(f"  gather flat [T*N] from [N,8] f32 : {dt*1e3:8.1f} ms "
        f"({dt/rows*1e9:5.2f} ns/row)")


if __name__ == "__main__":
    main()
