"""Round-5 part F: XLA-TPU gather formulation shoot-out.

r5e showed the 1080p frame's 2.4 s of non-sweep cost is dominated by
row gathers: the hit-attributes epilogue (3 narrow gathers from a
2221-row tri table at 2.07M lanes) costs ~50 ns/r ≈ 100 ms/batch, and
pass 3's 947 ms non-vis pool is ~56M packed-record row-gathers.  This
script measures candidate formulations at product scale so the fix is
chosen by data:

  case A — small table (tri/material epilogue: T=2221, D=20):
    a_g3       three row gathers 8/8/4 (the shipping formulation)
    a_g1x24    one 24-wide row gather
    a_g3_bf16  the 3-gather shape in bf16 rows
    a_onehot   one-hot @ MXU, bf16 2-split (exact for ints < 2^16,
               <= 4e-6 rel on floats), lax.map chunked
    a_onehotF  same, full-batch (no chunking)

  case B — N-sized table (pass-3 taps / p2 reprojection: T=N=2.07M):
    b_row8     [N, 8] f32 row gather (the packed-record shape)
    b_row8h    [N, 8] f16
    b_row24    [N, 24] f32 one wide gather (vs 3x row8)
    b_row4     [N, 4] f32
    b_flat1d   flat [N*8] 1-D gather with [N, 8] computed indices
    b_plane    8 separate 1-D gathers from [N] planes
    b_row128   [N, 128] f32 (full-lane row: per-row DMA path probe)
    ... each with LOCAL indices (|di| <= 30 rows, the real tap
    distribution) and fully RANDOM indices.

Run alone (single tunneled chip).  argv: W H (default 1920 1080).
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401

PARTS = set(os.environ.get("R5F_PARTS", "a,b").split(","))
W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
    else (1920, 1080)
N = W * H
T_SMALL = 2221
D = 20


def say(*a):
    print(*a, flush=True)


def slope(fn, args=(), reps=(1, 3)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(x, a):
            return jax.lax.fori_loop(0, k, lambda i, x: fn(x, *a), x)
        r = loop(jnp.float32(0.0), args)
        np.asarray(r)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(jnp.float32(0.0), args)
            np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    return (times[k2] - times[k1]) / (k2 - k1)


T0 = time.perf_counter()


def row(lbl, fn, *args):
    try:
        dt = slope(fn, args)
        say(f"  {lbl:24s} {dt*1e3:8.2f} ms ({dt/N*1e9:6.2f} ns/r)"
            f"  [t={time.perf_counter()-T0:.0f}s]")
        return dt
    except Exception as e:
        say(f"  {lbl:24s} ERR {e!r:.110}")


def consume(*arrs):
    tot = jnp.float32(0.0)
    for a in arrs:
        tot = tot + jnp.sum(a.astype(jnp.float32)) * jnp.float32(1e-9)
    return tot


def bf16_split2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def onehot_gather(tb_hi, tb_lo, idx, t_count):
    """Exact-ish gather from a small table via the MXU: one-hot
    (bf16, exact 0/1) times a 2-split bf16 table.  Row values are
    hi[j] + lo[j] in a f32 accumulator: exact for int-valued entries
    < 2^16, <= ~4e-6 relative for floats."""
    oh = (idx[:, None] == jnp.arange(t_count, dtype=idx.dtype)[None, :]
          ).astype(jnp.bfloat16)
    acc = jnp.dot(oh, tb_hi, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(oh, tb_lo, preferred_element_type=jnp.float32)
    return acc


def main():
    say("device:", jax.devices()[0], f"N={N}")
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # index sets (device arrays, int32)
    idx_tri = jax.random.randint(k1, (N,), 0, T_SMALL, dtype=jnp.int32)
    idx_tri_coh = jnp.sort(idx_tri)          # primary-ray-like coherence
    pix = jnp.arange(N, dtype=jnp.int32)
    off = jax.random.randint(k2, (N,), -30, 31) * W \
        + jax.random.randint(k3, (N,), -30, 31)
    idx_loc = jnp.clip(pix + off, 0, N - 1)   # pass-3 tap distribution
    idx_rand = jax.random.randint(k4, (N,), 0, N, dtype=jnp.int32)

    # ---------------- case A: small table
    if "a" in PARTS:
        tA = jax.random.normal(k1, (T_SMALL, 24), dtype=jnp.float32)
        tA8a, tA8b, tA4 = tA[:, :8], tA[:, 8:16], tA[:, 16:20]
        tA_hi, tA_lo = bf16_split2(tA[:, :D])

        def a_g3(x, idx):
            t8a = tA8a + x * 1e-30
            ra, rb, rc = t8a[idx], tA8b[idx], tA4[idx]
            return x + consume(ra, rb, rc)

        def a_g1x24(x, idx):
            t = tA + x * 1e-30
            return x + consume(t[idx])

        def a_g3_bf16(x, idx):
            t8a = tA8a.astype(jnp.bfloat16) + jnp.bfloat16(x * 1e-30)
            ra = t8a[idx]
            rb = tA8b.astype(jnp.bfloat16)[idx]
            rc = tA4.astype(jnp.bfloat16)[idx]
            return x + consume(ra, rb, rc)

        def a_onehot(x, idx, chunk=min(129600, N)):
            hi = tA_hi + jnp.bfloat16(x * 1e-30)
            out = jax.lax.map(
                functools.partial(onehot_gather, hi, tA_lo,
                                  t_count=T_SMALL),
                idx.reshape(-1, chunk))
            return x + consume(out)

        def a_onehotF(x, idx):
            hi = tA_hi + jnp.bfloat16(x * 1e-30)
            return x + consume(onehot_gather(hi, tA_lo, idx, T_SMALL))

        for lbl, idx in (("rand", idx_tri), ("coh", idx_tri_coh)):
            row(f"a_g3 {lbl}", a_g3, idx)
            row(f"a_g1x24 {lbl}", a_g1x24, idx)
            row(f"a_g3_bf16 {lbl}", a_g3_bf16, idx)
            row(f"a_onehot {lbl}", a_onehot, idx)
            row(f"a_onehotF {lbl}", a_onehotF, idx)

    # ---------------- case B: N-sized table
    if "b" in PARTS:
        tB = jax.random.normal(k2, (N, 24), dtype=jnp.float32)
        tB8 = tB[:, :8]
        tB8h = tB8.astype(jnp.float16)
        tB4 = tB[:, :4]
        flatB = tB8.reshape(-1)
        planesB = [tB8[:, c] for c in range(8)]

        def b_row8(x, idx):
            t = tB8 + x * 1e-30
            return x + consume(t[idx])

        def b_row8h(x, idx):
            t = tB8h + jnp.float16(x * 1e-30)
            return x + consume(t[idx])

        def b_row24(x, idx):
            t = tB + x * 1e-30
            return x + consume(t[idx])

        def b_row4(x, idx):
            t = tB4 + x * 1e-30
            return x + consume(t[idx])

        def b_flat1d(x, idx):
            t = flatB + x * 1e-30
            fi = idx[:, None] * 8 + jnp.arange(8, dtype=idx.dtype)
            return x + consume(t[fi.reshape(-1)])

        def b_plane(x, idx):
            out = [(p + x * 1e-30)[idx] for p in planesB]
            return x + consume(*out)

        for lbl, idx in (("loc", idx_loc), ("rand", idx_rand)):
            row(f"b_row8 {lbl}", b_row8, idx)
            row(f"b_row8h {lbl}", b_row8h, idx)
            row(f"b_row24 {lbl}", b_row24, idx)
            row(f"b_row4 {lbl}", b_row4, idx)
            row(f"b_flat1d {lbl}", b_flat1d, idx)
            row(f"b_plane {lbl}", b_plane, idx)

        del tB, tB8h, tB4, flatB, planesB
        tB128 = jax.random.normal(k3, (N, 128), dtype=jnp.float32)

        def b_row128(x, idx):
            t = tB128 + x * 1e-30
            return x + consume(t[idx])

        row("b_row128 loc", b_row128, idx_loc)

    say(f"done [t={time.perf_counter()-T0:.0f}s]")


if __name__ == "__main__":
    main()
