"""Round-4 part Y: diagnose the r4v occlusion ORDER-DEPENDENCE.

r4v measured `match=False` between ray orders on the terrain in-field
shadow batch.  With exact per-ray culls, a ray's worklist is a superset
of its own passing clusters whatever its tile-mates are, so order can
change results ONLY if some cull is non-conservative (a tile-mate
pulling the dropped cluster back in masks the bug in one order and not
another).

This script:
  1. traces the r4v shadow batch in base (coherence), random and sigc
     orders; reports mismatch counts;
  2. brute-forces ground truth for every mismatched ray (chunked over
     the 1M triangles) and says which order is WRONG;
  3. for wrong-side rays, replays the per-ray cull chain in numpy
     against the hit triangle's cluster and block: top box, top slab
     crossing, cluster box (bf16 rows), cluster slab crossing — naming
     the test that wrongly rejects;
  4. re-runs the order comparison with every thick-plane slab disabled
     (h = +BIG in blk_planes, the bf16 tail rows AND top_planes) to pin
     whether the slab introduced it.

Run alone (single tunneled chip).
"""

import sys

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


def brute_rows(o, d, t_min, t_max, tris, chunk=1 << 16):
    """Ground-truth any-hit + hit-tri id for a SMALL ray set [k, 3]."""
    k = o.shape[0]
    occ = np.zeros(k, bool)
    tri_id = np.full(k, -1, np.int64)
    best_t = np.full(k, np.inf, np.float32)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    tn = jnp.asarray(t_min)
    tf = jnp.asarray(t_max)

    @jax.jit
    def hit_chunk(tv):
        v0 = tv[:, 0]
        e1 = tv[:, 1] - tv[:, 0]
        e2 = tv[:, 2] - tv[:, 0]
        # [k, c] MT
        pv = jnp.cross(dj[:, None, :], e2[None, :, :])
        det = jnp.sum(pv * e1[None, :, :], axis=-1)
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = oj[:, None, :] - v0[None, :, :]
        u = jnp.sum(tvec * pv, axis=-1) * inv
        qv = jnp.cross(tvec, e1[None, :, :])
        v = jnp.sum(dj[:, None, :] * qv, axis=-1) * inv
        t = jnp.sum(e2[None, :, :] * qv, axis=-1) * inv
        ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t > tn[:, None]) & (t <= tf[:, None]))
        tbest = jnp.min(jnp.where(ok, t, np.inf), axis=1)
        jbest = jnp.argmin(jnp.where(ok, t, np.inf), axis=1)
        return jnp.any(ok, axis=1), tbest, jbest

    tris_np = np.asarray(tris)
    for c0 in range(0, tris_np.shape[0], chunk):
        tv = jnp.asarray(tris_np[c0:c0 + chunk])
        ok, tb, jb = (np.asarray(x) for x in hit_chunk(tv))
        occ |= ok
        upd = tb < best_t
        best_t[upd] = tb[upd]
        tri_id[upd] = jb[upd] + c0
    return occ, tri_id, best_t


def replay_culls(o, d, t_min, t_max, accel, tri_slot):
    """Numpy replay of the per-ray cull chain for ONE ray against the
    cluster/block that owns flat slot ``tri_slot`` (index into perm)."""
    S, G = st.S, st.G
    slot_cl = tri_slot // G
    bi, si = slot_cl // S, slot_cl % S
    out = {"block": int(bi), "cluster": int(si)}

    def slab(lo, hi):
        tn, tf = t_min, t_max
        for c in range(3):
            inv = 1.0 / d[c] if d[c] != 0 else np.inf
            t0, t1 = (lo[c] - o[c]) * inv, (hi[c] - o[c]) * inv
            tn = max(tn, min(t0, t1))
            tf = min(tf, max(t0, t1))
        return tn, tf

    def crossing(n, c, h, tn, tf):
        t0, t1, t2 = n[0] * o[0], n[1] * o[1], n[2] * o[2]
        a = t0 + t1 + t2 - c
        amag = abs(t0) + abs(t1) + abs(t2) + abs(c)
        bb = n[0] * d[0] + n[1] * d[1] + n[2] * d[2]
        d0, d1 = a + tn * bb, a + tf * bb
        thr = h + 4e-6 * (amag + max(abs(tn), abs(tf)) * abs(bb)) + 1e-25
        return (min(d0, d1) <= thr) and (max(d0, d1) >= -thr), (d0, d1, thr)

    # top level
    tl = np.asarray(accel.top_lo[bi], np.float64)
    th = np.asarray(accel.top_hi[bi], np.float64)
    tn, tf = slab(tl, th)
    out["top_box"] = bool(tn <= tf)
    tp = np.asarray(accel.top_planes[bi], np.float64)
    ok, dbg = crossing(tp[:3], tp[3], tp[4], max(tn, 0.0) if False else tn, tf)
    out["top_slab"] = bool(ok)
    out["top_slab_dbg"] = tuple(round(float(x), 9) for x in dbg)

    # cluster level — the bf16 rows the windowed path actually fetches
    bf = np.asarray(accel.blk_boxes_bf16[bi].astype(jnp.float32),
                    np.float64).reshape(11, S)
    lo = bf[0:3, si]
    hi = bf[3:6, si]
    tn2, tf2 = slab(lo, hi)
    out["cl_box"] = bool(tn2 <= tf2)
    ok2, dbg2 = crossing(bf[6:9, si], bf[9, si], bf[10, si], tn2, tf2)
    out["cl_slab_bf16"] = bool(ok2)
    out["cl_slab_bf16_dbg"] = tuple(round(float(x), 9) for x in dbg2)
    pl = np.asarray(accel.blk_planes[bi], np.float64)
    ok3, dbg3 = crossing(pl[:3, si], pl[3, si], pl[4, si], tn2, tf2)
    out["cl_slab_f32"] = bool(ok3)
    out["cl_slab_f32_dbg"] = tuple(round(float(x), 9) for x in dbg3)
    out["h_vals"] = (float(bf[10, si]), float(pl[4, si]))
    out["tn_tf"] = (round(float(tn2), 6), round(float(tf2), 6))
    return out


def main():
    say("device:", jax.devices()[0])
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    say(f"terrain {tris.shape[0]} tris, {accel.num_blocks} blocks")

    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(vv) for k, vv in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, W, H)
    order, _ = st.swizzle_order(W, H, tile_w=8, tile_h=8)
    origins = origins[jnp.asarray(order)]
    dirs = dirs[jnp.asarray(order)]
    n = origins.shape[0]
    oc = tuple(origins[:, c] for c in range(3))
    dc = tuple(dirs[:, c] for c in range(3))
    t_hit = st.closest_hit_stream_xla(oc, dc, accel).t
    lp = jnp.asarray([0.0, 0.9, 0.0])
    t_s = jnp.where(t_hit < 1e29, t_hit, 2.0)
    p = origins + dirs * (t_s[:, None] * 0.999)
    ld = lp[None, :] - p
    dist = jnp.linalg.norm(ld, axis=1, keepdims=True)
    ld = ld / jnp.maximum(dist, 1e-6)
    tmax_s = dist[:, 0] - 1e-3
    pc = tuple(p[:, c] for c in range(3))
    lc = tuple(ld[:, c] for c in range(3))

    def run(pm, acc):
        if pm is None:
            return np.asarray(st.any_hit_stream_xla(pc, lc, acc, 1e-3,
                                                    tmax_s))
        o2 = tuple(c[pm] for c in pc)
        l2 = tuple(c[pm] for c in lc)
        occ_p = np.asarray(st.any_hit_stream_xla(o2, l2, acc, 1e-3,
                                                 tmax_s[pm]))
        occ = np.zeros(n, bool)
        occ[np.asarray(pm)] = occ_p
        return occ

    co = st.coherence_order(pc, lc, accel)[0]
    rnd = jnp.asarray(np.random.default_rng(7).permutation(n)
                      .astype(np.int32))
    orders = {"caller": None, "coherence": co, "random": rnd}

    for label, acc in (("slab ON", accel), ("slab OFF", accel.replace(
            blk_planes=accel.blk_planes.at[:, 4, :].set(st._BIG),
            top_planes=accel.top_planes.at[:, 4].set(st._BIG),
            blk_boxes_bf16=accel.blk_boxes_bf16.at[:, 10 * st.S:].set(
                jnp.asarray(st._BIG, jnp.bfloat16))))):
        say(f"== {label} ==")
        res = {k: run(pm, acc) for k, pm in orders.items()}
        base = res["caller"]
        say(f"  occluded frac: {base.mean():.4f}")
        bad = np.zeros(n, bool)
        for k2, r in res.items():
            mm = r != base
            say(f"  {k2:10s}: mismatch vs caller {int(mm.sum())}")
            bad |= mm
        if not bad.any():
            continue
        ix = np.nonzero(bad)[0][:256]
        ob = np.stack([np.asarray(c)[ix] for c in pc], -1).astype(np.float64)
        db = np.stack([np.asarray(c)[ix] for c in lc], -1).astype(np.float64)
        occ_t, tri_t, t_t = brute_rows(
            ob.astype(np.float32), db.astype(np.float32),
            np.full(len(ix), 1e-3, np.float32), np.asarray(tmax_s)[ix], tris)
        for k2, r in res.items():
            wrong = r[ix] != occ_t
            say(f"  {k2:10s}: WRONG on {int(wrong.sum())}/{len(ix)} "
                f"diagnosed rays")
        # replay culls for rays whose TRUE state is occluded but some
        # order said no (the missed-cluster direction)
        perm_np = np.asarray(accel.perm)
        inv_perm = {}
        for sidx, tid in enumerate(perm_np):
            if tid >= 0:
                inv_perm.setdefault(int(tid), sidx)
        shown = 0
        for j in range(len(ix)):
            if not occ_t[j] or tri_t[j] < 0 or shown >= 6:
                continue
            missed_by = [k2 for k2, r in res.items() if not r[ix[j]]]
            if not missed_by:
                continue
            slot = inv_perm.get(int(tri_t[j]))
            if slot is None:
                say(f"  ray {ix[j]}: hit tri {tri_t[j]} NOT IN PERM?!")
                continue
            rep = replay_culls(ob[j], db[j], 1e-3,
                               float(np.asarray(tmax_s)[ix[j]]),
                               accel, slot)
            say(f"  ray {ix[j]} t_hit {t_t[j]:.6f} tmax "
                f"{float(np.asarray(tmax_s)[ix[j]]):.6f} missed by "
                f"{missed_by}: {rep}")
            shown += 1


if __name__ == "__main__":
    main()
