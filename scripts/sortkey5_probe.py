"""Round-5 sort-key sweep: cut the DIFFUSE-bounce packet-union waste.

The r5 wider-packet sweep showed per-iteration cost is no longer the lever
(fewer-slots x wider-packets drops ns/it 2476->1591 but b1 unions grow to
match). The waste is the union factor itself: a 256-ray diffuse packet
visits ~450 nodes where a single ray visits ~20 (22x). The sort key decides
what lands in a packet, iteration counts measure the union directly, and
one kernel compile serves every candidate (only the input permutation
changes) — so this probe sweeps keys by ITERATION COUNT on the hall b0/b1
closest waves + the shadow any wave, then the winner gets a timed A/B.

Usage: python -u scripts/sortkey5_probe.py [subdiv]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set, _closest_table
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.ops.lbvh import _expand_bits_10
    from chameleonrt_tpu.scene.loader import load_scene

    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    W, H = 1280, 720
    R = W * H
    scene = load_scene(f"proc://hall?subdiv={subdiv}")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pbvh = _closest_table(flat.blas[0])
    pbvh_any = flat.blas[0].any

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    _, orig0, dir0 = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    act0 = np.ones((R,), bool)
    o0, d0 = np.asarray(orig0), np.asarray(dir0)

    # b1 diffuse wave off the b0 hits (same construction as roofline_probe)
    perm0, _ = traverse.ray_sort_perm(orig0, dir0, jnp.asarray(act0))
    t0_, p0_, _, _ = jax.jit(
        lambda: tp.traverse_closest_persistent(
            pbvh, orig0[perm0], dir0[perm0], jnp.zeros((R,), jnp.float32),
            jnp.asarray(act0)[perm0],
        )
    )()
    # map hits back to unsorted order for wave construction
    inv0 = np.empty(R, np.int32)
    inv0[np.asarray(perm0)] = np.arange(R, dtype=np.int32)
    t0n = np.asarray(t0_)[inv0]
    p0n = np.asarray(p0_)[inv0]
    hitm = p0n >= 0
    hp = o0 + t0n[:, None] * d0 * 0.999
    rngn = np.random.default_rng(7)
    zax = rngn.normal(size=(R, 3)).astype(np.float32)
    zax /= np.maximum(np.linalg.norm(zax, axis=1, keepdims=True), 1e-6)

    lp = np.array([0.0, float(hp[:, 1].max() + 1.0), 0.0], np.float32)
    sd = lp[None, :] - hp
    dist = np.linalg.norm(sd, axis=1).astype(np.float32)
    sd = sd / np.maximum(dist[:, None], 1e-9)

    # ---------- key builders (numpy; sorting host-side is fine here) ----
    def morton27(o):
        lo = o.min(axis=0)
        hi = o.max(axis=0)
        scale = 511.0 / np.maximum(hi - lo, 1e-20)
        q = np.clip((o - lo) * scale, 0.0, 511.0).astype(np.uint32)
        e = lambda v: np.asarray(_expand_bits_10(jnp.asarray(v)), np.uint32)
        return (e(q[:, 0]) << np.uint32(2)) | (e(q[:, 1]) << np.uint32(1)) | e(
            q[:, 2]
        )

    def octant(dd):
        return (
            (dd[:, 0] < 0).astype(np.uint32) * 4
            + (dd[:, 1] < 0).astype(np.uint32) * 2
            + (dd[:, 2] < 0).astype(np.uint32)
        )

    def octa_uv(dd, bits):
        """Octahedral |u|,|v| quantized to bits/2 each (octant carried
        separately): distinguishes directions within an octant."""
        n = np.abs(dd) / np.maximum(
            np.abs(dd).sum(axis=1, keepdims=True), 1e-9
        )
        half = bits // 2
        lv = (1 << half) - 1
        qu = np.minimum((n[:, 0] * (lv + 1)).astype(np.uint32), lv)
        qv = np.minimum((n[:, 1] * (lv + 1)).astype(np.uint32), lv)
        return (qu << np.uint32(half)) | qv

    def key_base(o, dd, act):
        m = morton27(o)
        return (
            ((~act).astype(np.uint32) << np.uint32(30))
            | ((m >> np.uint32(9)) << np.uint32(12))
            | (octant(dd) << np.uint32(9))
            | (m & np.uint32(0x1FF))
        )

    def key_dirfine(o, dd, act, cb, db):
        """coarse-morton(cb) | octant | octa-uv(db) | fine morton fill."""
        m = morton27(o)
        fine = 27 - cb
        fill = max(0, 30 - 1 - cb - 3 - db)
        k = (~act).astype(np.uint32) << np.uint32(30)
        k |= (m >> np.uint32(fine)) << np.uint32(3 + db + fill)
        k |= octant(dd) << np.uint32(db + fill)
        k |= octa_uv(dd, db) << np.uint32(fill)
        if fill:
            k |= (m & np.uint32((1 << fine) - 1)) >> np.uint32(fine - fill)
        return k

    def key_dirmajor(o, dd, act, db):
        """octant | octa-uv(db) | origin morton — direction-major."""
        m = morton27(o)
        keep = min(27, 30 - 1 - 3 - db)
        k = (~act).astype(np.uint32) << np.uint32(30)
        k |= octant(dd) << np.uint32(db + keep)
        k |= octa_uv(dd, db) << np.uint32(keep)
        k |= m >> np.uint32(27 - keep)
        return k

    CANDS = [
        ("base o18|oct|f9", lambda o, dd, act: key_base(o, dd, act)),
        ("o18|oct|d4|f5", lambda o, dd, act: key_dirfine(o, dd, act, 18, 4)),
        ("o12|oct|d6|f8", lambda o, dd, act: key_dirfine(o, dd, act, 12, 6)),
        ("o9|oct|d8|f9", lambda o, dd, act: key_dirfine(o, dd, act, 9, 8)),
        ("o15|oct|d8|f3", lambda o, dd, act: key_dirfine(o, dd, act, 15, 8)),
        ("dirmaj d6|o21", lambda o, dd, act: key_dirmajor(o, dd, act, 6)),
        ("o24|oct|d2", lambda o, dd, act: key_dirfine(o, dd, act, 24, 2)),
    ]

    waves = [
        ("b0", o0, d0, act0, 0.0, None),
        ("b1", hp, zax, hitm, 1e-4, None),
        ("sh", hp, sd, hitm, 1e-4, dist),
    ]

    for wname, o, dd, act, tmn, tmx in waves:
        for kname, kf in CANDS:
            key = kf(o, dd, act)
            perm = np.argsort(key, kind="stable")
            oj = jnp.asarray(o[perm])
            dj = jnp.asarray(dd[perm])
            aj = jnp.asarray(act[perm])
            tj = jnp.full((R,), tmn, jnp.float32)
            if tmx is None:
                it, useful = jax.jit(
                    lambda oj=oj, dj=dj, tj=tj, aj=aj: tp.traverse_closest_persistent(
                        pbvh, oj, dj, tj, aj, return_iters=True
                    )
                )()
            else:
                xj = jnp.asarray(tmx[perm])
                it, useful = jax.jit(
                    lambda oj=oj, dj=dj, tj=tj, xj=xj, aj=aj: tp.traverse_any_persistent(
                        pbvh_any, oj, dj, tj, xj, aj, return_iters=True
                    )
                )()
            it, useful = int(it), int(useful)
            print(
                f"{wname} {kname:16s} iters={it:7d} useful={useful/max(it*tp.K,1)*100:5.1f}%",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
