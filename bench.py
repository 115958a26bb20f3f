"""Benchmark harness: Mrays/s across the BASELINE.md config matrix.

Mirrors the reference's `-benchmark-frames` protocol (main.cpp:162-163,
293-297: render N frames at fixed camera, report average device-side
ms/frame and rays/s). BASELINE.md north star: >= 100 Mrays/s/chip on Sponza
1280x720. No scene assets ship in this environment, so procedural stand-ins
cover the eval configs (chameleonrt_tpu/scene/procedural.py):

  sponza_proxy  textured colonnade hall, ~224K tris, 1280x720 (headline)
  cornell       Cornell box, 512x512
  instanced     instanced grid of parameterized meshes (TLAS-path config)
  rungholt      6.7M-triangle soup (Rungholt-scale)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline config, with every config's numbers under "detail"."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CONFIGS = [
    # (name, scene url, width, height, frames, spp)
    # headline: since round 3 the textured hall carries 17 materials over
    # 8 512^2 textures (mixed base_color + roughness handles) — honest
    # Sponza-class material divergence, not one brick texture
    ("sponza_proxy", "proc://hall?subdiv=4&textured=1", 1280, 720, 4, 1),
    ("cornell", "proc://cornell", 512, 512, 4, 1),
    ("instanced", "proc://instances?nx=6&ny=6&subdiv=3", 1280, 720, 4, 1),
    # Rungholt-scale, structured: a 6.7M-tri voxel city (coherent
    # occlusion, the real Rungholt's character) — the adversarially
    # divergent random soup stays as a separate stress config
    ("rungholt_city", "proc://city?n=610", 640, 360, 2, 1),
    # San Miguel class (BASELINE configs[4]): ~10M instanced tris loaded
    # THROUGH the PBRT loader (generated at bench time), quad light + NEE,
    # 4 spp — first at-scale exercise of scene/pbrt_loader.py
    ("san_miguel_pbrt", "gen://san_miguel", 1280, 720, 1, 4),
    ("rungholt_soup", "proc://random?n_tris=6700000&spread=12", 640, 360, 1, 1),
]

TIME_BUDGET_S = 2700.0  # soft cap: skip remaining configs past this

# Traversal-parity gate scenes (small shapes; the compiled packet kernels
# must agree with the XLA traversal before any timing is reported)
PARITY_W, PARITY_H = 320, 180


def _parity_wavefront(scene, W, H):
    import jax.numpy as jnp

    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops.traverse import ray_sort_perm

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    _, orig, dirs = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    active = jnp.ones((orig.shape[0],), bool)
    perm, _ = ray_sort_perm(orig, dirs, active)
    return orig[perm], dirs[perm], active


def run_parity():
    """Mechanical compiled-kernel parity gate (the -validation oracle role,
    reference main.cpp:154-155,316-325): on every bench run, the compiled
    Pallas traversal must match the XLA traversal on a flat and a unified
    (instanced) scene, and the textured TPU-backend image must match the
    brute-force oracle backend. The round-2 unified-persistent divergence
    shipped because exactly this check was a manual script instead of part
    of bench."""
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import _closest_table, build_blas_set
    from chameleonrt_tpu.ops.lbvh import UnifiedPair
    from chameleonrt_tpu.ops.traverse import (
        traverse_any_blocked,
        traverse_any_unified_blocked,
        traverse_closest_blocked,
        traverse_closest_unified_blocked,
    )
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.scene.loader import load_scene

    import jax

    out = {}
    ok_all = True
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        out["kernels"] = "skipped (no TPU: packet kernels are Mosaic-only)"
    for name, url in (
        ("flat", "proc://hall?subdiv=2"),
        ("unified", "proc://instances?nx=4&ny=4&subdiv=2"),
    ) if on_tpu else ():
        from chameleonrt_tpu.ops import traverse_slotlane as tsl

        scene = load_scene(url)
        flat, meta, host = build_device_scene(scene, want_host=True)
        flat = flat._replace(blas=build_blas_set(flat, meta, host))
        orig, dirs, active = _parity_wavefront(scene, PARITY_W, PARITY_H)
        R = orig.shape[0]
        t_min = jnp.zeros((R,), jnp.float32)
        unified = isinstance(flat.blas[0], UnifiedPair)
        if unified:
            ub = _closest_table(flat.blas[0])
            t0, p0, i0, _, _ = traverse_closest_unified_blocked(
                ub, orig, dirs, t_min, active
            )
            # the production kernel (round 5): slot-lane
            t1, p1, i1, _, _ = tsl.traverse_closest_unified_slotlane(
                ub, orig, dirs, t_min, active
            )
        else:
            pb = _closest_table(flat.blas[0])
            t0, p0, _, _ = traverse_closest_blocked(pb, orig, dirs, t_min, active)
            t1, p1, _, _ = tsl.traverse_closest_slotlane(
                pb, orig, dirs, t_min, active
            )
        p0, p1, t0, t1 = map(np.asarray, (p0, p1, t0, t1))
        both = (p0 >= 0) & (p1 >= 0)
        prim_mismatch = int((p0 != p1).sum())
        dt = float(np.abs(t0[both] - t1[both]).max()) if both.any() else 0.0
        tmax = jnp.where(jnp.asarray(t0) < 1e19, jnp.asarray(t0) * 1.001, 100.0)
        eps = jnp.full((R,), 1e-4, jnp.float32)
        if unified:
            o0 = np.asarray(
                traverse_any_unified_blocked(
                    flat.blas[0].any, orig, dirs, eps, tmax, active
                )
            )
            o1 = np.asarray(
                tsl.traverse_any_unified_slotlane(
                    ub, orig, dirs, eps, tmax, active
                )
            )
        else:
            o0 = np.asarray(
                traverse_any_blocked(pb, orig, dirs, eps, tmax, active)
            )
            o1 = np.asarray(
                tsl.traverse_any_slotlane(pb, orig, dirs, eps, tmax, active)
            )
        occ_mismatch = int((o0 != o1).sum())
        # tolerate <= 20 ppm borderline f32 disagreements (genuine-hit
        # edge cases, see scripts/unified_check.py host-MT analysis); any
        # structural divergence is orders of magnitude above this
        ok = (
            prim_mismatch <= max(2, R // 50_000)
            and occ_mismatch <= max(2, R // 50_000)
            and dt <= 1e-5
        )
        out[name] = {
            "rays": int(R),
            "prim_mismatch": prim_mismatch,
            "occ_mismatch": occ_mismatch,
            "max_dt_common": dt,
            "ok": bool(ok),
        }
        ok_all = ok_all and ok

    # textured image parity vs the brute-force oracle backend
    from chameleonrt_tpu.core import get_backend

    scene = load_scene("proc://hall?subdiv=1&textured=1&columns=4")
    imgs = {}
    for be in ("tpu", "reference"):
        b = get_backend(be)
        b.initialize(128, 72)
        b.set_scene(scene)
        cam = scene.cameras[0]
        d = cam.center - cam.position
        d = d / np.linalg.norm(d)
        b.render(cam.position, d, cam.up, cam.fov_y, camera_changed=True)
        imgs[be] = b.img[..., :3].astype(np.float32)
    mad = float(np.abs(imgs["tpu"] - imgs["reference"]).mean())
    img_ok = mad < 1.0  # same RNG stream: images agree except f32 borderline
    out["textured_image"] = {"mean_abs_diff_u8": round(mad, 4), "ok": img_ok}
    ok_all = ok_all and img_ok
    out["ok"] = ok_all
    if not ok_all:
        print(f"PARITY FAILURE: {out}", file=sys.stderr)
    return out


def run_config(url, width, height, frames, spp, warmup=1):
    from chameleonrt_tpu.core import get_backend
    from chameleonrt_tpu.scene.loader import load_scene

    if url == "gen://san_miguel":
        import tempfile

        from chameleonrt_tpu.scene.pbrt_gen import generate_san_miguel_proxy

        url = generate_san_miguel_proxy(
            os.path.join(tempfile.gettempdir(), "crt_san_miguel")
        )
    scene = load_scene(url)
    backend = get_backend("tpu")
    backend.initialize(width, height)
    t0 = time.perf_counter()
    backend.set_scene(scene)
    build_s = time.perf_counter() - t0
    backend.samples_per_pixel = spp  # after set_scene (scene carries a default)
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)

    for i in range(warmup):
        backend.render(
            cam.position, d, cam.up, cam.fov_y,
            camera_changed=(i == 0),
            readback_framebuffer=False,
        )
    # timed frames pipeline on device (defer_stats: no per-frame tunnel
    # round trip); ONE synchronizing fetch of the summed ray counters
    # closes the batch, so ms/frame is true device throughput
    lazy_rays = []
    t0 = time.perf_counter()
    for i in range(frames):
        st = backend.render(
            cam.position, d, cam.up, cam.fov_y,
            camera_changed=False,
            readback_framebuffer=False,
            defer_stats=True,
        )
        lazy_rays.append(st.rays_traced)
    total_rays = int(sum(int(r) for r in lazy_rays))
    dt = time.perf_counter() - t0

    ms = dt * 1e3 / frames
    mrays = float(total_rays / dt / 1e6)
    return {
        "mrays_per_s": round(mrays, 3),
        "ms_per_frame": round(ms, 2),
        "fps": round(1000.0 / ms, 2) if ms > 0 else 0,
        "rays_per_frame": total_rays // max(frames, 1),
        "tris": scene.unique_tris(),
        "total_tris": scene.total_tris(),
        "spp": spp,
        "res": f"{width}x{height}",
        "scene_build_s": round(build_s, 2),
    }


def main() -> int:
    import jax

    start = time.perf_counter()
    detail = {"device": jax.devices()[0].device_kind, "configs": {}}
    try:
        detail["parity"] = run_parity()
    except Exception as e:  # noqa: BLE001
        detail["parity"] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        print(f"PARITY GATE ERROR: {e}", file=sys.stderr)
    headline = None
    for name, url, w, h, frames, spp in CONFIGS:
        if headline is not None and time.perf_counter() - start > TIME_BUDGET_S:
            detail["configs"][name] = "skipped (time budget)"
            continue
        try:
            r = run_config(url, w, h, frames, spp)
            detail["configs"][name] = r
            if headline is None:
                headline = r
        except Exception as e:  # noqa: BLE001
            detail["configs"][name] = f"FAILED: {type(e).__name__}: {e}"

    if headline is None:
        print(json.dumps({
            "metric": "Mrays/s/chip Sponza-proxy textured 1280x720",
            "value": 0.0, "unit": "Mray/s", "vs_baseline": 0.0,
            "detail": detail,
        }))
        return 1

    mrays = headline["mrays_per_s"]
    print(json.dumps({
        "metric": (
            "Mrays/s/chip (primary+shadow+secondary), Sponza-proxy textured "
            f"hall {headline['tris']//1000}K tris, 1280x720, 1 spp"
        ),
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
