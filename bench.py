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
import sys
import time

import numpy as np

CONFIGS = [
    # (name, scene url, width, height, frames, spp)
    ("sponza_proxy", "proc://hall?subdiv=4&textured=1", 1280, 720, 4, 1),
    ("cornell", "proc://cornell", 512, 512, 4, 1),
    ("instanced", "proc://instances?nx=6&ny=6&subdiv=3", 1280, 720, 4, 1),
    # Rungholt-scale soup renders in 27 row-chunks (the ~60 s per-execution
    # wall of the remote-TPU worker, backend_base._render_chunks) at
    # ~4 min/frame even at quarter res — 1 measured frame keeps the config
    # inside the bench budget.
    ("rungholt", "proc://random?n_tris=6700000&spread=12", 640, 360, 1, 1),
]

TIME_BUDGET_S = 2700.0  # soft cap: skip remaining configs past this


def run_config(url, width, height, frames, spp, warmup=1):
    from chameleonrt_tpu.core import get_backend
    from chameleonrt_tpu.scene.loader import load_scene

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

    times, rays = [], []
    for i in range(warmup + frames):
        st = backend.render(
            cam.position, d, cam.up, cam.fov_y,
            camera_changed=(i == 0),
            readback_framebuffer=False,
        )
        if i >= warmup:
            times.append(st.render_time)
            rays.append(st.rays_traced)

    ms = float(np.mean(times))
    mrays = float(np.sum(rays) / (np.sum(times) / 1e3) / 1e6)
    return {
        "mrays_per_s": round(mrays, 3),
        "ms_per_frame": round(ms, 2),
        "fps": round(1000.0 / ms, 2) if ms > 0 else 0,
        "rays_per_frame": int(np.mean(rays)),
        "tris": scene.unique_tris(),
        "spp": spp,
        "res": f"{width}x{height}",
        "scene_build_s": round(build_s, 2),
    }


def main() -> int:
    import jax

    start = time.perf_counter()
    detail = {"device": jax.devices()[0].device_kind, "configs": {}}
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
