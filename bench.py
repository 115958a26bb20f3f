"""Benchmark harness: Mrays/s on the Sponza-proxy scene at 1280x720.

Mirrors the reference's `-benchmark-frames` protocol (main.cpp:162-163,
293-297: render N frames at fixed camera, report average device-side
ms/frame and rays/s; BASELINE.md north star: >= 100 Mrays/s/chip on Sponza
1280x720). No scene assets ship in this environment, so the procedural
`hall` scene (~280K tris, colonnade hall — Sponza-like occlusion and
divergence) stands in for Sponza; see chameleonrt_tpu/scene/procedural.py.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from chameleonrt_tpu.core import get_backend
    from chameleonrt_tpu.scene.loader import load_scene

    width, height = 1280, 720
    warmup, frames = 1, 4

    # subdiv=4 -> ~224K tris + a diffuse texture, comparable to textured Sponza
    scene = load_scene("proc://hall?subdiv=4")  # textured=1 faults the axon TPU compiler, see docs/STATUS.md
    backend = get_backend("tpu")
    backend.initialize(width, height)
    t0 = time.perf_counter()
    backend.set_scene(scene)
    build_s = time.perf_counter() - t0
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)

    times = []
    rays = []
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
    result = {
        "metric": f"Mrays/s/chip (primary+shadow+secondary), Sponza-proxy hall {scene.unique_tris()//1000}K tris, 1280x720, 1 spp",
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "ms_per_frame": round(ms, 2),
            "fps": round(1000.0 / ms, 2) if ms > 0 else 0,
            "rays_per_frame": int(np.mean(rays)),
            "tris": scene.unique_tris(),
            "scene_build_s": round(build_s, 2),
            "device": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
