"""Render a scene with one backend in a fresh process and save the result.

The cross-backend image tests run each backend here, in its own
interpreter, because this environment's axon CPU client corrupts the
argument-buffer list of a compiled program's re-execution once a second
backend's executables exist in the same process ("Execution supplied N
buffers but compiled program expected M") — reproduced framework-free,
independent of program names, donation, or host round-trips. Process
isolation is robust to the whole bug class; results are written to .npz
and compared by the test in the parent.

Usage: python -m tests.subproc_render BACKEND SCENE_URI RES N_FRAMES OUT.npz
"""

import os
import sys


def main(argv):
    backend_name, scene_uri, res, n_frames, out = (
        argv[0], argv[1], int(argv[2]), int(argv[3]), argv[4],
    )
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("CHAMELEONRT_PACKET_K", "8")
    os.environ.setdefault("CHAMELEONRT_LEAF_THRESH", "3")

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from chameleonrt_tpu.core import get_backend
    from chameleonrt_tpu.scene.loader import load_scene

    scene = load_scene(scene_uri)
    b = get_backend(backend_name)
    b.initialize(res, res)
    b.set_scene(scene)
    if scene.cameras:
        cam = scene.cameras[0]
        pos, center, up, fov = cam.position, cam.center, cam.up, cam.fov_y
    else:
        # camera-less formats (OBJ): the CLI default view,
        # eye=(0,0,5) center=origin up=+y fov=65
        pos = np.array([0.0, 1.0, 5.0], np.float32)
        center = np.zeros(3, np.float32)
        up = np.array([0.0, 1.0, 0.0], np.float32)
        fov = 65.0
    d = center - pos
    d = d / np.linalg.norm(d)
    for i in range(n_frames):
        b.render(
            pos, d, up, fov, i == 0,
            readback_framebuffer=(i == n_frames - 1),
        )
    np.savez(
        out,
        img=b.img[..., :3].astype(np.float32),
        accum=np.asarray(b._accum),
        n_materials=len(scene.materials),
        n_textures=len(scene.textures),
    )


if __name__ == "__main__":
    main(sys.argv[1:])
