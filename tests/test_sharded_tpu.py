"""Real-hardware proof that shard_map composes with the Mosaic persistent
kernels (VERDICT r3 #4): a sharded render step on a 1-device TPU mesh runs
the SAME compiled packet kernels the unsharded backend runs, and the images
must match bit-exactly. The CPU-mesh suite can't reach this combination
(make_trace_fns selects the XLA fallback off-TPU), so this module skips
there and is run explicitly on the bench host:

    python -m pytest --noconftest tests/test_sharded_tpu.py -q
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.tpu_hardware
def test_shardmap_packet_kernels_real_chip():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs real TPU hardware")

    from chameleonrt_tpu.engine import path_tracer
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import (
        _packet_enabled,
        build_blas_set,
        make_trace_fns,
    )
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.parallel import sharded
    from chameleonrt_tpu.scene.loader import load_scene

    assert _packet_enabled(), "packet kernels must be on for this proof"
    W, H = 64, 64
    scene = load_scene("proc://cornell")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    tc, ta = make_trace_fns(meta)
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)

    # unsharded
    ys, xs = jnp.mgrid[0:H, 0:W]
    illum_s, rays_s = path_tracer.render_pixels(
        flat, meta, tc, ta, view, jnp.uint32(0),
        xs.reshape(-1).astype(jnp.uint32), ys.reshape(-1).astype(jnp.uint32),
        W, H, 1,
    )
    img_single = np.asarray(illum_s).reshape(H, W, 3)

    # sharded over a 1-device mesh on the real chip: shard_map wraps the
    # SAME compiled Mosaic persistent kernels
    mesh = sharded.make_mesh(jax.devices()[:1])
    flat_r = sharded.replicate_scene(flat, mesh)
    step = sharded.make_sharded_render_step(meta, tc, ta, mesh, W, H, 1)
    accum = sharded.shard_accum(jnp.zeros((H, W, 3), jnp.float32), mesh)
    accum, rays_m = step(flat_r, view, accum, jnp.uint32(0))
    np.testing.assert_array_equal(np.asarray(accum), img_single)
    assert int(rays_m) == int(rays_s)


@pytest.mark.tpu_hardware
def test_shardmap_packet_kernels_chunked_real_chip():
    """Chunked sharded step with Mosaic kernels on the real chip: the
    chunks>1 path (separate device executions per shard) must also match
    the unchunked sharded image bit-exactly."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs real TPU hardware")

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set, make_trace_fns
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.parallel import sharded
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 64, 64
    scene = load_scene("proc://cornell")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    tc, ta = make_trace_fns(meta)
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)

    mesh = sharded.make_mesh(jax.devices()[:1])
    flat_r = sharded.replicate_scene(flat, mesh)

    imgs = {}
    for chunks in (1, 2):
        Hp = sharded.padded_height(H, 1, chunks)
        step = sharded.make_sharded_render_step(
            meta, tc, ta, mesh, W, H, 1, chunks=chunks
        )
        accum = sharded.shard_accum(jnp.zeros((Hp, W, 3), jnp.float32), mesh)
        accum, _ = step(flat_r, view, accum, jnp.uint32(0))
        imgs[chunks] = np.asarray(accum)[:H]
    np.testing.assert_array_equal(imgs[1], imgs[2])
