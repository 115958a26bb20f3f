"""Golden-image regression: the cross-implementation oracle strategy of the
reference turned into a pinned statistical signature. Rather than committing
a binary golden PNG (noise-sensitive across jax versions), the test pins
region statistics of a 16-frame cornell render that are stable to Monte-Carlo
noise but break on any change to camera/BSDF/NEE/accumulation semantics."""

import numpy as np
import pytest

from chameleonrt_tpu.core import get_backend
from chameleonrt_tpu.scene.loader import load_scene


@pytest.fixture(scope="module")
def cornell_16f():
    scene = load_scene("proc://cornell")
    b = get_backend("tpu")
    b.initialize(32, 32)
    b.set_scene(scene)
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d /= np.linalg.norm(d)
    for i in range(16):
        b.render(cam.position, d, cam.up, cam.fov_y, i == 0, readback_framebuffer=False)
    return np.asarray(b._accum)


def test_region_signature(cornell_16f):
    acc = cornell_16f
    # Whole-image mean luminance: pinned band (16 frames of MC noise keeps
    # this within a few percent run-to-run; semantics changes move it far
    # more). Measured 2026-08: ~0.92.
    lum = 0.2126 * acc[..., 0] + 0.7152 * acc[..., 1] + 0.0722 * acc[..., 2]
    assert 0.6 < lum.mean() < 1.3, lum.mean()
    # Left wall redder than blue; right wall greener than red (linear space)
    left = acc[8:24, :6].mean(axis=(0, 1))
    right = acc[8:24, -6:].mean(axis=(0, 1))
    assert left[0] > 2.0 * left[2], left
    assert right[1] > 2.0 * right[0], right
    # Ceiling brighter than floor shadowed areas near boxes? Just pin floor
    # visible and nonzero
    floor = acc[-6:, 10:22].mean()
    assert floor > 0.1
    # Determinism: same frame sequence must reproduce exactly
    scene = load_scene("proc://cornell")
    b = get_backend("tpu")
    b.initialize(32, 32)
    b.set_scene(scene)
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d /= np.linalg.norm(d)
    for i in range(16):
        b.render(cam.position, d, cam.up, cam.fov_y, i == 0, readback_framebuffer=False)
    np.testing.assert_array_equal(np.asarray(b._accum), acc)
