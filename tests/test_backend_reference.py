"""End-to-end tests of the brute-force `reference` backend on the Cornell
box: determinism, progressive-accumulation semantics, physically sensible
output, instancing. Small resolutions keep XLA compile time manageable."""

import numpy as np
import pytest

from chameleonrt_tpu.core import get_backend
from chameleonrt_tpu.scene.loader import load_scene


RES = 48


@pytest.fixture(scope="module")
def cornell_backend():
    scene = load_scene("proc://cornell")
    b = get_backend("reference")
    b.initialize(RES, RES)
    b.set_scene(scene)
    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    return b, cam, d


def _render(b, cam, d, camera_changed, readback=True):
    return b.render(cam.position, d, cam.up, cam.fov_y, camera_changed, readback)


class TestReferenceBackend:
    def test_renders_cornell_colors(self, cornell_backend):
        b, cam, d = cornell_backend
        for i in range(4):
            stats = _render(b, cam, d, camera_changed=(i == 0))
        img = b.img[..., :3].astype(np.float32)
        assert img.max() > 30, "image should not be black"
        # left third reddish, right third greenish (wall colors)
        left = img[:, : RES // 4].mean(axis=(0, 1))
        right = img[:, -RES // 4 :].mean(axis=(0, 1))
        # sRGB tonemapping compresses ratios; red wall still dominates green
        # on the left and vice versa, and red is brighter on the left wall
        # than the right wall.
        assert left[0] > 1.25 * left[1], left
        assert right[1] > 1.25 * right[0], right
        assert left[0] > right[0] and right[1] > left[1]
        assert stats.rays_traced > RES * RES  # at least primary rays
        assert stats.render_time > 0

    def test_deterministic_given_frame_id(self, cornell_backend):
        b, cam, d = cornell_backend
        _render(b, cam, d, camera_changed=True)
        img1 = b.img.copy()
        _render(b, cam, d, camera_changed=True)  # reset -> frame 0 again
        img2 = b.img.copy()
        np.testing.assert_array_equal(img1, img2)

    def test_progressive_accumulation_reduces_noise(self, cornell_backend):
        b, cam, d = cornell_backend
        _render(b, cam, d, camera_changed=True)
        one = np.asarray(b._accum)
        imgs = [one]
        for _ in range(7):
            _render(b, cam, d, camera_changed=False, readback=False)
            imgs.append(np.asarray(b._accum))
        # variance between consecutive accumulated frames decreases
        d1 = np.abs(imgs[1] - imgs[0]).mean()
        d7 = np.abs(imgs[7] - imgs[6]).mean()
        assert d7 < d1 * 0.6
        # accumulation is a running average: frame k diff scales ~1/(k+1)
        assert b.frame_id == 8

    def test_accum_matches_mean_of_samples(self, cornell_backend):
        """accum after N frames == mean of the N per-frame illum images
        (reference ispc:345-353). Verify via linearity: re-render frame 0
        twice and check the running average of a constant sequence is
        constant."""
        b, cam, d = cornell_backend
        _render(b, cam, d, camera_changed=True)
        a0 = np.asarray(b._accum)
        # frame_id advanced; render frame 1 then manually compare update rule
        _render(b, cam, d, camera_changed=False, readback=False)
        a1 = np.asarray(b._accum)
        # a1 = (illum1 + 1*a0)/2  =>  illum1 = 2*a1 - a0 must be >= 0
        illum1 = 2 * a1 - a0
        assert illum1.min() > -1e-3

    def test_all_finite(self, cornell_backend):
        b, cam, d = cornell_backend
        _render(b, cam, d, camera_changed=True)
        for _ in range(3):
            _render(b, cam, d, camera_changed=False, readback=False)
        assert np.isfinite(np.asarray(b._accum)).all()


class TestInstancedScene:
    def test_instances_render(self):
        scene = load_scene("proc://instances?nx=2&ny=2&subdiv=0")
        b = get_backend("reference")
        b.initialize(32, 32)
        b.set_scene(scene)
        cam = scene.cameras[0]
        d = cam.center - cam.position
        d = d / np.linalg.norm(d)
        b.render(cam.position, d, cam.up, cam.fov_y, True)
        img = b.img[..., :3]
        # boxes occupy the center; both materials visible; background checkerboard
        assert img.max() > 40
        center = img[12:20, 12:20].astype(np.float32)
        corner = img[:4, :4].astype(np.float32)
        assert abs(center.mean() - corner.mean()) > 1.0


class TestWhiteDiffuseMode:
    def test_white_diffuse_grayscale(self):
        scene = load_scene("proc://cornell", material_mode=__import__(
            "chameleonrt_tpu.scene.types", fromlist=["MaterialMode"]
        ).MaterialMode.WHITE_DIFFUSE)
        b = get_backend("reference")
        b.initialize(32, 32)
        b.set_scene(scene)
        cam = scene.cameras[0]
        d = cam.center - cam.position
        d = d / np.linalg.norm(d)
        for i in range(4):
            b.render(cam.position, d, cam.up, cam.fov_y, i == 0)
        img = b.img[..., :3].astype(np.float32)
        # all surfaces share the default 0.9-gray albedo: R≈G≈B per pixel
        max_chan_dev = np.abs(img - img.mean(axis=-1, keepdims=True)).max()
        assert max_chan_dev <= 2.0, max_chan_dev
