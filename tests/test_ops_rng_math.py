"""Kernel-library unit tests: RNG bit-exactness, math helpers, lights,
camera/miss shader."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chameleonrt_tpu.ops import camera, lights, rng
from chameleonrt_tpu.ops import math as om


def np_murmur_mix(h, k):
    """Independent numpy model of reference lcg_rng.ih:8-25."""
    h = np.uint32(h)
    k = np.uint32(k)
    with np.errstate(over="ignore"):
        k = np.uint32(k * np.uint32(0xCC9E2D51))
        k = np.uint32((k << np.uint32(15)) | (k >> np.uint32(17)))
        k = np.uint32(k * np.uint32(0x1B873593))
        h = np.uint32(h ^ k)
        h = np.uint32(
            np.uint32((h << np.uint32(13)) | (h >> np.uint32(19))) * np.uint32(5)
            + np.uint32(0xE6546B64)
        )
    return h


def np_murmur_finalize(h):
    h = np.uint32(h)
    with np.errstate(over="ignore"):
        h = np.uint32(h ^ (h >> np.uint32(16)))
        h = np.uint32(h * np.uint32(0x85EBCA6B))
        h = np.uint32(h ^ (h >> np.uint32(13)))
        h = np.uint32(h * np.uint32(0xC2B2AE35))
        h = np.uint32(h ^ (h >> np.uint32(16)))
    return h


def np_get_rng(pixel_id, frame_id):
    return np_murmur_finalize(np_murmur_mix(np_murmur_mix(0, pixel_id), frame_id))


def np_lcg_random(state):
    with np.errstate(over="ignore"):
        return np.uint32(state * np.uint32(1664525) + np.uint32(1013904223))


class TestRng:
    def test_seed_matches_reference_scheme(self):
        pix = np.array([0, 1, 12345, 2**31], dtype=np.uint32)
        frm = np.array([1, 2, 3, 4], dtype=np.uint32)
        got = np.asarray(rng.get_rng(jnp.asarray(pix), jnp.asarray(frm)))
        want = np.array([np_get_rng(p, f) for p, f in zip(pix, frm)], np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_lcg_sequence_bit_exact(self):
        state = rng.get_rng(jnp.uint32(42), jnp.uint32(1))
        np_state = np_get_rng(42, 1)
        for _ in range(8):
            state, draw = rng.lcg_random(state)
            np_state = np_lcg_random(np_state)
            assert int(draw) == int(np_state)

    def test_randomf_range_and_ldexp_semantics(self):
        state = rng.get_rng(jnp.arange(4096, dtype=jnp.uint32), jnp.uint32(1))
        _, f = rng.lcg_randomf(state)
        f = np.asarray(f)
        assert f.min() >= 0.0
        assert f.max() <= 1.0
        # ldexp(float(u32), -32) semantics: round-to-float then scale
        s, _ = rng.lcg_random(rng.get_rng(jnp.uint32(7), jnp.uint32(9)))
        _, fv = rng.lcg_randomf(rng.get_rng(jnp.uint32(7), jnp.uint32(9)))
        want = np.float32(np.float32(int(np_lcg_random(np_get_rng(7, 9)))) * 2.0**-32)
        assert np.float32(fv) == want

    def test_distribution_uniform(self):
        state = rng.get_rng(jnp.arange(200_000, dtype=jnp.uint32), jnp.uint32(1))
        _, f = rng.lcg_randomf(state)
        hist, _ = np.histogram(np.asarray(f), bins=16, range=(0, 1))
        expected = 200_000 / 16
        assert np.all(np.abs(hist - expected) < 5 * np.sqrt(expected))


class TestMath:
    def test_ortho_basis_matches_reference_branching(self):
        normals = np.array(
            [
                [0.0, 0.0, 1.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.577, 0.577, 0.577],
                [0.9, 0.1, 0.1],
                [0.7, 0.7, 0.14],
            ],
            np.float32,
        )
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        v_x, v_y = om.ortho_basis(jnp.asarray(normals))
        v_x, v_y = np.asarray(v_x), np.asarray(v_y)
        from chameleonrt_tpu.scene.types import ortho_basis as np_ob

        for i, n in enumerate(normals):
            wx, wy = np_ob(n)
            np.testing.assert_allclose(v_x[i], wx, atol=1e-5)
            np.testing.assert_allclose(v_y[i], wy, atol=1e-5)
            # orthonormal right-handed
            assert abs(np.dot(v_x[i], n)) < 1e-5
            assert abs(np.dot(v_y[i], n)) < 1e-5
            np.testing.assert_allclose(np.cross(v_x[i], v_y[i]), n, atol=1e-5)

    def test_reflect_refract(self):
        n = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
        i = om.normalize(jnp.asarray(np.array([[1.0, 0.0, -1.0]], np.float32)))
        r = om.reflect(i, n)
        np.testing.assert_allclose(np.asarray(om.normalize(r))[0], [0.70710677, 0, 0.70710677], atol=1e-5)
        # TIR returns zero vector
        t = om.refract(i, n, jnp.asarray([2.5], np.float32))
        assert np.allclose(np.asarray(t), 0.0)

    def test_power_heuristic(self):
        w = om.power_heuristic(1.0, jnp.asarray([2.0]), 1.0, jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(w), [4.0 / 5.0], atol=1e-6)

    def test_srgb_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 64)
        y = om.srgb_to_linear(om.linear_to_srgb(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def _single_light():
    from chameleonrt_tpu.scene.types import default_obj_light

    l = default_obj_light()
    return lights.LightArrays.from_scene_lights([l]).gather(jnp.asarray([0]))


class TestLights:
    def test_sample_position_on_plane(self):
        la = _single_light()
        s = jnp.asarray(np.array([[0.3, 0.8]], np.float32))
        p = lights.sample_quad_light_position(la, s)
        d = np.asarray(om.dot(p - la.position, la.normal))
        np.testing.assert_allclose(d, 0.0, atol=1e-5)

    def test_quad_intersect_hits_sampled_point(self):
        la = _single_light()
        s = jnp.asarray(np.array([[0.25, 0.5]], np.float32))
        p = lights.sample_quad_light_position(la, s)
        orig = jnp.asarray(np.zeros((1, 3), np.float32))
        dir = om.normalize(p - orig)
        hit, t, light_pos = lights.quad_intersect(la, orig, dir)
        assert bool(hit[0])
        np.testing.assert_allclose(np.asarray(light_pos)[0], np.asarray(p)[0], atol=1e-4)

    def test_quad_intersect_misses_behind(self):
        la = _single_light()
        orig = jnp.asarray(np.zeros((1, 3), np.float32))
        dir = om.normalize(-(la.position - orig))
        hit, _, _ = lights.quad_intersect(la, orig, dir)
        assert not bool(hit[0])

    def test_pdf_reference_quirk(self):
        """quad_light_pdf uses (p - dir), not (p - orig) — reference
        lights.ih:42. The test pins that behavior."""
        la = _single_light()
        p = la.position + 0.5 * la.v_x * la.width[..., None]
        orig = jnp.asarray(np.zeros((1, 3), np.float32))
        dir = om.normalize(p - orig)
        pdf = np.asarray(lights.quad_light_pdf(la, p, orig, dir))
        to_pt = np.asarray(p - dir)
        want = (to_pt**2).sum() / (
            np.asarray(om.dot(la.normal, -dir)) * float(la.width[0] * la.height[0])
        )
        np.testing.assert_allclose(pdf, want, rtol=1e-5)


class TestCamera:
    def test_view_params_geometry(self):
        view = camera.compute_view_params(
            [0, 0, 5], [0, 0, -1], [0, 1, 0], 65.0, 1280, 720
        )
        du, dv, tl = map(np.asarray, (view.dir_du, view.dir_dv, view.dir_top_left))
        img_y = 2.0 * np.tan(np.radians(32.5))
        img_x = img_y * 1280 / 720
        np.testing.assert_allclose(np.linalg.norm(du), img_x, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(dv), img_y, rtol=1e-5)
        # center pixel looks along dir
        center = tl + 0.5 * du + 0.5 * dv
        np.testing.assert_allclose(center, [0, 0, -1], atol=1e-6)

    def test_primary_rays_through_pixels(self):
        view = camera.compute_view_params([0, 0, 0], [0, 0, -1], [0, 1, 0], 90.0, 4, 4)
        px = jnp.asarray(np.array([0, 3], np.uint32))
        py = jnp.asarray(np.array([0, 3], np.uint32))
        state = rng.get_rng(px + py * 4, jnp.uint32(1))
        _, org, d = camera.generate_primary_rays(view, px, py, 4.0, 4.0, state)
        d = np.asarray(d)
        # top-left pixel has dir up-left of center; v grows downward
        assert d[0, 0] < 0 and d[0, 1] > 0
        assert d[1, 0] > 0 and d[1, 1] < 0

    def test_miss_shader_checkerboard(self):
        d = jnp.asarray(
            np.array(
                [[0.0, -0.5, -0.5], [0.0, 1.0, 0.0], [0.0, 0.05, -1.0]], np.float32
            )
        )
        d = om.normalize(d)
        c = np.asarray(camera.miss_shader(d))
        # below horizon threshold -> dark
        assert np.allclose(c[0], 0.1)
        assert set(np.unique(c)).issubset({np.float32(0.1), np.float32(0.5)})

    def test_miss_shader_jit(self):
        f = jax.jit(camera.miss_shader)
        d = om.normalize(jnp.asarray(np.random.default_rng(0).normal(size=(128, 3)).astype(np.float32)))
        c = np.asarray(f(d))
        assert c.shape == (128, 3)
        assert np.isin(c.ravel().astype(np.float32), [np.float32(0.1), np.float32(0.5)]).all()
