"""Cross-backend image comparison — the reference's primary correctness
strategy (`-validation`, SURVEY.md §4.1): the BVH-accelerated `tpu` backend
must reproduce the brute-force `reference` backend's image. Because both
share RNG streams and shading code and differ only in traversal, agreement
is near bit-exact, far tighter than the reference's Monte-Carlo-noise bound.

Each backend renders in its own subprocess (tests/subproc_render.py):
this environment's axon CPU client corrupts a compiled program's
re-execution argument buffers once a second backend's executables exist
in the same process ("Execution supplied N buffers but compiled program
expected M") — reproduced framework-free. Process isolation sidesteps the
whole bug class and matches how the reference runs one backend per
process (main.cpp backend selection)."""

import subprocess
import sys

import numpy as np
import pytest


def render_frames(backend_name, scene_uri, res, n_frames=3, tmpdir="/tmp"):
    out = f"{tmpdir}/xb_{backend_name}_{abs(hash((scene_uri, res, n_frames)))}.npz"
    subprocess.run(
        [
            sys.executable,
            "-m",
            "tests.subproc_render",
            backend_name,
            scene_uri,
            str(res),
            str(n_frames),
            out,
        ],
        check=True,
        timeout=900,
    )
    with np.load(out) as z:
        return z["img"].copy(), z["accum"].copy(), {k: z[k] for k in z.files}


@pytest.mark.parametrize(
    "scene_uri", ["proc://cornell", "proc://instances?nx=2&ny=2&subdiv=0"]
)
def test_tpu_matches_reference_images(scene_uri, tmp_path):
    img_ref, acc_ref, _ = render_frames("reference", scene_uri, 40, tmpdir=str(tmp_path))
    img_tpu, acc_tpu, _ = render_frames("tpu", scene_uri, 40, tmpdir=str(tmp_path))
    _assert_images_match(img_ref, img_tpu, acc_ref, acc_tpu)


def _assert_images_match(img_ref, img_tpu, acc_ref, acc_tpu):
    # Traversal differences can flip coincident-surface ties on a handful
    # of pixels; require near-exact agreement elsewhere — for both the
    # 8-bit image and the float accumulator (the same tie-flip shows up in
    # both views of the framebuffer).
    diff = np.abs(img_ref - img_tpu)
    frac_off = (diff.max(axis=-1) > 2).mean()
    assert frac_off < 0.01, f"{frac_off:.4%} pixels differ, max={diff.max()}"
    adiff = np.abs(acc_ref - acc_tpu)
    tol = 5e-3 + 5e-3 * np.abs(acc_ref)
    afrac = (adiff > tol).max(axis=-1).mean()
    assert afrac < 0.01, f"{afrac:.4%} accum px differ, max={adiff.max()}"
    assert adiff.max() < 0.5, f"accum outlier too large: {adiff.max()}"


def test_tpu_matches_reference_textured_image(tmp_path):
    """Textured + multi-material image parity (VERDICT r2 weak #6/#7): a
    loaded 17-material / 8-texture hall at >=128 px wide, BVH backend vs
    the brute-force oracle — exercises atlas decode, per-geometry material
    ids and roughness texture handles through both backends (the
    -validation oracle role, reference main.cpp:154-155,316-325)."""
    uri = "proc://hall?subdiv=1&textured=1&columns=4"
    img_ref, acc_ref, zref = render_frames("reference", uri, 144, 4, tmpdir=str(tmp_path))
    assert int(zref["n_materials"]) >= 16 and int(zref["n_textures"]) >= 8
    img_tpu, acc_tpu, _ = render_frames("tpu", uri, 144, 4, tmpdir=str(tmp_path))
    _assert_images_match(img_ref, img_tpu, acc_ref, acc_tpu)
