"""Display layer + arcball camera + interactive CLI tests."""

import io

import numpy as np
import pytest

from chameleonrt_tpu.utils.arcball import ArcballCamera


class TestArcball:
    def test_initial_frame_matches_lookat(self):
        cam = ArcballCamera([0, 0, 5], [0, 0, 0], [0, 1, 0])
        np.testing.assert_allclose(cam.eye, [0, 0, 5], atol=1e-5)
        np.testing.assert_allclose(cam.dir, [0, 0, -1], atol=1e-5)
        np.testing.assert_allclose(cam.up, [0, 1, 0], atol=1e-5)

    def test_initial_frame_arbitrary(self):
        eye = np.array([3.0, 2.0, 4.0])
        center = np.array([0.5, -0.5, 1.0])
        cam = ArcballCamera(eye, center, [0, 1, 0])
        np.testing.assert_allclose(cam.eye, eye, atol=1e-4)
        want_dir = (center - eye) / np.linalg.norm(center - eye)
        np.testing.assert_allclose(cam.dir, want_dir, atol=1e-4)
        # up orthogonal to dir, unit
        assert abs(np.dot(cam.up, cam.dir)) < 1e-4
        assert abs(np.linalg.norm(cam.up) - 1) < 1e-4

    def test_rotate_preserves_distance_and_orthogonality(self):
        cam = ArcballCamera([0, 0, 5], [0, 0, 0], [0, 1, 0])
        cam.rotate((0.0, 0.0), (0.3, 0.2))
        assert abs(np.linalg.norm(cam.eye - cam.center) - 5.0) < 1e-4
        assert abs(np.dot(cam.up, cam.dir)) < 1e-4
        # camera actually moved
        assert np.linalg.norm(cam.eye - np.array([0, 0, 5])) > 0.1

    def test_zoom_changes_distance(self):
        cam = ArcballCamera([0, 0, 5], [0, 0, 0], [0, 1, 0])
        d0 = cam.distance
        cam.zoom(1.0)
        assert cam.distance < d0
        cam.zoom(-2.0)
        assert cam.distance > d0 * 0.9

    def test_pan_moves_center_in_view_plane(self):
        cam = ArcballCamera([0, 0, 5], [0, 0, 0], [0, 1, 0])
        cam.pan((0.1, 0.0))
        moved = cam.center - np.zeros(3)
        # view plane = xy; no z motion
        assert abs(moved[2]) < 1e-6
        assert abs(moved[0]) > 0


class _FakeBackend:
    def __init__(self):
        self.img = np.zeros((8, 8, 4), np.uint8)
        self.img[:4, :, 0] = 200
        self.img[4:, :, 2] = 150
        self.frame_id = 1


class TestDisplays:
    def test_ansi_display_writes_truecolor(self):
        from chameleonrt_tpu.display import AnsiDisplay

        buf = io.StringIO()
        AnsiDisplay(max_cols=8, stream=buf).display(_FakeBackend())
        out = buf.getvalue()
        assert "\x1b[38;2;200;0;0m" in out
        assert "▀" in out

    def test_png_sequence_display(self, tmp_path):
        from chameleonrt_tpu.display import PngSequenceDisplay
        from chameleonrt_tpu.utils.png import read_png

        d = PngSequenceDisplay(prefix=str(tmp_path / "fr"))
        d.display(_FakeBackend())
        d.display(_FakeBackend())
        img = read_png(str(tmp_path / "fr-f1.png"))
        assert img.shape == (8, 8, 4)

    def test_factory(self):
        from chameleonrt_tpu.display import make_display

        assert make_display("ansi").name() == "ANSI terminal"
        with pytest.raises(ValueError):
            make_display("vulkan")


class TestInteractiveCli:
    def test_interactive_session(self, tmp_path, monkeypatch, capsys):
        import sys

        from chameleonrt_tpu import cli

        out_png = tmp_path / "ia.png"
        save_png = tmp_path / "snap.png"
        script = (
            "p\n"
            "frame 2\n"
            "rotate 0 0 0.2 0.1\n"
            "frame\n"
            "zoom 1\n"
            "frame\n"
            f"save {save_png}\n"
            "stats\n"
            "bogus\n"
            "q\n"
        )
        monkeypatch.setattr(sys, "stdin", io.StringIO(script))
        rc = cli.main(
            ["reference", "proc://cornell", "-img", "24", "24",
             "-interactive", "-o", str(out_png)]
        )
        assert rc == 0
        cap = capsys.readouterr().out
        assert "-eye" in cap and "-center" in cap  # `p` output
        assert "ms/frame" in cap  # stats
        assert "unknown command 'bogus'" in cap
        assert out_png.exists() and save_png.exists()
