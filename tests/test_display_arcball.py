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


class TestHttpDisplay:
    """Browser-viewer display (display/http_display.py): page, MJPEG
    stream, stats JSON, and the input-event path."""

    def _start(self):
        from chameleonrt_tpu.display.http_display import HttpDisplay

        return HttpDisplay(port=0)  # ephemeral port

    def test_page_stats_input_and_stream(self):
        import json
        import urllib.request

        disp = self._start()
        try:
            base = f"http://127.0.0.1:{disp.port}"
            page = urllib.request.urlopen(f"{base}/", timeout=5).read()
            assert b"/stream" in page and b"/stats" in page
            disp.set_stats(12.5, 3.2e6, 7)
            fake = _FakeBackend()
            disp.display(fake)
            stats = json.loads(
                urllib.request.urlopen(f"{base}/stats", timeout=5).read()
            )
            assert stats["ms_per_frame"] == 12.5
            assert stats["frame_id"] == 7
            assert stats["width"] == fake.img.shape[1]
            # input events round-trip into poll_events
            req = urllib.request.Request(
                f"{base}/input",
                data=json.dumps(
                    {"type": "rotate", "x0": 0, "y0": 0, "x1": 0.1, "y1": 0.2}
                ).encode(),
                method="POST",
            )
            assert urllib.request.urlopen(req, timeout=5).status == 204
            evs = disp.poll_events()
            assert evs and evs[0]["type"] == "rotate"
            # stream yields a decodable JPEG part
            resp = urllib.request.urlopen(f"{base}/stream", timeout=5)
            assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]
            line = resp.readline()  # --crtframe
            assert b"crtframe" in line
            headers = {}
            while True:
                ln = resp.readline().strip()
                if not ln:
                    break
                k, v = ln.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
            n = int(headers[b"content-length"])
            jpeg = resp.read(n)
            from chameleonrt_tpu.utils.jpeg import decode_jpeg

            img = decode_jpeg(jpeg)
            assert img.shape == (fake.img.shape[0], fake.img.shape[1], 3)
        finally:
            disp.close()

    def test_quit_event_closes(self):
        import json
        import urllib.request

        disp = self._start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{disp.port}/input",
                data=json.dumps({"type": "quit"}).encode(),
                method="POST",
            )
            urllib.request.urlopen(req, timeout=5)
            assert disp.closed
        finally:
            disp.close()


class TestHttpViewerCli:
    def test_viewer_loop_renders_and_quits(self, tmp_path, monkeypatch):
        """run_http_viewer end-to-end on the reference backend: render a
        couple of frames, drive one arcball event over HTTP, then quit."""
        import json
        import threading
        import urllib.request

        from chameleonrt_tpu import cli
        from chameleonrt_tpu.core import get_backend
        from chameleonrt_tpu.scene.loader import load_scene

        scene = load_scene("proc://cornell")
        backend = get_backend("reference")
        backend.initialize(16, 16)
        backend.set_scene(scene)
        cam = scene.cameras[0]

        ports = {}
        from chameleonrt_tpu.display.http_display import HttpDisplay

        orig_init = HttpDisplay.__init__

        def patched(self, port=8000, quality=80, host="127.0.0.1"):
            orig_init(self, port=0, quality=quality, host=host)
            ports["port"] = self.port

        monkeypatch.setattr(HttpDisplay, "__init__", patched)

        def driver():
            import time as _t

            for _ in range(100):
                if "port" in ports:
                    break
                _t.sleep(0.05)
            base = f"http://127.0.0.1:{ports['port']}"
            urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/input",
                    data=json.dumps(
                        {"type": "rotate", "x0": 0, "y0": 0, "x1": 0.2, "y1": 0}
                    ).encode(),
                    method="POST",
                ),
                timeout=5,
            )
            _t.sleep(0.3)
            urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/input",
                    data=json.dumps({"type": "quit"}).encode(),
                    method="POST",
                ),
                timeout=5,
            )

        th = threading.Thread(target=driver, daemon=True)
        th.start()
        out = tmp_path / "viewer.png"
        opts = {"display": "http:0", "out": str(out)}
        d = cam.center - cam.position
        d = d / np.linalg.norm(d)
        rc = cli.run_http_viewer(
            backend, cam.position, cam.center, cam.up, cam.fov_y, opts
        )
        th.join(timeout=10)
        assert rc == 0
        assert out.exists()
