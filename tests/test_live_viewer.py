"""Live HTTP/MJPEG viewer (viz/live.py) — the reference Viewer thread's
role (src/Viewer.cc:62) served to a browser instead of a Pangolin
window, plus its CLI wiring (`run.py --live PORT`)."""

import io
import threading
import urllib.request

import numpy as np


def _get(url, timeout=10):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_viewer_serves_frames_and_map():
    from PIL import Image

    from pointslot_tpu.viz.live import LiveViewer

    v = LiveViewer(port=0)   # ephemeral port
    try:
        base = f"http://127.0.0.1:{v.port}"
        status, ctype, body = _get(base + "/")
        assert status == 200 and "text/html" in ctype
        assert b"/stream" in body

        img = np.zeros((32, 48, 3), np.uint8)
        img[8:24, 12:36] = (255, 64, 0)
        v.push_frame(img)
        v.push_map(np.full((20, 20), 128, np.uint8))

        status, ctype, body = _get(base + "/frame.png")
        assert status == 200 and ctype == "image/png"
        got = np.asarray(Image.open(io.BytesIO(body)))
        assert got.shape[:2] == (32, 48)
        np.testing.assert_array_equal(got[:, :, :3], img)

        status, ctype, body = _get(base + "/map.png")
        assert status == 200 and ctype == "image/png"
        assert np.asarray(Image.open(io.BytesIO(body))).shape[:2] == (20, 20)

        # MJPEG stream: one multipart frame arrives promptly
        chunks = []

        def read_stream():
            req = urllib.request.urlopen(base + "/stream", timeout=10)
            chunks.append(req.read(64))

        t = threading.Thread(target=read_stream, daemon=True)
        t.start()
        for _ in range(50):
            v.push_frame(img)
            t.join(timeout=0.1)
            if not t.is_alive():
                break
        assert chunks and b"--frame" in chunks[0], chunks
    finally:
        v.close()


def test_cli_live_flag(tmp_path):
    """--live drives the viewer from the real run loop (synthetic mode 0,
    a few frames) and the final map lands on the endpoint."""
    import socket

    from pointslot_tpu import run as cli

    # pre-bind port 0 to find a free one, then hand it to the CLI
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    frames_seen = []

    def probe():
        try:
            status, ctype, body = _get(
                f"http://127.0.0.1:{port}/frame.png", timeout=30)
            frames_seen.append((status, len(body)))
        except Exception:
            pass

    t = threading.Timer(5.0, probe)
    t.start()
    rc = cli.main([
        "--synthetic", "6", "--mode", "0", "--no-loop",
        "--out", str(tmp_path / "out"), "--live", str(port),
    ])
    t.cancel()
    assert rc == 0
