"""Web viewer smoke test: serve a model, fetch page + frame + info over HTTP."""

import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

from tpu_splat.io.ply import save_splat_ply
from tpu_splat.viewer import ViewerState, make_handler


def test_viewer_serves_frames(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    q[:, 0] += 2
    save_splat_ply(
        tmp_path / "m.ply",
        rng.normal(0, 1, (n, 3)).astype(np.float32),
        rng.normal(0, 0.3, (n, 1, 3)).astype(np.float32),
        np.zeros((n, 15, 3), np.float32),
        np.full((n, 3), -3.0, np.float32),
        q,
        rng.normal(0, 1, (n, 1)).astype(np.float32),
    )
    viewer = ViewerState(str(tmp_path / "m.ply"), 64, 48)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(viewer))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"tpu_splat viewer" in page
        jpg = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame?theta=0.3&phi=-0.2&radius=1.0&mode=RGB",
            timeout=120,
        ).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
        info = urllib.request.urlopen(f"http://127.0.0.1:{port}/info", timeout=30).read()
        assert b"n_alive" in info
    finally:
        server.shutdown()
