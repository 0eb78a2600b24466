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


def _tiny_ply(path, n=40, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    q[:, 0] += 2
    save_splat_ply(
        path,
        (rng.normal(0, spread, (n, 3))).astype(np.float32),
        rng.normal(0, 0.3, (n, 1, 3)).astype(np.float32),
        np.zeros((n, 15, 3), np.float32),
        np.full((n, 3), -3.0, np.float32),
        q,
        rng.normal(0, 1, (n, 1)).astype(np.float32),
    )


def test_viewer_scene_graph_crop_overlay(tmp_path):
    """Multi-model scene graph (visibility + translate), world crop box, grid/axes
    overlay — reference: src/visualizer/scene/ + rendering.hpp:42-57 crop/overlays."""
    import json as _json

    _tiny_ply(tmp_path / "a.ply", n=40, seed=0)
    _tiny_ply(tmp_path / "b.ply", n=25, seed=1)
    viewer = ViewerState(str(tmp_path / "a.ply"), 64, 48,
                         extra_paths=[str(tmp_path / "b.ply")])
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(viewer))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    u = f"http://127.0.0.1:{port}"
    try:
        scene = _json.loads(urllib.request.urlopen(f"{u}/scene", timeout=30).read())
        assert [n["name"] for n in scene["nodes"]] == ["a.ply", "b.ply"]
        assert scene["nodes"][1]["n"] == 25

        # combined render includes both nodes; hiding + translating node 1 changes it
        urllib.request.urlopen(
            f"{u}/scene_ctl?node=1&visible=0&ox=0&oy=0&oz=0", timeout=30).read()
        assert viewer.nodes[1].visible is False
        assert viewer._scene_state().capacity == 40
        urllib.request.urlopen(
            f"{u}/scene_ctl?node=1&visible=1&ox=0.5&oy=0&oz=0", timeout=30).read()
        st = viewer._scene_state()
        assert st.capacity == 65
        assert abs(float(st.means[40:, 0].mean()
                         - viewer.nodes[1].state.means[:, 0].mean()) - 0.5) < 1e-5

        # crop box: a tiny box around one gaussian keeps few alive
        m0 = np.asarray(viewer.nodes[0].state.means[0])
        urllib.request.urlopen(
            f"{u}/scene_ctl?crop=1&cmin={m0[0]-.05},{m0[1]-.05},{m0[2]-.05}"
            f"&cmax={m0[0]+.05},{m0[1]+.05},{m0[2]+.05}", timeout=30).read()
        st = viewer._scene_state()
        n_in = int(np.asarray(st.alive).sum())
        assert 1 <= n_in < 20

        # overlay frame renders (axes/grid drawn host-side over the frame)
        jpg = urllib.request.urlopen(
            f"{u}/frame?theta=0.3&phi=-0.2&radius=1.0&mode=RGB&overlay=1",
            timeout=120).read()
        assert jpg[:2] == b"\xff\xd8"
    finally:
        server.shutdown()
