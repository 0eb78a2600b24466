"""CLI / project / checkpoint integration (reference: application.cpp, project.cpp;
checkpoint/resume is an upgrade the reference lacks, SURVEY.md §5.4)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synth_data import make_synthetic_colmap


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    base = tmp_path_factory.mktemp("ds")
    make_synthetic_colmap(base, n_gauss=80, n_cams=5, size=48, seed=1)
    return base


def test_cli_headless_train(dataset, tmp_path):
    from tpu_splat.cli import main

    out = tmp_path / "out"
    rc = main(["-d", str(dataset), "-o", str(out), "-i", "12", "--headless",
               "--max-cap", "200", "--test-every", "0", "--sh-degree", "1",
               "--checkpoint-every", "10"])
    assert rc == 0
    assert (out / "splat_final.ply").exists()
    assert (out / "training_params.json").exists()
    assert (out / "checkpoint_10.npz").exists()
    proj = json.loads((out / "out.ls").read_text())
    assert proj["version"] == 2
    assert any(p["name"] == "final" for p in proj["plys"])


def test_cli_resume(dataset, tmp_path):
    from tpu_splat.cli import main
    from tpu_splat.training.checkpoint import load_checkpoint

    out1 = tmp_path / "a"
    rc = main(["-d", str(dataset), "-o", str(out1), "-i", "10", "--headless",
               "--max-cap", "200", "--test-every", "0", "--sh-degree", "1",
               "--checkpoint-every", "10"])
    assert rc == 0
    ts, extra = load_checkpoint(out1 / "checkpoint_10.npz")
    assert int(ts.iteration) == 11
    out2 = tmp_path / "b"
    rc = main(["-d", str(dataset), "-o", str(out2), "-i", "15", "--headless",
               "--max-cap", "200", "--test-every", "0", "--sh-degree", "1",
               "--resume", str(out1 / "checkpoint_10.npz")])
    assert rc == 0
    assert (out2 / "splat_final.ply").exists()


def test_cli_view(dataset, tmp_path):
    from tpu_splat.cli import main

    out = tmp_path / "train"
    main(["-d", str(dataset), "-o", str(out), "-i", "5", "--headless",
          "--max-cap", "200", "--test-every", "0", "--sh-degree", "1"])
    renders = tmp_path / "renders"
    rc = main(["--view", str(out / "splat_final.ply"), "-o", str(renders),
               "--view-frames", "2", "--view-width", "64", "--view-height", "48"])
    assert rc == 0
    assert (renders / "frame_0000.png").exists()
    assert (renders / "frame_0001.png").exists()


def test_project_lock_and_migration(tmp_path):
    from tpu_splat.core.project import Project, create_new_project

    proj = create_new_project("/data", str(tmp_path), name="demo")
    assert proj.acquire_lock()
    p2 = Project.load(proj.path)
    assert not p2.acquire_lock()  # held by us
    proj.release_lock()
    assert p2.acquire_lock()
    p2.release_lock()

    # version-1 file migrates
    old = dict(version=1, name="x", data_path="", output_path="", is_temporary=False,
               created=0.0, updated=0.0, params={}, plys=[])
    f = tmp_path / "old.ls"
    f.write_text(json.dumps(old))
    loaded = Project.load(f)
    assert loaded.version == 2 and loaded.checkpoints == []


def test_config_json_roundtrip(tmp_path):
    from tpu_splat.cli import build_parser, params_from_args
    from tpu_splat.core.config import OptimizationParameters

    cfg = OptimizationParameters(iterations=777, strategy="default")
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps(cfg.to_json()))
    args = build_parser().parse_args(["-d", "x", "-o", "y", "--config", str(f),
                                      "--max-cap", "123"])
    params = params_from_args(args)
    assert params.optimization.iterations == 777
    assert params.optimization.strategy == "default"
    assert params.optimization.max_cap == 123  # CLI overrides config


def test_live_training_viewer(tmp_path):
    """Training-attached web viewer: /status, /frame, and /control drive a running
    Trainer (reference: visualizer training attach, training_manager.cpp:121,343)."""
    import json as _json
    import threading
    import time
    import urllib.request

    from synth_data import make_synthetic_colmap
    from tpu_splat.core.config import (
        DatasetConfig, OptimizationParameters, TrainingParameters)
    from tpu_splat.training.trainer import Trainer
    from tpu_splat.viewer import attach

    base = tmp_path / "ds"
    make_synthetic_colmap(base, n_gauss=50, n_cams=3, size=32, seed=5)
    opt = OptimizationParameters(
        iterations=4000, max_cap=128, sh_degree=1, eval_steps=[], save_steps=[],
        stop_refine=2, lambda_dssim=0.0,
    )
    params = TrainingParameters(
        dataset=DatasetConfig(data_path=str(base), output_path=str(tmp_path / "out"),
                              test_every=100),
        optimization=opt,
    )
    trainer = Trainer(params)
    server = attach(trainer, port=18973, width=64, height=48)
    t = threading.Thread(target=trainer.train, kwargs=dict(progress_every=5), daemon=True)
    t.start()
    try:
        deadline = time.time() + 120
        status = None
        while time.time() < deadline:
            try:
                status = _json.loads(urllib.request.urlopen(
                    "http://127.0.0.1:18973/status", timeout=5).read())
                if status["iteration"] >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert status is not None and status["iteration"] >= 2, status
        jpg = urllib.request.urlopen(
            "http://127.0.0.1:18973/frame?theta=0.3&phi=-0.2&radius=1", timeout=60).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
        jpg2 = urllib.request.urlopen(
            "http://127.0.0.1:18973/frame?theta=0.3&phi=-0.2&radius=1&overlay=1",
            timeout=60).read()
        assert jpg2[:2] == b"\xff\xd8"  # axes/grid + camera-frustum overlay path
        urllib.request.urlopen("http://127.0.0.1:18973/control?action=stop", timeout=5)
        t.join(timeout=120)
        assert not t.is_alive(), "trainer did not stop on viewer control"
    finally:
        server.shutdown()


def test_viewer_split_compare(dataset, tmp_path):
    """Model-compare split view (reference: rendering.hpp:42-57): two models from the
    same camera composited at the divider; the divider column moves with `split`."""
    from tpu_splat.cli import main
    from tpu_splat.viewer import ViewerState

    out = tmp_path / "train"
    main(["-d", str(dataset), "-o", str(out), "-i", "4", "--headless",
          "--max-cap", "200", "--test-every", "0", "--sh-degree", "1"])
    ply = out / "splat_final.ply"
    v = ViewerState(str(ply), 64, 48, compare_path=str(ply))
    assert v.compare is not None
    a = v.frame(0.6, -0.25, 1.0, "RGB", split=0.25)
    b = v.frame(0.6, -0.25, 1.0, "RGB", split=0.75)
    assert a[:2] == b"\xff\xd8" and b[:2] == b"\xff\xd8"  # valid JPEGs
    assert a != b  # divider position changes the composite
    plain = v.frame(0.6, -0.25, 1.0, "RGB")  # no split param -> single model
    assert plain[:2] == b"\xff\xd8"
