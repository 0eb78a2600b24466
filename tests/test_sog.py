"""SOG v2 export/import round-trip (reference: src/core/sogs.cpp schema, SURVEY.md §8.2)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import json
import zipfile

import numpy as np

from tpu_splat.io.sog import (
    inv_log_transform,
    kmeans,
    kmeans_1d,
    load_sog,
    log_transform,
    morton_order,
    pack_quaternions,
    save_sog,
    unpack_quaternions,
)


def _arrays(n=500, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    q[:, 0] += 1.5
    return {
        "means": rng.normal(0, 2, (n, 3)).astype(np.float32),
        "sh0": rng.normal(0, 0.5, (n, 1, 3)).astype(np.float32),
        "shN": rng.normal(0, 0.1, (n, 15, 3)).astype(np.float32),
        "scaling_raw": rng.normal(-3, 0.5, (n, 3)).astype(np.float32),
        "rotation_raw": q,
        "opacity_raw": rng.normal(0, 1, (n, 1)).astype(np.float32),
    }


def test_log_transform_roundtrip():
    v = np.linspace(-100, 100, 1001).astype(np.float32)
    np.testing.assert_allclose(inv_log_transform(log_transform(v)), v, rtol=1e-5, atol=1e-4)


def test_quaternion_pack_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(0, 1, (200, 4)).astype(np.float32)
    packed = pack_quaternions(q)
    assert packed[:, 3].min() >= 252 and packed[:, 3].max() <= 255
    qr = unpack_quaternions(packed)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    # sign-canonicalize both (q and -q are the same rotation)
    dots = np.abs(np.sum(qn * qr, axis=1))
    assert dots.min() > 0.999, dots.min()


def test_morton_order_locality():
    rng = np.random.default_rng(2)
    pts = rng.random((1000, 3)).astype(np.float32)
    order = morton_order(pts)
    sorted_pts = pts[order]
    # Morton-sorted neighbors are closer on average than random order
    d_sorted = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    d_orig = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_orig


def test_kmeans_1d_quantization():
    rng = np.random.default_rng(3)
    v = np.concatenate([rng.normal(0, 0.1, 500), rng.normal(5, 0.1, 500)]).astype(np.float32)
    cent, labels = kmeans_1d(v, 16, iterations=8)
    err = np.abs(cent[labels] - v).mean()
    assert err < 0.05, err


def test_kmeans_nd():
    rng = np.random.default_rng(4)
    centers = rng.normal(0, 5, (8, 12)).astype(np.float32)
    data = (centers[rng.integers(0, 8, 2000)] + rng.normal(0, 0.05, (2000, 12))).astype(
        np.float32
    )
    cent, labels = kmeans(data, 8, iterations=12, seed=1)
    err = np.linalg.norm(cent[labels] - data, axis=1).mean()
    assert err < 0.5, err


def test_sog_roundtrip_zip(tmp_path):
    arrays = _arrays()
    out = tmp_path / "model.sog"
    save_sog(out, arrays, kmeans_iterations=6)
    assert out.exists()
    with zipfile.ZipFile(out) as z:
        names = set(z.namelist())
        meta = json.loads(z.read("meta.json"))
    assert {"meta.json", "means_l.webp", "means_u.webp", "quats.webp", "scales.webp",
            "sh0.webp", "shN_centroids.webp", "shN_labels.webp"} <= names
    assert meta["version"] == 2 and meta["count"] == 500

    raw = load_sog(out)
    n = 500
    assert raw["means"].shape == (n, 3) and raw["shN"].shape == (n, 15, 3)
    # compression is lossy; compare distributions coarsely on the Morton-reordered sets
    order = morton_order(arrays["means"])
    np.testing.assert_allclose(raw["means"], arrays["means"][order], atol=0.02)
    # opacity 8-bit round trip
    orig_op = 1 / (1 + np.exp(-arrays["opacity_raw"][order, 0]))
    got_op = 1 / (1 + np.exp(-raw["opacity_raw"][:, 0]))
    np.testing.assert_allclose(got_op, orig_op, atol=0.01)
    # quats preserved up to 8-bit quantization
    qo = arrays["rotation_raw"][order]
    qo = qo / np.linalg.norm(qo, axis=1, keepdims=True)
    dots = np.abs(np.sum(qo * raw["rotation_raw"], axis=1))
    assert dots.min() > 0.995


def test_sog_roundtrip_directory(tmp_path):
    arrays = _arrays(n=100)
    out = tmp_path / "sogdir"
    save_sog(out, arrays, kmeans_iterations=4)
    assert (out / "meta.json").exists()
    raw = load_sog(out)
    assert raw["means"].shape == (100, 3)
