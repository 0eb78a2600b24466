"""EuclideanTransform / BoundingBox algebra + crop + SH degree 4
(reference analog: tests/test_geometry.cpp)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np
import jax.numpy as jnp

from tpu_splat.core.geometry import BoundingBox, EuclideanTransform, crop_splat_by_box
from tpu_splat.core.splat import init_from_pointcloud


def test_transform_compose_inverse():
    rng = np.random.default_rng(0)
    q = rng.normal(0, 1, 4).astype(np.float32)
    t1 = EuclideanTransform(q, rng.normal(0, 2, 3).astype(np.float32))
    t2 = EuclideanTransform(rng.normal(0, 1, 4).astype(np.float32),
                            rng.normal(0, 2, 3).astype(np.float32))
    pts = rng.normal(0, 1, (50, 3)).astype(np.float32)
    # compose semantics: (t1 * t2)(p) == t1(t2(p))
    np.testing.assert_allclose(t1.compose(t2).apply(pts), t1.apply(t2.apply(pts)),
                               atol=1e-4)
    np.testing.assert_allclose(t1.inverse().apply(t1.apply(pts)), pts, atol=1e-4)
    np.testing.assert_allclose(
        t1.to_matrix() @ t1.inverse().to_matrix(), np.eye(4), atol=1e-5
    )
    np.testing.assert_allclose(
        EuclideanTransform.from_matrix(t1.to_matrix()).to_matrix(), t1.to_matrix(),
        atol=1e-5,
    )


def test_obb_contains():
    # unit box rotated 45 deg about z, shifted to (5,0,0) in world
    world2bbox = EuclideanTransform(
        np.array([np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)]), np.zeros(3)
    ).compose(EuclideanTransform(translation=np.array([-5.0, 0, 0])))
    box = BoundingBox(np.full(3, -1.0), np.full(3, 1.0), world2bbox)
    assert box.contains(np.array([[5.0, 0, 0]]))[0]
    assert not box.contains(np.array([[8.0, 0, 0]]))[0]


def test_crop_splat():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (100, 3)).astype(np.float32)
    splat = init_from_pointcloud(pts, rng.random((100, 3), np.float32),
                                 np.zeros(3, np.float32), capacity=128)
    box = BoundingBox(np.full(3, -1.0), np.full(3, 1.0))
    cropped = crop_splat_by_box(splat, box)
    expect = np.all((pts >= -1) & (pts <= 1), axis=1).sum()
    assert int(cropped.n_alive()) == expect


def test_sh_degree4():
    from tpu_splat.ops.sh import sh_to_color

    rng = np.random.default_rng(2)
    n = 64
    sh0 = jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)).astype(np.float32))
    shN = jnp.asarray(rng.normal(0, 0.1, (n, 24, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    c3 = sh_to_color(sh0, shN, dirs, 3)
    c4 = sh_to_color(sh0, shN, dirs, 4)
    assert np.isfinite(np.asarray(c4)).all()
    assert float(jnp.max(jnp.abs(c4 - c3))) > 1e-4  # band 4 contributes
    # degree mask: zero band-4 coeffs -> identical
    shN0 = shN.at[:, 15:].set(0.0)
    np.testing.assert_allclose(
        np.asarray(sh_to_color(sh0, shN0, dirs, 4)), np.asarray(c3), atol=1e-6
    )
