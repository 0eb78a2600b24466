"""LPIPS-JAX architecture + event bus tests."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np
import jax.numpy as jnp

from tpu_splat.training.lpips import _lpips_fn, random_params
from tpu_splat.utils import events as ev


def test_lpips_zero_for_identical_and_positive_for_different():
    params = random_params(0)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((1, 3, 64, 64), np.float32))
    b = jnp.asarray(rng.random((1, 3, 64, 64), np.float32))
    same = float(_lpips_fn(params, a, a))
    diff = float(_lpips_fn(params, a, b))
    assert abs(same) < 1e-6
    assert diff > same
    assert np.isfinite(diff)


def test_event_bus_pubsub():
    bus = ev.Bus()
    seen = []
    unsub = bus.subscribe(ev.TrainingProgress, seen.append)
    bus.emit(ev.TrainingProgress(iteration=5, total_iterations=10, loss=0.5, n_alive=100))
    bus.emit(ev.CheckpointSaved(path="x", iteration=5))  # different type: not delivered
    assert len(seen) == 1 and seen[0].iteration == 5
    unsub()
    bus.emit(ev.TrainingProgress(iteration=6, total_iterations=10, loss=0.4, n_alive=100))
    assert len(seen) == 1


def test_event_bus_singleton_sugar():
    got = []
    unsub = ev.when(ev.StopTraining, lambda e: got.append(e))
    ev.emit(ev.StopTraining())
    assert len(got) == 1
    unsub()
