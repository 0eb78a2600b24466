"""Quality-of-record run on the raytraced capture — the zero-egress stand-in for a real
scene (tests/synth_data.make_raytraced_colmap: checkerboard ground + spheres + sky,
rendered by an independent raytracer, SfM-like noisy surface points; no shared math with
the splatting oracle). Mirrors the reference's per-scene protocol
(eval/benchmark_mipnerf360.sh:24-45): --test-every 8, PSNR/SSIM/LPIPS at eval steps,
metrics.csv per run.

Usage:
  python tools/eval_raytraced.py [--size 128] [--n-cams 24] [--iterations 4000] \
      [--out /tmp/rt_eval] [--max-cap 60000]

Writes the capture under <out>/capture, trains, prints one EVAL line per eval step and
a final JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
sys.path.insert(0, str(Path(__file__).parents[1] / "tests"))

if os.environ.get("TPU_SPLAT_PLATFORM"):
    # the axon TPU plugin overrides JAX_PLATFORMS at import time; pin via jax.config
    # BEFORE any backend init (same workaround as tools/dryrun_multihost.py)
    import jax

    jax.config.update("jax_platforms", os.environ["TPU_SPLAT_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128, help="image width")
    ap.add_argument("--height", type=int, default=None, help="image height (default square)")
    ap.add_argument("--n-cams", type=int, default=24)
    ap.add_argument("--iterations", type=int, default=4000)
    ap.add_argument("--out", default="/tmp/rt_eval")
    ap.add_argument("--max-cap", type=int, default=60_000)
    ap.add_argument("--n-sfm", type=int, default=2000)
    ap.add_argument("--eval-steps", type=int, nargs="*", default=None)
    args = ap.parse_args()

    from synth_data import make_raytraced_colmap

    out = Path(args.out)
    cap = out / "capture"
    make_raytraced_colmap(cap, n_cams=args.n_cams, size=args.size, height=args.height,
                          seed=0, exposure_jitter=0.0, sfm_noise=0.01, n_sfm=args.n_sfm)

    from tpu_splat.core.config import (
        DatasetConfig, OptimizationParameters, TrainingParameters)
    from tpu_splat.training.trainer import Trainer

    steps = args.eval_steps or sorted({args.iterations // 4, args.iterations // 2,
                                       args.iterations})
    params = TrainingParameters(
        dataset=DatasetConfig(data_path=str(cap), output_path=str(out / "run"),
                              test_every=8),
        optimization=OptimizationParameters(
            iterations=args.iterations, max_cap=args.max_cap, enable_eval=True,
            eval_steps=steps, save_steps=[args.iterations], num_workers=2,
            min_opacity=0.005,
        ),
    )
    from tpu_splat.utils import events as ev

    marks = []  # (wall time, iteration) at each progress tick -> steady-state rate
    ev.when(ev.TrainingProgress,
            lambda e: marks.append((time.time(), e.iteration)))

    t0 = time.time()
    trainer = Trainer(params)
    trainer.train(progress_every=100)
    elapsed = time.time() - t0
    steady = None
    if len(marks) >= 3:  # rate over the last half, excluding warmup/compile ticks
        (t_a, it_a), (t_b, it_b) = marks[len(marks) // 2], marks[-1]
        if t_b > t_a:
            steady = (it_b - it_a) / (t_b - t_a)
    rows = []
    for r in trainer.evaluator.results:
        rows.append(dict(step=r.iteration, psnr=round(float(r.psnr), 3),
                         ssim=round(float(r.ssim), 4),
                         lpips=None if r.lpips is None else round(float(r.lpips), 4),
                         n_images=r.num_images))
        print("EVAL", rows[-1], flush=True)
    print(json.dumps(dict(size=args.size, n_cams=args.n_cams,
                          iterations=args.iterations, elapsed_s=round(elapsed, 1),
                          steady_iters_per_s=None if steady is None else round(steady, 3),
                          results=rows)))


if __name__ == "__main__":
    main()
