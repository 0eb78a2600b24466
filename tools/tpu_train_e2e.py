"""On-TPU end-to-end check: CLI-train a synthetic COLMAP scene through the Pallas path,
then verify the saved PLY renders above a PSNR floor. Run on real hardware (not CI)."""
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
sys.path.insert(0, str(Path(__file__).parents[1] / "tests"))

import numpy as np

from synth_data import make_synthetic_colmap

base = Path("/tmp/tpu_e2e_ds")
make_synthetic_colmap(base, n_gauss=200, n_cams=8, size=64, seed=3)

from tpu_splat.cli import main

rc = main(["-d", str(base), "-o", "/tmp/tpu_e2e_out", "-i", "300", "--headless",
           "--max-cap", "2000", "--test-every", "0", "--sh-degree", "2",
           "--sh-degree-interval", "100"])
assert rc == 0

from tpu_splat.io.colmap import load_colmap
from tpu_splat.io.image import load_image
from tpu_splat.render import load_model, render_view

cams, _, _, _ = load_colmap(str(base), "images", False)
state = load_model("/tmp/tpu_e2e_out/splat_final.ply")
cam = cams[0]
out = render_view(state, cam.world_view_transform, 64, 64,
                  fov_deg=2 * math.degrees(math.atan(32 / (0.7 * 64))))
img = np.clip(np.asarray(out.image), 0, 1)
gt = load_image(cam.image_path)
mse = float(np.mean((img - gt) ** 2))
psnr = 10 * np.log10(1.0 / max(mse, 1e-10))
print(f"trained PSNR on train view: {psnr:.2f} dB")
assert psnr > 18, psnr
print("TPU E2E TRAINING OK")
