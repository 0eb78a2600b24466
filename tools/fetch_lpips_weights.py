"""Produce weights/lpips_vgg.npz — the LPIPS-VGG metric-of-record weights.

Downloads (needs network egress; run once on any machine and copy the npz):
  * torchvision VGG16 ImageNet backbone (official URL), and
  * the LPIPS v0.1 VGG linear heads from the official PerceptualSimilarity repo,
then maps both into the npz layout consumed by tpu_splat.training.lpips.LPIPSJax
(conv{i}_{w,b} for the 13 convs, lin{i}_w for the 5 heads).

The reference ships no weights either — its evaluator loads weights/lpips_vgg.pt
downloaded out-of-band (src/training/metrics/metrics.hpp:54-67); this script is the
TPU build's equivalent of that out-of-band step. Offline CI keeps LPIPS=None.
"""

from __future__ import annotations

import sys
import urllib.request
from pathlib import Path

VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
LPIPS_LIN_URL = (
    "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
    "lpips/weights/v0.1/vgg.pth"
)


def main(out: str = "weights/lpips_vgg.npz") -> None:
    import numpy as np
    import torch

    tmp = Path("/tmp/lpips_dl")
    tmp.mkdir(parents=True, exist_ok=True)
    vgg_p, lin_p = tmp / "vgg16.pth", tmp / "lpips_lin.pth"
    for url, p in ((VGG16_URL, vgg_p), (LPIPS_LIN_URL, lin_p)):
        if not p.exists():
            print("downloading", url)
            urllib.request.urlretrieve(url, p)

    vgg = torch.load(vgg_p, map_location="cpu")
    lin = torch.load(lin_p, map_location="cpu")

    # torchvision vgg16 features: conv layers at indices 0,2,5,7,10,12,14,17,19,21,24,26,28
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out_d = {}
    for i, li in enumerate(conv_idx):
        out_d[f"conv{i}_w"] = vgg[f"features.{li}.weight"].numpy()
        out_d[f"conv{i}_b"] = vgg[f"features.{li}.bias"].numpy()
    for i in range(5):
        out_d[f"lin{i}_w"] = lin[f"lin{i}.model.1.weight"].numpy().reshape(1, -1, 1, 1)

    Path(out).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **out_d)
    print("wrote", out, "(", sum(v.size for v in out_d.values()) / 1e6, "M params )")


if __name__ == "__main__":
    main(*sys.argv[1:])
