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
# torchvision's filename convention embeds the first 8 sha256 hex chars of the file
VGG16_SHA256_PREFIX = "397923af"


def _sha256(p: Path) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(p, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def main(out: str = "weights/lpips_vgg.npz", lin_sha256: str | None = None) -> None:
    """`lin_sha256`: optional expected digest of the LPIPS linear-head file (no
    authoritative digest is published; pin one after a trusted first download)."""
    import numpy as np
    import torch

    tmp = Path("/tmp/lpips_dl")
    tmp.mkdir(parents=True, exist_ok=True)
    vgg_p, lin_p = tmp / "vgg16.pth", tmp / "lpips_lin.pth"
    for url, p in ((VGG16_URL, vgg_p), (LPIPS_LIN_URL, lin_p)):
        if not p.exists():
            print("downloading", url)
            urllib.request.urlretrieve(url, p)
    got = _sha256(vgg_p)
    if not got.startswith(VGG16_SHA256_PREFIX):
        vgg_p.unlink()
        raise SystemExit(f"vgg16 sha256 {got} does not match torchvision prefix "
                         f"{VGG16_SHA256_PREFIX}")
    lin_digest = _sha256(lin_p)
    print("lpips linear-head sha256:", lin_digest)
    if lin_sha256 is not None and lin_digest != lin_sha256:
        lin_p.unlink()
        raise SystemExit(f"lpips head sha256 mismatch: {lin_digest} != {lin_sha256}")

    # weights_only: these are plain state dicts; never execute pickled code
    vgg = torch.load(vgg_p, map_location="cpu", weights_only=True)
    lin = torch.load(lin_p, map_location="cpu", weights_only=True)

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
