"""Image loading pipeline (image_io.cpp:114-200 + camera.cpp:101-165 semantics):

uint8 RGB (alpha dropped or composited), integer-factor box resample via `--resize_factor`,
then a `--max-width` long-side cap preserving aspect; normalized to [0,1] float32 CHW.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from ..core.camera import resolve_image_size


def load_image(
    path: str, resize_factor: int = -1, max_width: int = 3840
) -> np.ndarray:
    """Returns float32 CHW RGB in [0,1].

    Prefers the native C++ decoder (io/native): GIL-free, so dataloader prefetch threads
    decode in true parallel like the reference's worker threads (dataset.hpp:247-259)."""
    if path.lower().endswith((".jpg", ".jpeg", ".png")):
        from . import native_loader

        if native_loader.available():
            try:
                return native_loader.load_image_native(path, resize_factor, max_width)
            except RuntimeError:
                pass  # corrupt header etc. — fall through to PIL
    with Image.open(path) as im:
        im = im.convert("RGB")
        w0, h0 = im.size
        w, h = resolve_image_size(w0, h0, resize_factor, max_width)
        if (w, h) != (w0, h0):
            if resize_factor and resize_factor > 1 and (w0 // resize_factor, h0 // resize_factor) == (w, h):
                im = im.resize((w, h), Image.BOX)  # integer box resample (image_io.cpp)
            else:
                im = im.resize((w, h), Image.LANCZOS)
        arr = np.asarray(im, np.uint8)
    return (arr.astype(np.float32) / 255.0).transpose(2, 0, 1)


def save_image(path: str, img_chw: np.ndarray) -> None:
    """float [3,H,W] in [0,1] -> 8-bit file."""
    arr = np.clip(np.asarray(img_chw), 0.0, 1.0)
    arr = (arr.transpose(1, 2, 0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)
