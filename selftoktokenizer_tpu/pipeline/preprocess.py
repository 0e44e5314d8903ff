"""Image preprocessing matching the reference test.py transform stack:
Resize(shortest side) -> CenterCrop -> (x/127.5 - 1)  (test.py:27-31,
SelftokPipeline.py:85-97 NormalizeToTensor)."""

from __future__ import annotations

import numpy as np


def load_image(path, size):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return preprocess_pil(img, size)


def preprocess_pil(img, size):
    """PIL image -> float32 NHWC [1,H,W,3] in [-1,1]."""
    if img.mode != "RGB":
        # grayscale/RGBA/palette inputs must land as 3-channel like the
        # native decoder (JCS_RGB / png_set_gray_to_rgb) and load_image do
        img = img.convert("RGB")
    w, h = img.size
    # torchvision Resize(size): shortest side -> size, long side truncated
    # int(size * long / short) (functional.resize), bilinear
    if w < h:
        nw, nh = size, int(size * h / w)
    else:
        nw, nh = int(size * w / h), size
    img = img.resize((nw, nh), resample=2)  # PIL.Image.BILINEAR
    # torchvision CenterCrop: int(round((dim - size) / 2))
    left = int(round((nw - size) / 2.0))
    top = int(round((nh - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img).astype(np.float32)
    arr = arr / 127.5 - 1.0
    return arr[None, ...]


def to_uint8(images01):
    """[0,1] float NHWC -> uint8."""
    return np.clip(np.asarray(images01) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_image(images01, path):
    from PIL import Image

    arr = to_uint8(images01)
    if arr.ndim == 4:
        arr = arr[0]
    Image.fromarray(arr).save(path)
