"""Image output / input.

Reference capability: ``Screen`` (``/root/reference/src/screen.cpp:13-92``): clamp to
[0,1], 8-bit quantize, BMP write via stb (screen.cpp:38-49).  The y-flip the
reference applies in ``setPixel`` (screen.cpp:30-36) is already baked into our ray
generation (image-row order), so buffers here are written as-is.  PNG is the default
container; BMP is kept for byte-level parity workflows.  Reading supports loading
target images for the inverse-rendering loop (the reference's ``Image`` texture
loader, src/image.cpp, is a stub that never affects renders — SURVEY §0).
"""
from __future__ import annotations

import numpy as np


def to_u8(img) -> np.ndarray:
    """Clamp to [0,1] and quantize to u8 — parity with screen.cpp:41-44
    (``u8vec4(vec4(clamp(color)) * 255.0f)``: truncation, not rounding)."""
    arr = np.asarray(img, np.float32)
    return (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)


def write_png(path: str, img) -> None:
    from PIL import Image

    Image.fromarray(to_u8(img), mode="RGB").save(path)


def write_bmp(path: str, img) -> None:
    from PIL import Image

    Image.fromarray(to_u8(img), mode="RGB").save(path, format="BMP")


def read_image(path: str) -> np.ndarray:
    """Load an image as float32 [H, W, 3] in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    return arr
