"""Pure-numpy image resize / letterbox (reference M8).

Reproduces the SIZE SEMANTICS of the reference's ``resize_image``
(``notebooks/preproc/textract_transformers/image_utils.py:82-168``)
without the PIL dependency:

  * ``size`` a single int + ``default_square=True``  -> (size, size);
  * single int + ``default_square=False`` -> match the SHORTER edge to
    ``size``, preserve aspect ratio (early-return when already equal);
  * ``max_size`` (short-edge mode only): if the longer edge exceeds it
    after the initial scale, rescale so the longer edge equals
    ``max_size`` (the short edge may then undershoot ``size``);
    ``max_size <= size`` raises ValueError;
  * ``letterbox_color`` set -> scale by min(w/iw, h/ih), center on a
    solid canvas of the target size; unset -> plain stretch.

Documented divergences from the reference:
  * interpolation is BILINEAR (hand-rolled, center-aligned sampling like
    PIL's convention) instead of PIL BICUBIC — PIL is absent here and
    the cubic kernel buys nothing for the contract tests;
  * the reference's letterbox branch ``return result.paste(...)``
    returns ``None`` (PIL ``paste`` mutates in place) — an apparent
    bug we do NOT reproduce: we return the composed canvas.

All functions take/return ``(h, w, c)`` uint8 arrays but express sizes
as (width, height) pairs, matching the PIL calling convention the
reference uses.
"""

from __future__ import annotations

import numpy as np


def resolve_size(
    in_w: int,
    in_h: int,
    size: int | tuple[int, int],
    default_square: bool = True,
    max_size: int | None = None,
) -> tuple[int, int]:
    """Target (width, height) per image_utils.py:125-152."""
    if not hasattr(size, "__len__"):
        size = (size,)
    if len(size) == 1:
        if default_square:
            return int(size[0]), int(size[0])
        short = int(size[0])
        ishort, ilong = (in_w, in_h) if in_w <= in_h else (in_h, in_w)
        if short == ishort:
            return in_w, in_h  # early-return: no resize needed
        long = int(short * ilong / ishort)
        if max_size is not None:
            if max_size <= short:
                raise ValueError(
                    f"max_size = {max_size} must be strictly greater than "
                    f"the requested size for the smaller edge = {short}")
            if long > max_size:
                short, long = int(max_size * short / long), max_size
        return (short, long) if in_w <= in_h else (long, short)
    w, h = size
    return int(w), int(h)


def _axis_lerp(arr: np.ndarray, out_len: int, axis: int) -> np.ndarray:
    """Separable 1-D linear resample along ``axis`` with center-aligned
    sample positions: src = (dst + 0.5) * in/out - 0.5, edges clamped."""
    in_len = arr.shape[axis]
    if in_len == out_len:
        return arr
    src = (np.arange(out_len) + 0.5) * (in_len / out_len) - 0.5
    src = np.clip(src, 0.0, in_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = src - lo
    a = np.take(arr, lo, axis=axis).astype(np.float64)
    b = np.take(arr, hi, axis=axis).astype(np.float64)
    shape = [1] * arr.ndim
    shape[axis] = out_len
    f = frac.reshape(shape)
    return a * (1.0 - f) + b * f


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(h, w, c) uint8 -> (out_h, out_w, c) uint8, bilinear."""
    out = _axis_lerp(_axis_lerp(img, out_h, axis=0), out_w, axis=1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_image_array(
    img: np.ndarray,
    size: int | tuple[int, int] = (224, 224),
    default_square: bool = True,
    letterbox_color: tuple[int, int, int] | None = None,
    max_size: int | None = None,
) -> np.ndarray:
    """numpy counterpart of reference ``resize_image`` (semantics above)."""
    in_h, in_w = img.shape[:2]
    w, h = resolve_size(in_w, in_h, size, default_square, max_size)
    if letterbox_color is not None:
        # image_utils.py:153-165 — scale to fit, center on a solid canvas:
        scale = min(w / in_w, h / in_h)
        nw, nh = int(in_w * scale), int(in_h * scale)
        canvas = np.empty((h, w, img.shape[2]), dtype=np.uint8)
        canvas[:, :] = np.asarray(letterbox_color, dtype=np.uint8)
        x0, y0 = (w - nw) // 2, (h - nh) // 2
        canvas[y0:y0 + nh, x0:x0 + nw] = resize_bilinear(img, nw, nh)
        return canvas
    if (w, h) == (in_w, in_h):
        return img
    return resize_bilinear(img, w, h)
