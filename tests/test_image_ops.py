"""Pure-numpy resize/letterbox kernel (functions/image_ops.py) vs the
reference resize_image sizing rules (image_utils.py:82-168), with
hand-computed pixel values for the bilinear resampler."""

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_ray.functions.image_ops import (
    resize_bilinear,
    resize_image_array,
    resolve_size,
)


def test_resolve_size_square():
    assert resolve_size(100, 50, 224) == (224, 224)
    assert resolve_size(100, 50, (320, 240)) == (320, 240)


def test_resolve_size_short_edge():
    # landscape 40x20: short edge is height -> size=10 gives (20, 10)
    assert resolve_size(40, 20, 10, default_square=False) == (20, 10)
    # portrait 20x40: short edge is width -> (10, 20)
    assert resolve_size(20, 40, 10, default_square=False) == (10, 20)
    # already matching short edge: early-return original dims
    assert resolve_size(20, 40, 20, default_square=False) == (20, 40)


def test_resolve_size_max_size():
    # 20x40 at size=10 -> long edge 20 > max_size 15
    # -> short = int(15*10/20) = 7, long = 15
    assert resolve_size(20, 40, 10, default_square=False,
                        max_size=15) == (7, 15)
    with pytest.raises(ValueError):
        resolve_size(20, 40, 10, default_square=False, max_size=10)


def test_bilinear_hand_computed_1d():
    """2 -> 4 px with center-aligned sampling: src = (d+0.5)/2 - 0.5
    gives [-0.25, 0.25, 0.75, 1.25] -> clamped lerp of (0, 100) =
    [0, 25, 75, 100]."""
    img = np.array([[[0], [100]]], dtype=np.uint8)  # (1, 2, 1)
    out = resize_bilinear(img, 4, 1)
    assert out.reshape(-1).tolist() == [0, 25, 75, 100]


def test_bilinear_hand_computed_2d():
    """2x2 -> 4x4: separable product of the 1-D weights above."""
    img = np.array([[[0], [100]], [[200], [100]]], dtype=np.uint8)
    out = resize_bilinear(img, 4, 4).reshape(4, 4)
    # rows sample y at weights [1, .75/.25, .25/.75, 0] over (top, bottom):
    top = np.array([0, 25, 75, 100], dtype=np.float64)
    bot = np.array([200, 175, 125, 100], dtype=np.float64)
    expect = np.round(np.stack([
        top, 0.75 * top + 0.25 * bot, 0.25 * top + 0.75 * bot, bot]))
    assert (out == expect.astype(np.uint8)).all()


def test_identity_passthrough():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert resize_image_array(img, (4, 2)) is img


def test_letterbox_hand_computed():
    """2x4 portrait into a 4x4 canvas, color (7, 8, 9): scale = 1, image
    pasted centered at x=1 — columns 0 and 3 are background."""
    img = np.full((4, 2, 3), 50, dtype=np.uint8)
    out = resize_image_array(img, 4, letterbox_color=(7, 8, 9))
    assert out.shape == (4, 4, 3)
    assert (out[:, 1:3] == 50).all()
    assert (out[:, 0] == [7, 8, 9]).all() and (out[:, 3] == [7, 8, 9]).all()


def test_stretch_shapes():
    img = np.zeros((30, 20, 3), dtype=np.uint8)
    assert resize_image_array(img, 8).shape == (8, 8, 3)
    assert resize_image_array(img, 8, default_square=False).shape == (12, 8, 3)
    assert resize_image_array(
        img, 8, default_square=False, max_size=10).shape == (10, 6, 3)


def test_resize_stage_roundtrip(ray_session):
    """The ImageResize actor stage emits decodable containers with the
    letterboxed dims."""
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.multimodal import (
        ImageResize, decode_fake, gen_media_table)

    ds = rd.from_arrow(gen_media_table(12))
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"target": 24, "letterbox_color": (0, 0, 0)},
        batch_format="pyarrow", batch_size=8, concurrency=2).to_pandas()
    images = out[out["kind"] == "image"]
    assert len(images) > 0
    for _, r in images.iterrows():
        kind, arr = decode_fake(r["payload"])
        assert kind == "image" and arr.shape == (24, 24, 3)
        assert r["width"] == 24 and r["height"] == 24
