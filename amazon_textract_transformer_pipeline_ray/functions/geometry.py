"""Geometry kernels.

* 0-1000 LayoutLM-style box quantization — semantics of
  ``notebooks/src/code/data/geometry.py:50-64`` ((x * 1000).astype(long),
  i.e. truncation toward zero of page-normalized 0-1 floats).
* Bounding-box union — semantics of ``UniversalBox.aggregate``
  (``pipeline/postprocessing/fn-postprocess/util/boxes.py:202-232``) in the
  top-left-origin (inverted-y) space Textract uses.
* >=50%-area overlap word labeler — semantics of
  ``notebooks/src/code/data/ner.py:38-152``.
"""

from __future__ import annotations

import numpy as np


def quantize_boxes(boxes01: np.ndarray) -> np.ndarray:
    """(n, 4) float 0-1 [x0, y0, x1, y1] -> (n, 4) int64 0-1000.

    Matches geometry.py:59-64: multiply by 1000, truncate toward zero.
    """
    arr = np.asarray(boxes01, dtype=np.float64)
    if arr.size == 0:
        return np.zeros((0, 4), dtype=np.int64)
    return (arr * 1000).astype(np.int64)


def union_box(boxes: np.ndarray) -> np.ndarray:
    """Minimal box containing all input boxes (x0,y0,x1,y1 rows).

    boxes.py:224-231 with inverted_y=True (y grows downward):
    top=min, bottom=max, left=min, right=max.
    """
    arr = np.asarray(boxes)
    if arr.size == 0:
        raise ValueError("Cannot aggregate with no boxes")  # boxes.py:217-218
    return np.array(
        [arr[:, 0].min(), arr[:, 1].min(), arr[:, 2].max(), arr[:, 3].max()],
        dtype=arr.dtype,
    )


def word_label_matrix(
    word_boxes: np.ndarray,
    ann_boxes: np.ndarray,
    ann_class_ids: np.ndarray,
    n_classes: int,
) -> np.ndarray:
    """(n_words, n_classes) 0/1 matrix: 1 where >=50% of the word's area
    intersects an annotation box of that class (ner.py:38-118).

    All boxes are (n, 4) [x0, y0, x1, y1] in the same (0-1000) space.
    Words with no match are implicitly "other" = class n_classes-1.
    """
    word_boxes = np.asarray(word_boxes, dtype=np.float64)
    n_words = len(word_boxes)
    if len(ann_boxes) == 0:  # ner.py:63-68
        return np.concatenate(
            [np.zeros((n_words, n_classes - 1)), np.ones((n_words, 1))], axis=1
        )
    ann_boxes = np.asarray(ann_boxes, dtype=np.float64)
    ann_class_ids = np.asarray(ann_class_ids)

    word_areas = (word_boxes[:, 2] - word_boxes[:, 0]) * (
        word_boxes[:, 3] - word_boxes[:, 1]
    )
    # Pairwise intersection areas via broadcasting (ner.py:79-96 uses tiling;
    # broadcasting computes the same matrices).
    ix_r = np.minimum(word_boxes[:, 2:3], ann_boxes[None, :, 2])
    ix_l = np.maximum(word_boxes[:, 0:1], ann_boxes[None, :, 0])
    ix_b = np.minimum(word_boxes[:, 3:4], ann_boxes[None, :, 3])
    ix_t = np.maximum(word_boxes[:, 1:2], ann_boxes[None, :, 1])
    isect = np.maximum(0, ix_r - ix_l) * np.maximum(0, ix_b - ix_t)
    matches = np.where(isect >= (word_areas / 2)[:, None], 1.0, 0.0)  # ner.py:98-103

    result = np.zeros((n_words, n_classes))
    for class_id in range(n_classes):  # ner.py:108-110
        result[:, class_id] = np.any(matches[:, ann_class_ids == class_id], axis=1)
    result[:, n_classes - 1] = np.where(  # ner.py:112-116
        np.any(result, axis=1), result[:, n_classes - 1], 1.0
    )
    return result


def word_single_labels(
    word_boxes: np.ndarray,
    ann_boxes: np.ndarray,
    ann_class_ids: np.ndarray,
    n_classes: int,
) -> np.ndarray:
    """Single class id per word; ties -> lowest class id; none -> other
    (ner.py:121-152)."""
    m = word_label_matrix(word_boxes, ann_boxes, ann_class_ids, n_classes)
    return np.where(np.sum(m, axis=1) == 0, n_classes - 1, np.argmax(m, axis=1))
