"""SMGT-style annotation record parsing (SURVEY.md §1.3).

Parses bounding-box annotation records of the shape the reference's
labeling jobs emit — ``{image_size: [{height, width, depth}],
annotations: [{class_id, top, left, height, width}]}`` in ABSOLUTE pixels
(``notebooks/src/code/data/smgt.py:18-159``) — and converts them to the
0-1000 normalized x0,y0,x1,y1 space the overlap labeler consumes
(``smgt.py:161-187``: rel = abs/image_dim, then *1000 truncated to long).

The output feeds ``geometry.word_single_labels`` (the M7 >=50%-overlap
word labeler), completing the reference's annotation -> word-label
training-data chain.
"""

from __future__ import annotations

import numpy as np


def parse_annotation_record(record: dict) -> np.ndarray:
    """One SMGT record -> (n, 5) int64 array [class_id, x0, y0, x1, y1]
    with coords in 0-1000 normalized space.

    Raises KeyError/IndexError on malformed records, mirroring the
    reference's strict manifest parsing (``data/base.py:256-265``)."""
    size = record["image_size"][0]
    h, w = float(size["height"]), float(size["width"])
    anns = record.get("annotations", [])
    if not anns:
        return np.zeros((0, 5), dtype=np.int64)
    out = np.zeros((len(anns), 5), dtype=np.int64)
    for i, a in enumerate(anns):
        rel = np.array([
            a["left"] / w,
            a["top"] / h,
            (a["left"] + a["width"]) / w,
            (a["top"] + a["height"]) / h,
        ])
        out[i, 0] = int(a["class_id"])
        out[i, 1:] = (rel * 1000).astype(np.int64)
    return out


def annotation_word_labels(
    record: dict,
    word_boxes_1000: np.ndarray,
    n_classes: int,
) -> np.ndarray:
    """SMGT record + word boxes (0-1000 ints) -> per-word class labels via
    the >=50%-area-overlap rule (geometry.word_single_labels)."""
    from .geometry import word_single_labels

    parsed = parse_annotation_record(record)
    return word_single_labels(
        word_boxes_1000, parsed[:, 1:], parsed[:, 0], n_classes)
