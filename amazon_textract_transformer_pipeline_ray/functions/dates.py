"""Scalar value normalizers.

The reference normalizes field values through a seq2seq endpoint trained on
a synthetic date-normalization task
(``notebooks/src/code/data/seq2seq/date_normalization.py:31-226``, client
``fn-postprocess/util/normalize.py:26-91``).  Our self-contained analog is a
deterministic strftime-driven date normalizer: recognize a closed set of
observed formats and rewrite to ISO ``YYYY-MM-DD``; unparseable inputs pass
through unchanged (the reference's endpoint likewise echoes on failure).
"""

from __future__ import annotations

import re
from typing import Callable

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "jan feb mar apr may jun jul aug sep oct nov dec".split()
    )
}

_PATTERNS: list[tuple[re.Pattern, Callable[[re.Match], tuple[int, int, int]]]] = [
    # YYYY-MM-DD
    (re.compile(r"^(\d{4})-(\d{2})-(\d{2})$"),
     lambda m: (int(m[1]), int(m[2]), int(m[3]))),
    # DD/MM/YYYY (the generator's convention)
    (re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{4})$"),
     lambda m: (int(m[3]), int(m[2]), int(m[1]))),
    # DD.MM.YYYY
    (re.compile(r"^(\d{2})\.(\d{2})\.(\d{4})$"),
     lambda m: (int(m[3]), int(m[2]), int(m[1]))),
    # Mon DD, YYYY  /  Mon DD YYYY
    (re.compile(r"^([A-Za-z]{3})[a-z]*\.? (\d{1,2}),? (\d{4})$"),
     lambda m: (int(m[3]), _MONTHS.get(m[1].lower()[:3], 0), int(m[2]))),
    # DD Mon YYYY
    (re.compile(r"^(\d{1,2}) ([A-Za-z]{3})[a-z]*\.? (\d{4})$"),
     lambda m: (int(m[3]), _MONTHS.get(m[2].lower()[:3], 0), int(m[1]))),
]


def normalize_date_iso(text: str) -> str:
    """Rewrite a recognized date string to YYYY-MM-DD; echo otherwise."""
    s = text.strip().rstrip(".,;:")
    for pat, fn in _PATTERNS:
        m = pat.match(s)
        if m:
            y, mo, d = fn(m)
            if 1 <= mo <= 12 and 1 <= d <= 31:
                return f"{y:04d}-{mo:02d}-{d:02d}"
    return text


NORMALIZERS: dict[str, Callable[[str], str]] = {"date_iso": normalize_date_iso}
