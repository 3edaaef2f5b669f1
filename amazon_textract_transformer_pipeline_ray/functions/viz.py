"""Human spot-check rendering of extraction output — the text-engine
analog of the reference's entity/box overlay notebook helpers
(``notebooks/util/viz.py:38-373`` draws boxes on page images; a
transcript engine renders inline span markup and an ASCII page-geometry
sketch instead).

Pure functions over already-extracted rows — debug tooling only, never
on the hot path; the CLI surface is ``python -m <pkg> render``.
"""

from __future__ import annotations

from typing import Iterable, Mapping

# Reference viz.py assigns a color per entity class; the terminal analog
# is a bracket tag carrying class name + confidence.
_SPAN_OPEN = "⟦"   # ⟦
_SPAN_CLOSE = "⟧"  # ⟧


def render_turn_text(extracted_text: str,
                     spans: Iterable[Mapping],
                     with_confidence: bool = True) -> str:
    """Inline span markup: ``⟦class|0.92 matched text⟧`` spliced at the
    recorded character offsets.  Spans are rendered in ``start`` order;
    overlapping spans nest by insertion order (the assembler emits
    non-overlapping spans, so nesting only appears on malformed input —
    which is exactly what a human spot-check wants to see)."""
    marks: list[tuple[int, int, str]] = []  # (pos, order, insert-text)
    for i, s in enumerate(sorted(spans, key=lambda s: (s["start"], s["end"]))):
        conf = (f"|{float(s['confidence']):.2f}" if with_confidence else "")
        marks.append((int(s["start"]), i, f"{_SPAN_OPEN}{s['class_name']}{conf} "))
        marks.append((int(s["end"]), i, _SPAN_CLOSE))
    out: list[str] = []
    pos = 0
    for at, _, ins in sorted(marks, key=lambda m: (m[0], m[1])):
        at = max(0, min(at, len(extracted_text)))
        out.append(extracted_text[pos:at])
        out.append(ins)
        pos = at
    out.append(extracted_text[pos:])
    return "".join(out)


def render_page_sketch(spans: Iterable[Mapping], page: int = 1,
                       width: int = 60, height: int = 16) -> str:
    """ASCII sketch of a page's span geometry (the box-overlay analog):
    each span's (x0,y0)-(x1,y1) box — reference-style 0..1000 normalized
    coordinates — is drawn as its class name's first letter on a
    ``width`` x ``height`` grid; later spans overwrite earlier ones only
    on blank cells, so collisions stay visible as mixed letters."""
    grid = [[" "] * width for _ in range(height)]
    for s in spans:
        if int(s.get("page", 1)) != page:
            continue
        letter = (s.get("class_name") or "?")[0]
        c0 = min(width - 1, max(0, int(s["x0"]) * width // 1000))
        c1 = min(width - 1, max(0, (int(s["x1"]) - 1) * width // 1000))
        r0 = min(height - 1, max(0, int(s["y0"]) * height // 1000))
        r1 = min(height - 1, max(0, (int(s["y1"]) - 1) * height // 1000))
        for r in range(r0, r1 + 1):
            for c in range(c0, c1 + 1):
                if grid[r][c] == " ":
                    grid[r][c] = letter
    border = "+" + "-" * width + "+"
    return "\n".join([border] + ["|" + "".join(row) + "|" for row in grid]
                     + [border])


def render_turn(row: Mapping, sketch: bool = True) -> str:
    """One turn's full spot-check block: header, inline markup, and the
    per-page geometry sketches."""
    spans = list(row.get("spans") or [])
    head = (f"=== {row['conv_id']} turn {row['turn_idx']} "
            f"role={row['role']} conf={float(row['doc_confidence']):.2f} "
            f"spans={len(spans)}"
            + (" [REVIEW]" if row.get("review_needed") else "") + " ===")
    parts = [head, render_turn_text(row["extracted_text"], spans)]
    if sketch and spans:
        for page in sorted({int(s.get("page", 1)) for s in spans}):
            parts.append(f"--- page {page} ---")
            parts.append(render_page_sketch(spans, page=page))
    return "\n".join(parts)
