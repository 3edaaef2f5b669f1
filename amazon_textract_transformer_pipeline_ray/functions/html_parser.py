"""HTML-ish payload parser (dialect A): markup -> PAGE/LINE/WORD block tree.

Fills the role of the reference's OCR-engine adapters, which normalize any
engine's output to the Textract-like LINE/WORD + page-normalized-geometry
contract (``ocr_engines/eng_tesseract.py:33-154``, output builder
``ocr_engines/base.py:274-294``): here the "engine" is a lightweight DOM
scan over a closed ~25-tag vocabulary, and the per-word class *hints* carry
the Boilerpipe/trafilatura-style block signals (container tag, link
membership) that the classifier stage turns into class probabilities.

Hint rules (frozen spec, shared with the oracle):
  * inside <script>/<style>/comments  -> text dropped entirely
  * inside <pre> or <code>            -> CODE
  * inside <h1>/<h2>/<h3>/<title>     -> TITLE
  * inside <nav>/<header>/<footer>/<aside> -> OTHER (boilerplate)
  * inside <figcaption>               -> CAPTION
  * inside <blockquote>               -> SUMMARY
  * inside <a> (outside the above)    -> OTHER (nav-style link)
  * word matches a date pattern       -> DATE
  * otherwise                         -> CONTENT
"""

from __future__ import annotations

from .blocks import (
    CLS_CAPTION,
    CLS_CODE,
    CLS_CONTENT,
    CLS_DATE,
    CLS_OTHER,
    CLS_SUMMARY,
    CLS_TITLE,
    DATE_WORD_RE,
    TurnBlocks,
    from_word_lists,
)

# Tags that force a line (block) break when opened or closed:
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 li ul ol nav header footer aside main article pre "
    "blockquote title figcaption table tr td br hr".split()
)
# Tags whose raw content is skipped entirely:
RAW_SKIP_TAGS = frozenset({"script", "style"})
INLINE_TAGS = frozenset("a span em strong b i code u small".split())
KNOWN_TAGS = BLOCK_TAGS | RAW_SKIP_TAGS | INLINE_TAGS | {"html", "head", "body"}

_HINT_BY_TAG = {
    "pre": CLS_CODE,
    "code": CLS_CODE,
    "h1": CLS_TITLE,
    "h2": CLS_TITLE,
    "h3": CLS_TITLE,
    "title": CLS_TITLE,
    "nav": CLS_OTHER,
    "header": CLS_OTHER,
    "footer": CLS_OTHER,
    "aside": CLS_OTHER,
    "figcaption": CLS_CAPTION,
    "blockquote": CLS_SUMMARY,
}
# Priority when nested contexts conflict (innermost-relevant wins by scan
# order below):
_HINT_PRIORITY = ["pre", "code", "h1", "h2", "h3", "title", "nav", "header",
                  "footer", "aside", "figcaption", "blockquote"]


def _hint_for(stack: list[str], in_link: bool, word: str) -> int:
    for tag in reversed(stack):  # innermost relevant context wins
        if tag in _HINT_BY_TAG:
            return _HINT_BY_TAG[tag]
    if in_link:
        return CLS_OTHER
    if DATE_WORD_RE.match(word):
        return CLS_DATE
    return CLS_CONTENT


def parse_html(payload: str) -> TurnBlocks:
    """Parse one HTML-ish payload into a single-page block tree."""
    line_words: list[list[str]] = []
    line_hints: list[list[int]] = []
    line_links: list[list[int]] = []
    cur_words: list[str] = []
    cur_hints: list[int] = []
    cur_links: list[int] = []
    stack: list[str] = []
    link_depth = 0

    def flush_line() -> None:
        nonlocal cur_words, cur_hints, cur_links
        if cur_words:
            line_words.append(cur_words)
            line_hints.append(cur_hints)
            line_links.append(cur_links)
            cur_words, cur_hints, cur_links = [], [], []

    def emit_text(text: str) -> None:
        nonlocal cur_words, cur_hints, cur_links
        for w in text.split():
            cur_words.append(w)
            cur_hints.append(_hint_for(stack, link_depth > 0, w))
            cur_links.append(1 if link_depth > 0 else 0)

    i, n = 0, len(payload)
    while i < n:
        lt = payload.find("<", i)
        if lt == -1:
            emit_text(payload[i:])
            break
        if lt > i:
            emit_text(payload[i:lt])
        if payload.startswith("<!--", lt):
            end = payload.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        gt = payload.find(">", lt + 1)
        if gt == -1:  # stray '<': treat rest as text
            emit_text(payload[lt:])
            break
        tag_body = payload[lt + 1 : gt].strip()
        i = gt + 1
        if not tag_body:
            continue
        closing = tag_body.startswith("/")
        self_closing = tag_body.endswith("/")
        name = tag_body.strip("/").split()[0].lower() if tag_body.strip("/") else ""
        if name not in KNOWN_TAGS:
            continue  # unknown tag: ignored (closed vocabulary)
        if not closing and name in RAW_SKIP_TAGS:
            # Skip raw content up to the matching close tag:
            close = payload.find(f"</{name}", i)
            if close == -1:
                i = n
            else:
                gt2 = payload.find(">", close)
                i = n if gt2 == -1 else gt2 + 1
            continue
        if name in BLOCK_TAGS:
            flush_line()
        if name in ("br", "hr") or self_closing:
            continue
        if closing:
            if name == "a" and link_depth > 0:
                link_depth -= 1
            # Pop to the matching open tag if present:
            if name in stack:
                while stack:
                    if stack.pop() == name:
                        break
        else:
            if name == "a":
                link_depth += 1
            stack.append(name)
    flush_line()

    return from_word_lists(
        line_words,
        line_pages=[0] * len(line_words),
        line_hints=line_hints,
        line_links=line_links,
    )
