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

Implementation: a compiled master regex tokenizes the payload into
comments / tags / text runs in C; per-run context hints are computed once
per text run (only CONTENT runs pay the per-word date check).
"""

from __future__ import annotations

import re

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
    "blockquote title figcaption table tr td br hr".split())
# Tags whose raw content is skipped entirely:
RAW_SKIP_TAGS = frozenset({"script", "style"})
INLINE_TAGS = frozenset("a span em strong b i code u small".split())
KNOWN_TAGS = BLOCK_TAGS | RAW_SKIP_TAGS | INLINE_TAGS | {"html", "head", "body"}

_HINT_BY_TAG = {
    "pre": CLS_CODE, "code": CLS_CODE,
    "h1": CLS_TITLE, "h2": CLS_TITLE, "h3": CLS_TITLE, "title": CLS_TITLE,
    "nav": CLS_OTHER, "header": CLS_OTHER, "footer": CLS_OTHER,
    "aside": CLS_OTHER,
    "figcaption": CLS_CAPTION,
    "blockquote": CLS_SUMMARY,
}

# comment | tag | text-run — tokenized in one C-level pass:
_TOKEN_RE = re.compile(r"<!--.*?(?:-->|$)|<[^>]*>|[^<]+", re.DOTALL)

# Tag-token parse memo: web markup reuses a small tag vocabulary (often
# including attributes), so the strip/split/lower work per tag token is
# paid once per distinct token per worker.  Bounded; worker-local.
_TAG_MEMO: dict[str, tuple[bool, bool, str]] = {}


def _parse_tag(tok: str) -> tuple[bool, bool, str]:
    """(closing, self_closing, name) for one ``<...>`` token."""
    info = _TAG_MEMO.get(tok)
    if info is None:
        tag_body = tok[1:-1].strip() if tok.endswith(">") else tok[1:].strip()
        if not tag_body:
            info = (False, False, "")
        else:
            closing = tag_body.startswith("/")
            self_closing = tag_body.endswith("/")
            stripped = tag_body.strip("/")
            name = stripped.split(None, 1)[0].lower() if stripped else ""
            info = (closing, self_closing, name)
        if len(_TAG_MEMO) < 100_000:
            _TAG_MEMO[tok] = info
    return info


def _context_hint(stack: list[str], in_link: bool) -> int:
    """Hint for the current context ignoring per-word date detection;
    innermost relevant tag wins."""
    for tag in reversed(stack):
        if tag in _HINT_BY_TAG:
            return _HINT_BY_TAG[tag]
    return CLS_OTHER if in_link else CLS_CONTENT


def parse_html(payload: str) -> TurnBlocks:
    """Parse one HTML-ish payload into a single-page block tree."""
    line_words, line_hints, line_links = html_line_spec(payload)
    return from_word_lists(
        line_words,
        line_pages=[0] * len(line_words),
        line_hints=line_hints,
        line_links=line_links,
    )


def html_line_spec(
    payload: str,
) -> tuple[list[list[str]], list[list[int]], list[list[int]]]:
    """(line_words, line_hints, line_links) for one HTML-ish payload —
    the per-line intermediate ``parse_html`` feeds to ``from_word_lists``
    (exposed so the batch path can build many turns' blocks in one
    vectorized ``from_word_lists_batch`` pass)."""
    line_words: list[list[str]] = []
    line_hints: list[list[int]] = []
    line_links: list[list[int]] = []
    cur_words: list[str] = []
    cur_hints: list[int] = []
    cur_links: list[int] = []
    stack: list[str] = []
    # eff_stack[i] = hint of the innermost hint-relevant tag among
    # stack[:i+1] (None if none) — incremental replacement for walking
    # the stack per text run (_context_hint semantics, unchanged):
    eff_stack: list[int | None] = []
    link_depth = 0
    skip_until: str | None = None  # inside <script>/<style>

    def flush_line() -> None:
        nonlocal cur_words, cur_hints, cur_links
        if cur_words:
            line_words.append(cur_words)
            line_hints.append(cur_hints)
            line_links.append(cur_links)
            cur_words, cur_hints, cur_links = [], [], []

    for m in _TOKEN_RE.finditer(payload):
        tok = m.group()
        first = tok[0]
        if first != "<":
            # text run
            if skip_until is not None:
                continue
            ws = tok.split()
            if not ws:
                continue
            ctx = eff_stack[-1] if eff_stack else None
            hint = ctx if ctx is not None else (
                CLS_OTHER if link_depth > 0 else CLS_CONTENT)
            link = 1 if link_depth > 0 else 0
            if hint == CLS_CONTENT:
                # date shapes always start with a digit — cheap prefilter
                # before the regex:
                hints = [CLS_DATE if (w[0].isdigit() and DATE_WORD_RE.match(w))
                         else CLS_CONTENT for w in ws]
            else:
                hints = [hint] * len(ws)
            cur_words.extend(ws)
            cur_hints.extend(hints)
            cur_links.extend([link] * len(ws))
            continue
        if tok.startswith("<!--"):
            continue
        closing, self_closing, name = _parse_tag(tok)
        if not name:
            continue
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
            continue
        if name not in KNOWN_TAGS:
            continue  # unknown tag: ignored (closed vocabulary)
        if not closing and name in RAW_SKIP_TAGS and not self_closing:
            # (a self-closing <script/> has no body to skip — entering
            # skip mode for it would silently swallow the whole rest of
            # the document)
            skip_until = name
            continue
        if name in BLOCK_TAGS:
            flush_line()
        if name in ("br", "hr") or self_closing:
            continue
        if closing:
            if name == "a" and link_depth > 0:
                link_depth -= 1
            if name in stack:  # pop to the matching open tag
                while stack:
                    eff_stack.pop()
                    if stack.pop() == name:
                        break
        else:
            if name == "a":
                link_depth += 1
            stack.append(name)
            eff_stack.append(_HINT_BY_TAG.get(
                name, eff_stack[-1] if eff_stack else None))
    flush_line()

    return line_words, line_hints, line_links
