"""HTML text extraction (pure, stdlib-only).

Stands in for the reference's OCR extractor (`extract_text`,
/root/reference/database.py:111-131): binary payload in, normalized text out.
Strips <script>/<style> subtrees, concatenates all text nodes, decodes
character references (so ``&#x200B;`` in markup becomes the zero-width-space
character). The *warmed-parser* requirement of the north rule is satisfied by
:class:`ReusableExtractor`: one parser object per actor, reset per document —
construction cost (superclass state, regex machinery) is paid once.

Extraction is a pure per-row function of the html bytes — no shared mutable
state — so output is batch-size- and parallelism-invariant (the byte-identity
test depends on this).
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_TAGS = frozenset({"script", "style"})


class _TextParser(HTMLParser):
    """Collects character data outside <script>/<style> subtrees."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.parts.append(data)

    def reset_doc(self) -> None:
        self.reset()  # HTMLParser state machine reset
        self.parts = []
        self._skip_depth = 0


class ReusableExtractor:
    """Warmed parser: build once (per actor), call per document."""

    def __init__(self) -> None:
        self._parser = _TextParser()

    def extract(self, html: bytes | str | None) -> str:
        if html is None:
            return ""
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = bytes(html).decode("utf-8", errors="replace")
        p = self._parser
        p.reset_doc()
        try:
            p.feed(html)
            p.close()
        except Exception:
            # Malformed markup: keep whatever text was collected (the
            # reference logs extractor errors and moves on,
            # database.py:128-130).
            pass
        return "".join(p.parts)


def extract_text(html: bytes | str | None) -> str:
    """One-shot convenience wrapper (tests / oracle)."""
    return ReusableExtractor().extract(html)
