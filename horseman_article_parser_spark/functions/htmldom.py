"""Minimal DOM over stdlib html.parser, for Arrow-batched extraction UDFs.

The container ships no lxml/bs4, so this is a small, dependency-free
tree parser sufficient for the reference's extraction semantics (title
cascade, meta harvest, link/image walk, caption finder, JSON-LD blocks,
table/dl parsing). It is deliberately lenient, like the browsers/JSDOM
the reference relies on.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_WS = re.compile(r"\s+")


def clean_ws(value: str | None) -> str | None:
    """Collapse whitespace; None for empty — parity with the reference's
    `clean` (/root/reference/index.js:1023-1027)."""
    if value is None:
        return None
    out = _WS.sub(" ", str(value)).strip()
    return out or None


class Element:
    __slots__ = ("tag", "attrs", "children", "parent", "_text_parts")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element | str] = []
        self.parent = parent

    # ------------------------------------------------------------ query

    def get(self, name: str) -> str | None:
        return self.attrs.get(name)

    @property
    def classes(self) -> list[str]:
        return (self.get("class") or "").split()

    def iter(self):
        """Depth-first descendants (document order), self excluded."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Element):
                yield node
                stack.extend(reversed(node.children))

    def find_all(self, *tags: str) -> list["Element"]:
        want = set(tags)
        return [el for el in self.iter() if el.tag in want]

    def find(self, *tags: str) -> "Element | None":
        want = set(tags)
        for el in self.iter():
            if el.tag in want:
                return el
        return None

    def closest(self, tag: str) -> "Element | None":
        node = self.parent
        while node is not None:
            if node.tag == tag:
                return node
            node = node.parent
        return None

    def next_element_sibling(self) -> "Element | None":
        if self.parent is None:
            return None
        seen_self = False
        for child in self.parent.children:
            if child is self:
                seen_self = True
            elif seen_self and isinstance(child, Element):
                return child
        return None

    def text(self) -> str:
        parts: list[str] = []
        stack: list[Element | str] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, str):
                parts.append(node)
            elif node.tag not in ("script", "style"):
                stack.extend(reversed(node.children))
        return "".join(parts)

    def matches_caption_selector(self, selectors: tuple[str, ...]) -> bool:
        """Supports the selector shapes the reference's caption finder
        uses (/root/reference/index.js:1017): tag names, .class, and
        [itemprop="caption"]."""
        for sel in selectors:
            if sel.startswith("."):
                if sel[1:] in self.classes:
                    return True
            elif sel.startswith("["):
                name, _, val = sel[1:-1].partition("=")
                got = self.get(name)
                if got is not None and (not val or got == val.strip('"')):
                    return True
            elif self.tag == sel:
                return True
        return False


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {}, None)
        self.stack = [self.root]
        self._raw_text_tag: str | None = None

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in _VOID:
            self.stack.append(el)
            if tag in ("script", "style"):
                self._raw_text_tag = tag

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Element(tag, dict(attrs), self.stack[-1]))

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break
        if tag in ("script", "style"):
            self._raw_text_tag = None

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def to_html(node: "Element | str") -> str:
    """Serialize a node back to HTML (attribute values escaped, text
    passed through as parsed — entities were already decoded)."""
    from html import escape

    if isinstance(node, str):
        return escape(node, quote=False)
    parts = []
    if node.tag != "#document":
        attrs = "".join(
            f' {k}' if v is None else f' {k}="{escape(str(v))}"'
            for k, v in node.attrs.items()
        )
        parts.append(f"<{node.tag}{attrs}>")
    for child in node.children:
        parts.append(to_html(child))
    if node.tag != "#document" and node.tag not in _VOID:
        parts.append(f"</{node.tag}>")
    return "".join(parts)


def parse_html(html: str) -> Element:
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass  # lenient: keep whatever tree was built
    return builder.root


def get_by_id(root: Element, node_id: str) -> Element | None:
    for el in root.iter():
        if el.get("id") == node_id:
            return el
    return None


__all__ = ["Element", "parse_html", "clean_ws", "get_by_id", "to_html", "unescape"]
