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
    __slots__ = ("tag", "attrs", "children", "parent", "_text_parts",
                 "pos", "end", "_all", "_by_tag")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element | str] = []
        self.parent = parent
        # preorder position index, filled by _TreeBuilder: `pos` is this
        # element's 1-based preorder number, `end` the last descendant's;
        # `_all` the document-order element list (element pos i lives at
        # _all[i-1]), `_by_tag` tag → [elements, doc order]. Descendant
        # queries become slice/bisect lookups instead of tree walks.
        self.pos = 0
        self.end = -1
        self._all: list[Element] | None = None
        self._by_tag: dict[str, list[Element]] | None = None

    # ------------------------------------------------------------ query

    def get(self, name: str) -> str | None:
        return self.attrs.get(name)

    @property
    def classes(self) -> list[str]:
        return (self.get("class") or "").split()

    def iter(self):
        """Depth-first descendants (document order), self excluded."""
        if self._all is not None and self.end >= self.pos:
            return iter(self._all[self.pos : self.end])
        return self._iter_walk()

    def _iter_walk(self):
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Element):
                yield node
                stack.extend(reversed(node.children))

    def find_all(self, *tags: str) -> list["Element"]:
        bt = self._by_tag
        if bt is not None and self.end >= self.pos:
            lo, hi = self.pos, self.end
            if len(tags) == 1:
                cand = bt.get(tags[0])
                if not cand:
                    return []
                if lo == 0 and hi >= cand[-1].pos:
                    return list(cand)  # whole-document query
                return [e for e in cand if lo < e.pos <= hi]
            out = [
                e for t in tags for e in bt.get(t, ()) if lo < e.pos <= hi
            ]
            out.sort(key=lambda e: e.pos)
            return out
        want = set(tags)
        return [el for el in self._iter_walk() if el.tag in want]

    def find(self, *tags: str) -> "Element | None":
        bt = self._by_tag
        if bt is not None and self.end >= self.pos:
            lo, hi = self.pos, self.end
            best: Element | None = None
            for t in tags:
                for e in bt.get(t, ()):
                    if e.pos > lo:
                        if e.pos <= hi and (best is None or e.pos < best.pos):
                            best = e
                        break
            return best
        want = set(tags)
        for el in self._iter_walk():
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
        self._all: list[Element] = []
        self._by_tag: dict[str, list[Element]] = {}
        self.root._all = self._all
        self.root._by_tag = self._by_tag
        self.stack = [self.root]
        self._raw_text_tag: str | None = None

    def _new(self, tag, attrs) -> Element:
        parent = self.stack[-1]
        el = Element(tag, dict(attrs), parent)
        self._all.append(el)
        el.pos = len(self._all)
        el._all = self._all
        el._by_tag = self._by_tag
        self._by_tag.setdefault(tag, []).append(el)
        parent.children.append(el)
        return el

    def handle_starttag(self, tag, attrs):
        el = self._new(tag, attrs)
        if tag not in _VOID:
            self.stack.append(el)
            if tag in ("script", "style"):
                self._raw_text_tag = tag
        else:
            el.end = el.pos

    def handle_startendtag(self, tag, attrs):
        el = self._new(tag, attrs)
        el.end = el.pos

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        n = len(self._all)
        stack = self.stack
        # well-formed fast path: the closing tag matches the open element
        if stack[-1].tag == tag and len(stack) > 1:
            stack.pop().end = n
        else:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    for closed in stack[i:]:
                        closed.end = n
                    del stack[i:]
                    break
        if tag in ("script", "style"):
            self._raw_text_tag = None

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    def finalize(self):
        n = len(self._all)
        for el in self.stack:
            el.end = n


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


# --------------------------------------------------------- fast tokenizer
#
# A regex-scanner drive of the SAME _TreeBuilder handlers, mirroring
# html.parser.HTMLParser(convert_charrefs=True) semantics for the
# common constructs (tags/attrs via the stdlib's own tolerant regexes,
# comments, doctype, PI, bogus end tags, script/style raw text,
# charref-decoded data). The stdlib parser spends over half of parse
# time in its buffer-oriented goahead/updatepos machinery, which exists
# for incremental feeds we never do. Any construct this scanner is not
# bit-sure about returns False and parse_html re-parses the document
# with the stdlib path — so the fast path can only ever be a
# performance difference, never a semantic one. Equivalence on the
# reference fixture corpus + adversarial strings is pinned by
# tests/test_extract.py::test_fast_parse_matches_stdlib.

from html.parser import (  # noqa: E402  (stdlib tolerant regexes)
    attrfind_tolerant,
    endtagfind,
    locatestarttagend_tolerant,
    starttagopen,
    tagfind_tolerant,
)

_COMMENT_CLOSE = re.compile(r"--\s*>")
_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE)
    for t in ("script", "style")
}

# Start-tag memo: raw "<tag ...>" slice (no '>' inside attr values) →
# parsed (kind, tag, attrs). Real corpora repeat tag strings heavily
# (markup boilerplate), so the regex+attr parse runs once per DISTINCT
# tag string per worker instead of once per occurrence. Entries are
# immutable (handlers copy attrs via dict()); capped so an adversarial
# corpus of unique tags cannot grow it unboundedly.
_TAG_MEMO: dict[str, tuple[str, str, list]] = {}
_TAG_MEMO_CAP = 1 << 16


def _fast_feed(b: _TreeBuilder, rawdata: str) -> bool:
    """Drive b's handlers over the whole document; False = bail."""
    i, n = 0, len(rawdata)
    cdata: str | None = None
    while i < n:
        if cdata is not None:
            m = _CDATA_CLOSE[cdata].search(rawdata, i)
            if m is None:
                return True  # stdlib drops unterminated cdata content
            if i < m.start():
                b.handle_data(rawdata[i : m.start()])  # raw, no unescape
            b.handle_endtag(cdata)
            cdata = None
            i = m.end()
            continue
        j = rawdata.find("<", i)
        if j < 0:
            b.handle_data(unescape(rawdata[i:]))
            return True
        if i < j:
            b.handle_data(unescape(rawdata[i:j]))
        i = j
        if starttagopen.match(rawdata, i):
            # --- start tag (parse_starttag mirror)
            gt = rawdata.find(">", i)
            if gt > 0:
                inner = rawdata[i + 1:gt]
                if inner.isascii() and inner.isalpha():
                    # bare "<tag>": tagfind_tolerant would match the
                    # whole name, no attrs, end ">" — bit-identical
                    tag = inner.lower()
                    b.handle_starttag(tag, [])
                    if tag in ("script", "style"):
                        cdata = tag
                    i = gt + 1
                    continue
                hit = _TAG_MEMO.get(rawdata[i:gt + 1])
                if hit is not None:
                    kind, tag, attrs = hit
                    if kind == "s":
                        b.handle_starttag(tag, attrs)
                        if tag in ("script", "style"):
                            cdata = tag
                    elif kind == "se":
                        b.handle_startendtag(tag, attrs)
                    else:
                        b.handle_data(tag)
                    i = gt + 1
                    continue
            lm = locatestarttagend_tolerant.match(rawdata, i)
            if lm is None:
                return False
            j2 = lm.end()
            nxt = rawdata[j2 : j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            elif nxt == "/" and rawdata.startswith("/>", j2):
                endpos = j2 + 2
            else:
                return False  # junk/EOF recovery paths: let stdlib do it
            tm = tagfind_tolerant.match(rawdata, i + 1)
            if tm is None:
                return False
            k = tm.end()
            tag = tm.group(1).lower()
            attrs: list[tuple[str, str | None]] = []
            while k < endpos:
                am = attrfind_tolerant.match(rawdata, k)
                if am is None:
                    break
                name, rest, val = am.group(1, 2, 3)
                if not rest:
                    val = None
                elif val[:1] == "'" == val[-1:] or val[:1] == '"' == val[-1:]:
                    val = val[1:-1]
                if val:
                    val = unescape(val)
                attrs.append((name.lower(), val))
                k = am.end()
            end = rawdata[k:endpos].strip()
            if end not in (">", "/>"):
                b.handle_data(rawdata[i:endpos])
                memo_val = ("d", rawdata[i:endpos], None)
            elif end == "/>":
                b.handle_startendtag(tag, attrs)
                memo_val = ("se", tag, attrs)
            else:
                b.handle_starttag(tag, attrs)
                if tag in ("script", "style"):
                    cdata = tag
                memo_val = ("s", tag, attrs)
            # memoize only when the tag ends at the first '>' (an attr
            # value containing '>' makes the slice key ambiguous)
            if (gt > 0 and endpos == gt + 1
                    and len(_TAG_MEMO) < _TAG_MEMO_CAP):
                _TAG_MEMO[rawdata[i:endpos]] = memo_val
            i = endpos
        elif rawdata.startswith("</", i):
            # --- end tag (parse_endtag mirror, non-cdata)
            gt = rawdata.find(">", i + 1)
            if gt < 0:
                return False
            inner = rawdata[i + 2:gt]
            if inner.isascii() and inner.isalpha():
                # bare "</tag>": endtagfind matches exactly this
                b.handle_endtag(inner.lower())
                i = gt + 1
                continue
            em = endtagfind.match(rawdata, i)
            if em is not None:
                b.handle_endtag(em.group(1).lower())
                i = gt + 1
                continue
            nm = tagfind_tolerant.match(rawdata, i + 2)
            if nm is None:
                if rawdata.startswith("</>", i):
                    i += 3
                    continue
                # bogus comment: consume to '>' (handle_comment no-op)
                i = gt + 1
                continue
            gt2 = rawdata.find(">", nm.end())
            if gt2 < 0:
                return False
            b.handle_endtag(nm.group(1).lower())
            i = gt2 + 1
        elif rawdata.startswith("<!--", i):
            cm = _COMMENT_CLOSE.search(rawdata, i + 4)
            if cm is None:
                return False
            i = cm.end()
        elif rawdata.startswith("<?", i):
            gt = rawdata.find(">", i + 2)
            if gt < 0:
                return False
            i = gt + 1
        elif rawdata.startswith("<!", i):
            if rawdata.startswith("<![", i):
                return False  # marked sections: stdlib machinery
            if rawdata[i : i + 9].lower() == "<!doctype":
                gt = rawdata.find(">", i + 9)
            else:
                gt = rawdata.find(">", i + 2)  # bogus comment
            if gt < 0:
                return False
            i = gt + 1
        elif i + 1 < n:
            b.handle_data("<")
            i += 1
        else:
            b.handle_data("<")  # lone trailing '<' (flushed at close)
            return True
    return True


def parse_html(html: str) -> Element:
    builder = _TreeBuilder()
    ok = False
    try:
        ok = _fast_feed(builder, html)
    except Exception:
        ok = False
    if not ok:
        builder = _TreeBuilder()  # discard the partial fast-path tree
        try:
            builder.feed(html)
            builder.close()
        except Exception:
            pass  # lenient: keep whatever tree was built
    builder.finalize()
    return builder.root


def parse_html_stdlib(html: str) -> Element:
    """The stdlib-driven path alone (equivalence-pin oracle)."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass
    builder.finalize()
    return builder.root


def get_by_id(root: Element, node_id: str) -> Element | None:
    for el in root.iter():
        if el.get("id") == node_id:
            return el
    return None


__all__ = ["Element", "parse_html", "clean_ws", "get_by_id", "to_html", "unescape"]
