"""Text renderings and selector stripping (SURVEY §2.2 F7/F11/F12,
§2.7 X10).

Behavior-parity reimplementations of the reference's text pipeline
(/root/reference/controllers/textProcessing.js):

- strip_tags      ≈ striptags option (/root/reference/index.js:801-828):
  remove nodes matching tag / .class / #id selectors before analysis.
- raw_text        ≈ getRawText (textProcessing.js:478-500): images and
  their captions dropped (stripImagesForRawText :428-477), bracketed
  URL-ish segments blanked, URL tokens stripped (urlSanitizer
  families), newline-between-sentences → '. ' join, whitespace
  collapse. The reference renders via html-to-text; here block text
  comes from the DOM walk directly (same visible-text semantics).
- formatted_text  ≈ getFormattedText (:501-519): UPPERCASED title +
  blank-line-separated blocks, headings uppercased.
- html_text       ≈ getHtmlText (:520-529): each line span-wrapped —
  faithful string-op port of the published behavior (pure string ops).

All are pure Python kernels surfaced through one Arrow pass
(`render_texts`), emitting struct(raw, formatted, html).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.htmldom import Element, clean_ws, parse_html, to_html

_BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li blockquote pre td th dt dd figcaption".split()
)
_HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())
_IMAGE_WRAPPERS = frozenset("figure picture img figcaption".split())
_CAPTION_CLASSES = frozenset(
    "caption image-caption media-caption wp-caption-text gallery-caption".split()
)
_URL_RES = [
    re.compile(r"data:[^\s]+", re.I),
    re.compile(r"(?:https?|ftp)://[^\s]+", re.I),
    re.compile(r"www\.[^\s]+", re.I),
    re.compile(r"\b[a-z0-9-]+(?:\.[a-z0-9-]+){2,}(?:/[^\s]*)?\b", re.I),
]
_BRACKET_RE = re.compile(r"\[[^\]]*\]")
_SENTENCE_JOIN_RE = re.compile(
    r"(?<=[\w])\s*\n+\s*(?=[\"'(‘’“”]*[A-Z0-9])"
)


def _matches(el: Element, selector: str) -> bool:
    if selector.startswith("."):
        return selector[1:] in el.classes
    if selector.startswith("#"):
        return el.get("id") == selector[1:]
    return el.tag == selector.lower()


def strip_tags(html: str | None, selectors: list[str]) -> str | None:
    """F7: serialize the DOM minus any node matching the selectors."""
    if html is None:
        return None
    root = parse_html(html)

    def prune(node: Element) -> None:
        node.children = [
            c for c in node.children
            if not (isinstance(c, Element) and any(_matches(c, s) for s in selectors))
        ]
        for c in node.children:
            if isinstance(c, Element):
                prune(c)

    prune(root)
    return to_html(root)


def _is_caption(el: Element) -> bool:
    return el.tag == "figcaption" or any(c in _CAPTION_CLASSES for c in el.classes)


def _blocks(root: Element, drop_images: bool) -> list[tuple[str, str]]:
    """(tag, text) per block element in document order, skipping nested
    duplicates and (optionally) image/caption subtrees (F11)."""
    out: list[tuple[str, str]] = []

    def walk(node: Element) -> None:
        for c in node.children:
            if not isinstance(c, Element):
                continue
            if drop_images and (c.tag in _IMAGE_WRAPPERS or _is_caption(c)):
                continue
            if c.tag in _BLOCK_TAGS:
                txt = clean_ws(c.text())
                if txt:
                    out.append((c.tag, txt))
                continue  # block's inner blocks (li>p) collapse into it
            walk(c)

    walk(root)
    return out


def _strip_urlish(text: str) -> str:
    text = _BRACKET_RE.sub(
        lambda m: " " if any(p.search(m.group(0)[1:-1]) for p in _URL_RES) else m.group(0),
        text,
    )
    for pat in _URL_RES:
        text = pat.sub(" ", text)
    return text


def raw_text(html: str | None) -> str:
    if not html:
        return ""
    root = parse_html(html)
    lines = "\n".join(t for _, t in _blocks(root, drop_images=True))
    lines = _strip_urlish(lines)
    lines = lines.replace("\r\n", "\n")
    lines = _SENTENCE_JOIN_RE.sub(". ", lines)
    lines = re.sub(r"\n+", " ", lines)
    return re.sub(r"\s+", " ", lines).strip()


def formatted_text(html: str | None, title: str | None = None) -> str:
    head = (title or "").upper()
    if not html:
        return head + "\n\n" if head else ""
    root = parse_html(html)
    parts = []
    for tag, txt in _blocks(root, drop_images=False):
        parts.append(txt.upper() if tag in _HEADING_TAGS else txt)
    return head + "\n\n" + "\n\n".join(parts)


def html_text(text: str | None) -> str:
    """X10 getHtmlText (textProcessing.js:520-529): wrap each line in a
    span (the reference skips nothing in practice — its index==length
    guard can never fire inside forEach — so every line wraps)."""
    if text is None:
        return ""
    lines = text.replace("\r\n", "\n", 1).split("\n")
    return "\n".join(f"<span>{line}</span>" for line in lines)


TEXTS_STRUCT = T.StructType(
    [
        T.StructField("raw", T.StringType()),
        T.StructField("formatted", T.StringType()),
        T.StructField("html", T.StringType()),
    ]
)


def render_texts(pages: DataFrame, id_col: str = "doc_id",
                 html_col: str = "html", title_col: str | None = None) -> DataFrame:
    """One Arrow pass → struct(raw, formatted, html) per page."""
    cols = [id_col, html_col] + ([title_col] if title_col else [])
    out_schema = T.StructType(
        [pages.schema[id_col], T.StructField("texts", TEXTS_STRUCT)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            titles = pdf[title_col] if title_col else [None] * len(pdf)
            rows = []
            for h, t in zip(pdf[html_col], titles):
                raw = raw_text(h)
                fmt = formatted_text(h, t)
                rows.append({"raw": raw, "formatted": fmt, "html": html_text(fmt)})
            yield pd.DataFrame({id_col: pdf[id_col], "texts": rows})

    return pages.select(*cols).mapInPandas(run, schema=out_schema)
