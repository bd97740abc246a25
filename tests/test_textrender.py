"""F7/F11/F12/X10 text renderings and selector strip
(/root/reference/controllers/textProcessing.js)."""

from horseman_article_parser_spark.operators.textrender import (
    formatted_text,
    html_text,
    raw_text,
    render_texts,
    strip_tags,
)

PAGE = (
    "<html><body><article>"
    "<h2>Section Heading</h2>"
    "<p>First paragraph with enough words to matter.</p>"
    '<figure><img src="/x.png" alt="a"><figcaption>A caption to drop</figcaption></figure>'
    "<p>Visit https://example.com/page for details.</p>"
    "<p>Second paragraph follows</p><p>And third continues here.</p>"
    "</article></body></html>"
)


def test_raw_text_drops_images_and_urls():
    raw = raw_text(PAGE)
    assert "caption to drop" not in raw
    assert "https://" not in raw and "example.com" not in raw
    assert "First paragraph" in raw
    # newline between sentence-ish lines becomes '. ' then collapses
    assert "Second paragraph follows. And third continues here." in raw


def test_formatted_text_headings_and_title():
    fmt = formatted_text(PAGE, title="My Story")
    assert fmt.startswith("MY STORY\n\n")
    assert "SECTION HEADING" in fmt
    assert "A caption to drop" in fmt  # formatted keeps captions
    assert "\n\n" in fmt.split("MY STORY")[1]


def test_html_text_spans_every_line():
    got = html_text("line one\nline two")
    assert got == "<span>line one</span>\n<span>line two</span>"
    assert html_text(None) == ""


def test_strip_tags_selectors():
    html = (
        '<html><body><div id="ad">AD</div><aside>side</aside>'
        '<p class="promo">promo text</p><p>keep me</p></body></html>'
    )
    out = strip_tags(html, ["aside", ".promo", "#ad"])
    assert "keep me" in out
    assert "AD" not in out and "side" not in out and "promo text" not in out
    # structure preserved for the rest
    assert "<body>" in out and "<p>keep me</p>" in out


def test_render_texts_dataframe(spark):
    df = spark.createDataFrame(
        [(0, PAGE, "My Story"), (1, None, None)],
        "doc_id long, html string, title string",
    )
    rows = {
        r.doc_id: r
        for r in render_texts(df, title_col="title").select("doc_id", "texts.*").collect()
    }
    assert rows[0].formatted.startswith("MY STORY")
    assert rows[0].html.startswith("<span>MY STORY</span>")
    assert rows[1].raw == ""
