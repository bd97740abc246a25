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


# ---------------------------------------------------- F10 boilerplate strip
# parity: transformArticleHtml / stripNonArticleElements
# (/root/reference/controllers/textProcessing.js:263-426,543-545)

from horseman_article_parser_spark.operators.textrender import strip_non_article


def test_strip_removes_attr_keyword_nodes():
    html = ('<body><p>Real story text here.</p>'
            '<div class="newsletter-signup"><p>Sign up now.</p></div>'
            '<div id="taboola-feed"><p>Around the web.</p></div></body>')
    out = strip_non_article(html)
    assert "Real story" in out
    assert "Sign up" not in out and "Around the web" not in out


def test_strip_attr_keyword_spares_long_nodes():
    # textLen > 800 disables the attribute rule (textProcessing.js:402)
    long_p = "word " * 200
    html = f'<body><div class="promo"><p>{long_p.strip()}.</p></div></body>'
    assert "word" in strip_non_article(html)


def test_strip_cta_text_rule_sentence_guard():
    # <=400 chars + CTA keyword + <=2 sentences -> removed
    gone = '<body><p>Subscribe to our newsletter today.</p></body>'
    assert "Subscribe" not in strip_non_article(gone)
    # 3 sentences -> kept even with the keyword
    kept = '<body><p>Subscribe now. It helps us. We thank you kindly.</p></body>'
    assert "thank you" in strip_non_article(kept)


def test_strip_anchor_dominated_nodes():
    gone = '<body><p><a href="/x">Read the full ten part series</a></p></body>'
    assert "ten part" not in strip_non_article(gone)
    kept = ('<body><p>The committee met nine times this year; see '
            '<a href="/r">the report</a> for all the details.</p></body>')
    assert "the report" in strip_non_article(kept)


def test_strip_chrome_and_interactive():
    html = ('<body><nav><p>menu</p></nav><p>Body text stays.</p>'
            '<form><input name="q"></form><footer><p>(c) site</p></footer>'
            '<div role="dialog"><p>cookie banner</p></div>'
            '<script>var x=1</script></body>')
    out = strip_non_article(html)
    assert "Body text stays" in out
    for frag in ("menu", "(c) site", "cookie banner", "var x"):
        assert frag not in out


def test_render_texts_strip_boilerplate_flag(spark):
    pages = spark.createDataFrame(
        [(1, '<body><p>Keep me fully.</p>'
             '<div class="sponsored"><p>Buy now.</p></div></body>')],
        ["doc_id", "html"],
    )
    from horseman_article_parser_spark.operators.textrender import render_texts
    out = render_texts(pages, strip_boilerplate=True).collect()[0]
    assert out["texts"]["raw"] == "Keep me fully."
