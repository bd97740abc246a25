"""S2/S3/S4 feed-source parity with the reference's extractFromRSS /
extractFromSitemap (/root/reference/scripts/fetch-curated-urls.js)."""

import pyspark.sql.functions as F

from horseman_article_parser_spark.sources.feeds import (
    extract_feed_links,
    read_feeds_file,
    rss_links_col,
    sitemap_links_col,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Example</title>
<link>https://ex.com/</link>
<item><title>A</title><link>https://ex.com/a</link><guid>https://ex.com/guid-a</guid></item>
<item><title>B</title><link>https://ex.com/b</link></item>
<item><title>C</title><link>https://ex.com/</link><guid><![CDATA[https://ex.com/guid-c]]></guid></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>Atom Example</title>
<link rel="self" href="https://ex.com/feed.xml"/>
<link rel="alternate" href="https://ex.com/"/>
<entry><title>X</title><link rel="alternate" href="https://ex.com/x"/><id>urn:x</id></entry>
<entry><title>Y</title><link href="https://ex.com/y"/></entry>
</feed>"""

SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://ex.com/p1</loc><lastmod>2024-01-01</lastmod></url>
<url><loc>https://ex.com/p2</loc></url>
</urlset>"""


def _links(spark, xml, col_fn):
    return spark.createDataFrame([(xml,)], "xml string").select(
        col_fn("xml").alias("links")
    ).collect()[0]["links"]


def test_rss_item_links_with_guid(spark):
    # reference pushes link then guid per item; item C's link equals the
    # channel link so guid replaces it (fetch-curated-urls.js:157-165)
    got = _links(spark, RSS, rss_links_col)
    assert got == [
        "https://ex.com/a", "https://ex.com/guid-a",
        "https://ex.com/b",
        "https://ex.com/guid-c",
    ]


def test_atom_entry_links(spark):
    got = _links(spark, ATOM, rss_links_col)
    assert got == ["https://ex.com/x", "urn:x", "https://ex.com/y"]


def test_sitemap_locs(spark):
    assert _links(spark, SITEMAP, sitemap_links_col) == [
        "https://ex.com/p1", "https://ex.com/p2",
    ]


def test_extract_feed_links_dispatch_and_positions(spark):
    feeds = spark.createDataFrame(
        [("f1", RSS), ("f2", SITEMAP)], "feed_url string, xml string"
    )
    rows = extract_feed_links(feeds).orderBy("feed_url", "pos").collect()
    by_feed = {}
    for r in rows:
        by_feed.setdefault(r.feed_url, []).append((r.pos, r.url))
    assert by_feed["f2"] == [(0, "https://ex.com/p1"), (1, "https://ex.com/p2")]
    assert by_feed["f1"][0] == (0, "https://ex.com/a")
    assert len(by_feed["f1"]) == 4


def test_read_feeds_file(spark, tmp_path):
    p = tmp_path / "feeds.txt"
    p.write_text("# comment\nhttps://a.com/rss\n\n  https://b.com/atom  \n")
    got = [r.feed_url for r in read_feeds_file(spark, str(p)).collect()]
    assert got == ["https://a.com/rss", "https://b.com/atom"]


def test_merge_csv_unique_rows(spark, tmp_path):
    """mergeCsv.test.js:8-24: rows dedupe across files, header kept
    once and never counted as a row."""
    from horseman_article_parser_spark.sources.feeds import merge_csv_lines

    f1, f2 = tmp_path / "in1.csv", tmp_path / "in2.csv"
    f1.write_text("header\nrow1\nrow2\n")
    f2.write_text("header\nrow2\nrow3\n")
    header, rows = merge_csv_lines(spark, [str(f1), str(f2)])
    assert header == "header"
    assert sorted(r.row for r in rows.collect()) == ["row1", "row2", "row3"]
