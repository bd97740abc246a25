"""A13 liveblog harvest parity — driven against the reference's own
fixtures (/root/reference/tests/fixtures/liveblog/{many,amp}.html)."""

from horseman_article_parser_spark.operators.liveblog import (
    build_liveblog_summary,
    liveblog_summaries,
)

FIXTURES = "/root/reference/tests/fixtures/liveblog"


def _read(name):
    with open(f"{FIXTURES}/{name}") as f:
        return f.read()


def test_many_updates_cap_40_collect_5_emit():
    # 50 timestamped updates in the fixture: collection caps at 40
    # (liveBlog.js:3), emission at 5 (:76)
    res = build_liveblog_summary(_read("many.html"))
    assert res["ok"] is True
    assert res["count"] == 5
    assert [e["time"] for e in res["entries"]] == [
        "0:00", "1:00", "2:00", "3:00", "4:00",
    ]
    assert res["entries"][0]["title"] == "Title 0"
    assert res["chars"] == sum(len(e["body"]) for e in res["entries"])


def test_amp_live_list_fallback():
    res = build_liveblog_summary(_read("amp.html"))
    assert res["ok"] is True
    assert res["count"] >= 2


def test_not_enough_entries_rejected():
    html = (
        "<html><body><article>"
        "<div><time>1:00</time><h2>Long enough title</h2>"
        "<p>short body</p></div>"
        "</article></body></html>"
    )
    res = build_liveblog_summary(html)
    assert res["ok"] is False and res["entries"] == []


def test_scoring_gate():
    # score = has-time + title>12 + body>60 must be >= 2 AND body > 40
    body40 = "B" * 45
    body70 = "B" * 70
    html = (
        "<html><body><article>"
        f"<div><time>1:00</time><h2>A short ttl</h2><p>{body70}</p></div>"  # time+body -> 2 ok
        f"<div><time>2:00</time><h2>This title is long enough</h2><p>{body40}</p></div>"  # time+title -> 2 ok
        f"<div><time></time><h2>tiny</h2><p>{body70}</p></div>"  # only body -> 1 rejected
        f"<div><time>4:00</time><h2>Another quite long title</h2><p>{body70}</p></div>"
        f"<div><time>5:00</time><h2>Fifth entry title is fine</h2><p>{body70}</p></div>"
        "</article></body></html>"
    )
    res = build_liveblog_summary(html)
    assert res["ok"] is True
    assert res["count"] == 4  # the score-1 entry is rejected
    assert all(e["time"] != "" for e in res["entries"])
    # total-body gate: 3 entries but only 185 chars -> NOT enough
    small = (
        "<html><body><article>"
        f"<div><time>1:00</time><h2>A short ttl</h2><p>{body70}</p></div>"
        f"<div><time>2:00</time><h2>This title is long enough</h2><p>{body40}</p></div>"
        f"<div><time>4:00</time><h2>Another quite long title</h2><p>{body70}</p></div>"
        "</article></body></html>"
    )
    assert build_liveblog_summary(small)["ok"] is False


def test_liveblog_dataframe_op(spark):
    df = spark.createDataFrame(
        [(0, _read("many.html")), (1, "<html><body><p>plain</p></body></html>")],
        "doc_id long, html string",
    )
    rows = {r.doc_id: r for r in liveblog_summaries(df).select("doc_id", "liveblog.*").collect()}
    assert rows[0].ok is True and rows[0]["count"] == 5
    assert rows[1].ok is False
