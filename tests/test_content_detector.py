"""A6/W1/W2/A11/X24 content-detector + reranker parity
(/root/reference/controllers/contentDetector.js,
 /root/reference/scripts/train-reranker.js)."""

import math

import pyspark.sql.functions as F

from horseman_article_parser_spark.operators.content_detector import (
    candidate_features,
    compute_features,
    gather_candidates,
    heuristic_score_col,
    page_candidates,
    rank_candidates,
    score_with_weights_col,
    train_gd,
    train_reranker,
    vector_cols,
)
from horseman_article_parser_spark.functions.htmldom import parse_html

PAGE = (
    "<html><body>"
    '<nav><a href="/a">Home</a><a href="/b">World</a></nav>'
    '<div class="content"><article>'
    "<h1>Title</h1>"
    "<p>" + ("Real article content with punctuation, clauses; and facts. " * 12) + "</p>"
    "<p>" + ("More substantive paragraphs follow here, naturally. " * 10) + "</p>"
    "<h2>Sub</h2><p>Closing remarks of suitable length for scoring purposes.</p>"
    "</article></div>"
    '<div class="promo">' + ("Subscribe cookie consent banner text. " * 30) + "</div>"
    "</body></html>"
)


def test_compute_features_basics():
    root = parse_html("<html><body><article><p>One. Two, three; four!</p><p>More text here.</p></article></body></html>")
    art = root.find("article")
    f = compute_features(art)
    assert f["sem"] == 1 and f["dp"] == 2 and f["pc"] == 2
    assert f["punct"] == 5
    assert f["imgAltRatio"] == 1.0  # no images -> ratio 1 (reference :91)
    assert f["dr"] == 1.0


def test_gather_and_rank_prefers_article(spark):
    cands = page_candidates(PAGE)
    assert len(cands) >= 2
    df = spark.createDataFrame([(0, PAGE)], "doc_id long, html string")
    feats = candidate_features(df)
    ranked = rank_candidates(feats)
    best = ranked.filter(F.col("rank") == 1).collect()[0]
    assert "ARTICLE" in best.xpath
    # consent div must rank below the article despite its length
    consent = ranked.filter(F.col("consentPenalty") > 0).collect()
    assert all(r.rank > 1 for r in consent)


def test_heuristic_score_matches_python_formula(spark):
    df = spark.createDataFrame([(0, PAGE)], "doc_id long, html string")
    rows = candidate_features(df).withColumn("score", heuristic_score_col()).collect()
    for r in rows:
        expected = (
            math.log(1 + r["len"]) + min(r.punct / 10, 5) + min(r.pc / 5, 5)
            + r.sem * 2 + min(r.dp / 3, 6) + min(r.dr * 6, 6)
            + min(math.log(1 + r.avgP), 4) + min(r.heads, 3) * 0.5
            + min(r.depth, 8) * 0.3
            + r.roleMain * 1.5 - r.roleNeg - r.ariaHidden * 3
            + min(r.imgAltRatio * 2, 2)
            - min(r.ld * 10, 6) - r.boiler
            - (2 if (r.dp == 0 and r.db > 0) else 0) - r.consentPenalty
        )
        assert abs(r.score - expected) < 1e-9


def test_train_gd_learns_separator():
    # y = 1 when v0 high: exact reference GD must learn positive w0
    rows = [([1.0, 0.0], 1), ([0.9, 0.1], 1), ([0.1, 0.9], 0), ([0.0, 1.0], 0)] * 5
    model = train_gd(rows)
    assert model["weights"][0] > 0 > model["weights"][1]


def test_reranker_end_to_end(spark):
    # label = "is the heuristic best" over synthetic pages; spark.ml must
    # rank the article container first via learned weights (X24 scorer)
    pages = spark.createDataFrame(
        [(i, PAGE) for i in range(8)], "doc_id long, html string"
    )
    feats = candidate_features(pages)
    ranked = rank_candidates(feats)
    labeled = ranked.withColumn("label", (F.col("rank") == 1).cast("int"))
    _model, weights = train_reranker(labeled, max_iter=50)
    assert len(weights["weights"]) == 16
    scored = labeled.select(
        "doc_id", "xpath", "label", *vector_cols()
    ).withColumn("ml_score", score_with_weights_col(weights["weights"], weights["bias"]))
    top = scored.orderBy(F.desc("ml_score")).limit(1).collect()[0]
    assert top.label == 1


# ----------------------------------------- W3/A8 drill-down + fragmentation

def test_python_heuristic_matches_column_formula(spark):
    """_heuristic_score_py must mirror heuristic_score_col exactly."""
    import pyspark.sql.functions as F
    from horseman_article_parser_spark.operators.content_detector import (
        FEATURE_FIELDS,
        _heuristic_score_py,
        heuristic_score_col,
    )

    rows = []
    for k in range(6):
        f = {"len": 100 * k + 7, "punct": 3 * k, "ld": 0.1 * k, "pc": k,
             "sem": k % 2, "boiler": k % 3, "dp": k, "db": k + 1,
             "dr": k / (k + 1), "avgP": 30.0 * k, "depth": k,
             "heads": k % 4, "roleMain": k % 2, "roleNeg": (k + 1) % 2,
             "ariaHidden": 0, "imgAltRatio": 0.5, "imgCount": k,
             "consentPenalty": 1.5 if k == 5 else 0.0}
        rows.append(f)
    schema = ", ".join(
        f"`{n}` {'double' if t.typeName() == 'double' else 'int'}"
        for n, t in FEATURE_FIELDS
    )
    df = spark.createDataFrame(rows, schema)
    got = [r["s"] for r in df.select(heuristic_score_col().alias("s")).collect()]
    want = [_heuristic_score_py(f) for f in rows]
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-9


def test_fragmentation_promotes_to_parent():
    from horseman_article_parser_spark.operators.content_detector import (
        detect_container,
    )

    fill = "word " * 90  # ~450 chars per part
    html = ("<html><body><article>"
            f"<div><p>{fill.strip()} one.</p></div>"
            f"<div><p>{fill.strip()} two.</p></div>"
            f"<div><p>{fill.strip()} three.</p></div>"
            "</article></body></html>")
    got = detect_container(html)
    assert got == {"xpath": "/HTML/BODY/ARTICLE", "css_selector": "article",
                   "fragmented": True}


def test_drill_down_selects_dense_child_without_promotion():
    from horseman_article_parser_spark.operators.content_detector import (
        detect_container,
    )

    fill = "word " * 90
    html = ("<html><body><article>"
            f"<div><p>{fill.strip()} one.</p><p>{fill.strip()} two.</p>"
            f"<p>{fill.strip()} three.</p></div>"
            "</article></body></html>")
    got = detect_container(html)
    assert got == {"xpath": "/HTML/BODY/ARTICLE/DIV", "css_selector": "div",
                   "fragmented": False}


def test_single_dominant_part_does_not_qualify():
    """ratio < 0.35 (one part owns the text) must NOT promote."""
    from horseman_article_parser_spark.operators.content_detector import (
        evaluate_fragmentation,
    )
    from horseman_article_parser_spark.functions.htmldom import parse_html

    big = "word " * 200
    small = "tiny part here today now. " * 7   # ~180 chars
    root = parse_html(
        f"<article><div><p>{big.strip()}.</p></div>"
        f"<div><p>{small.strip()}</p></div></article>"
    )
    art = root.find("article")
    assert evaluate_fragmentation(art)["qualifies"] is False


def test_css_selector_forms():
    """X19 getCssSelector (contentDetector.js:496-550): unique id wins;
    classes capped at 2; nth-of-type only among same-tag siblings."""
    from horseman_article_parser_spark.functions.htmldom import parse_html
    from horseman_article_parser_spark.operators.content_detector import (
        css_selector,
    )

    root = parse_html(
        '<html><body>'
        '<div id="uniq"><p>x</p></div>'
        '<section class="a b c d"><p>y</p></section>'
        '<div><span>1</span><span>2</span></div>'
        '</body></html>'
    )
    by_id = [e for e in root.iter() if e.get("id") == "uniq"][0]
    assert css_selector(by_id) == "#uniq"
    section = root.find("section")
    assert css_selector(section) == "section.a.b"
    spans = root.find_all("span")
    assert css_selector(spans[1]) == "span:nth-of-type(2)"


def test_strip_bad_containers_excludes_promo_from_features():
    """F9: a promo aside inside the winning container must not count
    toward its features, and must not drag selection to a decoy."""
    from horseman_article_parser_spark.functions.htmldom import parse_html
    from horseman_article_parser_spark.operators.content_detector import (
        compute_features,
        strip_bad_containers,
    )

    fill = "word " * 90
    html = (f'<div><p>{fill.strip()}.</p>'
            f'<aside class="promo"><p>{"buy " * 120}now.</p></aside></div>')
    div = parse_html(html).find("div")
    raw_len = compute_features(div)["len"]
    clean_len = compute_features(strip_bad_containers(div))["len"]
    assert clean_len < raw_len
    assert clean_len <= 460  # only the real paragraph remains
