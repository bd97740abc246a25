"""N4 spellcheck + J3 entity anti-filter parity
(/root/reference/controllers/spellCheck.js, /root/reference/index.js:1486-1523)."""

from horseman_article_parser_spark.operators.spellcheck import (
    doc_tokens,
    mask_urls_col,
    misspellings,
)

import pyspark.sql.functions as F

DICT = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
        "visit", "for", "more", "info", "at", "line", "two", "said"]


def _docs(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def _dict(spark):
    return spark.createDataFrame([(w,) for w in DICT], "word string")


def test_url_masking_and_alnum_blanking(spark):
    text = "visit https://ex.com/page for more abc123x 123abc info at www.x.io"
    got = _docs(spark, text).select(mask_urls_col("text").alias("t")).collect()[0]["t"]
    assert "https://" not in got and "www.x.io" not in got
    assert "123abc" not in got
    assert "visit" in got and "info" in got


def test_misspellings_found_with_positions(spark):
    text = "the quick brwn fox\njumps ovr the lazy dog"
    out = misspellings(_docs(spark, text), _dict(spark)).orderBy("line", "word_idx")
    rows = [(r.line, r.word) for r in out.collect()]
    assert rows == [(1, "brwn"), (2, "ovr")]


def test_entity_anti_filter_with_plural(spark):
    # "Sunak" and "Sunaks" both survive dictionary-miss but are dropped
    # because the entity token 'sunak' is known (plural rule
    # index.js:1513-1517); "blorptex" stays.
    text = "Sunak said blorptex\nSunaks said the"
    ents = spark.createDataFrame([(0, "Rishi Sunak")], "doc_id long, entity string")
    out = misspellings(_docs(spark, text), _dict(spark), entities=ents)
    words = sorted(r.word for r in out.collect())
    assert words == ["blorptex"]


def test_line_numbers_preserved_through_masking(spark):
    text = "ok line https://drop.me\nxqzword here"
    # dictionary lacks 'ok'/'here'/'xqzword'; check xqzword is line 2
    out = misspellings(_docs(spark, text), _dict(spark))
    got = {r.word: r.line for r in out.collect()}
    assert got["xqzword"] == 2


def test_doc_tokens_strips_edge_punctuation(spark):
    text = '"quick," (brown) fox!'
    toks = [r.word for r in doc_tokens(_docs(spark, text)).orderBy("word_idx").collect()]
    assert toks == ["quick", "brown", "fox"]


def test_suggestions_distance1_sorted_capped(spark):
    """N4 suggestions (spellCheck.js:29-55): dict words at Levenshtein
    distance <=1, alphabetical, capped, '' when none."""
    from horseman_article_parser_spark.operators.spellcheck import (
        misspellings,
        suggest_corrections,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, "the cat sta on the mat qqqqzz")], ["doc_id", "text"]
    )
    dictionary = spark.createDataFrame(
        [("the",), ("cat",), ("sat",), ("sta",), ("mat",), ("star",),
         ("stay",), ("sea",), ("ta",), ("on",)],
        ["word"],
    ).filter(F.col("word") != "sta")
    missed = misspellings(docs, dictionary)
    out = suggest_corrections(missed, dictionary, max_suggestions=3)
    rows = {r["word"]: r["suggestions"] for r in out.collect()}
    # sta: distance-1 dict words = sat(swap? no: s-t-a vs s-a-t is 2)...
    # deletions/insertions/subs: sta->star(ins r)=1, sta->stay(ins y)=1,
    # sta->ta(del s)=1, sta->sea(sub t->e)=1, sat=2 (excluded).
    # alphabetical capped at 3: sea,sta? 'sta' not in dict. => sea,star,stay? ta sorts last
    assert rows["sta"] == "sea,star,stay"
    assert rows["qqqqzz"] == ""
