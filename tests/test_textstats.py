"""textstats regressions (keywords/keyphrases edge cases)."""

from horseman_article_parser_spark.functions.textstats import (
    keyphrases_topk,
    keywords_topk,
)


def test_keyphrases_short_docs_do_not_crash(spark):
    # docs with < n tokens used to make sequence(0, size-n) DESCEND
    # (Spark defaults step to -1), crashing slice() under ANSI mode;
    # they must instead yield zero phrases, matching the oracle.
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "exactly two"), (4, "three word doc")],
        ["doc_id", "text"],
    )
    rows = keyphrases_topk(docs, k=5, n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["phrase"])
    assert 1 not in by_doc and 2 not in by_doc
    assert by_doc.get(3) == ["exactly two"]
    assert set(by_doc.get(4, [])) == {"three word", "word doc"}


def test_keywords_topk_deterministic_ties(spark):
    docs = spark.createDataFrame([(1, "zebra apple zebra apple mango")],
                                 ["doc_id", "text"])
    rows = keywords_topk(docs, k=2).collect()
    assert [(r["term"], r["tf"], r["rank"]) for r in rows] == [
        ("apple", 2, 1), ("zebra", 2, 2)]
