"""URL-seen filter: exact anti-join correctness, bloom test-and-set
semantics, version/resume behavior, measured false-positive rate
(SURVEY §2.3 J1, §4 custom component #1)."""

from horseman_article_parser_spark.operators.seen_filter import (
    BloomSeenFilter,
    ExactSeenFilter,
)


def _df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_exact_claim_unseen(spark, tmp_store):
    f = ExactSeenFilter(tmp_store)
    got1 = {r["url"] for r in f.claim_unseen(_df(spark, ["a", "b", "c"])).collect()}
    assert got1 == {"a", "b", "c"}
    got2 = {r["url"] for r in f.claim_unseen(_df(spark, ["b", "c", "d"])).collect()}
    assert got2 == {"d"}
    # resume from disk: a fresh instance sees all prior state
    g = ExactSeenFilter(tmp_store)
    g.resume()
    got3 = {r["url"] for r in g.claim_unseen(_df(spark, ["a", "d", "e"])).collect()}
    assert got3 == {"e"}


def test_bloom_claim_unseen_no_false_negatives(spark, tmp_store):
    f = BloomSeenFilter(tmp_store, n_shards=8, total_bits=1 << 18)
    urls1 = [f"https://h{i % 20}.x/p-{i}" for i in range(500)]
    got1 = {r["url"] for r in f.claim_unseen(_df(spark, urls1)).collect()}
    assert got1 == set(urls1)  # empty filter: everything is new
    # second pass: every URL already inserted must be rejected (no FN)
    got2 = {r["url"] for r in f.claim_unseen(_df(spark, urls1)).collect()}
    assert got2 == set()


def test_bloom_resume_and_fp_rate(spark, tmp_store):
    f = BloomSeenFilter(tmp_store, n_shards=8, total_bits=1 << 20, k=7)
    urls1 = [f"https://h{i % 50}.x/a-{i}" for i in range(2000)]
    f.claim_unseen(_df(spark, urls1)).count()

    g = BloomSeenFilter(tmp_store, n_shards=8, total_bits=1 << 20, k=7)
    g.resume()
    assert g.version == f.version
    # none of the inserted urls pass after resume
    again = g.claim_unseen(_df(spark, urls1[:300])).count()
    assert again == 0
    # fresh urls: FP rate far below 1% at this load factor
    fresh = [f"https://h{i % 50}.x/b-{i}" for i in range(2000)]
    claimed = g.claim_unseen(_df(spark, fresh)).count()
    fp_rate = 1.0 - claimed / len(fresh)
    assert fp_rate < 0.01, f"bloom FP rate too high: {fp_rate}"
