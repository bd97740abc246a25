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


def test_cuckoo_claim_release_resume(spark, tmp_store):
    from horseman_article_parser_spark.operators.seen_filter import CuckooSeenFilter

    f = CuckooSeenFilter(tmp_store, n_shards=8, buckets_per_shard=1 << 10)
    urls1 = [f"https://h{i % 20}.x/c-{i}" for i in range(500)]
    got1 = {r["url"] for r in f.claim_unseen(_df(spark, urls1)).collect()}
    assert got1 == set(urls1)
    # no false negatives on re-claim
    got2 = {r["url"] for r in f.claim_unseen(_df(spark, urls1)).collect()}
    assert got2 == set()
    # deletion: released URLs become claimable again (bloom cannot)
    released = {r["url"] for r in f.release(_df(spark, urls1[:50])).collect()}
    assert released == set(urls1[:50])
    got3 = {r["url"] for r in f.claim_unseen(_df(spark, urls1[:60])).collect()}
    assert set(urls1[:50]) <= got3  # the released 50 re-claim
    assert got3 <= set(urls1[:60])
    # resume from disk
    g = CuckooSeenFilter(tmp_store, n_shards=8, buckets_per_shard=1 << 10)
    g.resume()
    got4 = {r["url"] for r in g.claim_unseen(_df(spark, urls1)).collect()}
    assert got4 == set()


def test_cuckoo_fp_rate_bounded(spark, tmp_store):
    from horseman_article_parser_spark.operators.seen_filter import CuckooSeenFilter

    f = CuckooSeenFilter(tmp_store, n_shards=8, buckets_per_shard=1 << 10)
    ins = [f"https://h{i % 50}.x/i-{i}" for i in range(3000)]
    f.claim_unseen(_df(spark, ins))
    probe = [f"https://h{i % 50}.x/new-{i}" for i in range(3000)]
    claimed = f.claim_unseen(_df(spark, probe)).count()
    fp_rate = 1 - claimed / len(probe)
    # 16-bit fingerprints, 4-slot buckets at ~9% load: FP ~ 2*4/2^16
    assert fp_rate < 0.01, fp_rate


def test_crawl_scheduler_with_cuckoo(spark, tmp_store):
    from horseman_article_parser_spark.datagen.frontier import build_seed_frontier
    from horseman_article_parser_spark.plans.crawl import CrawlConfig, CrawlScheduler

    cfg = CrawlConfig(wave_size=20, round0_limit=20, default_host_budget=3,
                      n_shards=8, seen_mode="cuckoo")
    sched = CrawlScheduler(spark, tmp_store, cfg)
    sched.init_from_seeds(build_seed_frontier(spark, 60))
    m0 = sched.run_round(0)
    m1 = sched.run_round(1)
    assert m0["scheduled"] == 20 and m1["scheduled"] > 0
    w0 = {r.url for r in sched.store.read(spark, "waves", 0).collect()}
    w1 = {r.url for r in sched.store.read(spark, "waves", 1).collect()}
    assert not (w0 & w1)


def test_cuckoo_buckets_rounded_to_power_of_two(tmp_store):
    from horseman_article_parser_spark.operators.seen_filter import CuckooSeenFilter

    # non-power-of-two request (e.g. total_bits/(n_shards*64) = 21845)
    f = CuckooSeenFilter(str(tmp_store), n_shards=2, buckets_per_shard=21845)
    assert f.buckets == 32768  # next power of two
    assert f.buckets & (f.buckets - 1) == 0
    # the alternate-bucket map must be an involution: alt(alt(b)) == b
    import numpy as np
    b = np.arange(f.buckets, dtype=np.int64)
    fp = np.full(f.buckets, 12345, dtype=np.uint16)
    alt = f._alt_bucket(b, fp)
    assert (f._alt_bucket(alt, fp) == b).all()


def test_cuckoo_full_table_undo_preserves_claims(tmp_store):
    """MAX_KICKS exhaustion must not evict a previously-inserted
    fingerprint (the old code dropped the kicked victim)."""
    import numpy as np
    from horseman_article_parser_spark.operators.seen_filter import CuckooSeenFilter

    f = CuckooSeenFilter(str(tmp_store), n_shards=1, buckets_per_shard=2)
    rng = np.random.RandomState(0)
    table = np.zeros((f.buckets, f.SLOTS), dtype=np.uint16)
    inserted = []
    # over-fill a 2-bucket x 4-slot table until insert fails
    for fp in range(1, 40):
        b1 = fp % f.buckets
        b2 = int(f._alt_bucket(np.array([b1]), np.array([fp], dtype=np.uint16))[0])
        before = table.copy()
        ok = f._insert_one(table, rng, b1, b2, fp)
        if ok:
            inserted.append((b1, b2, fp))
        else:
            # failed insert must leave the table EXACTLY as it was
            assert (table == before).all()
    assert inserted, "expected at least one successful insert"
    # every successfully inserted fingerprint is still findable
    for b1, b2, fp in inserted:
        arr = np.array([fp], dtype=np.uint16)
        hit = f._contains(
            table, np.array([b1]), 
            f._alt_bucket(np.array([b1]), arr), arr
        )
        assert hit[0], f"fingerprint {fp} lost from table"
