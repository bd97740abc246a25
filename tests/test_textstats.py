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
        [(1, "solo"), (2, ""), (3, "budget report"), (4, "three word doc")],
        ["doc_id", "text"],
    )
    rows = keyphrases_topk(docs, k=5, n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["phrase"])
    assert 1 not in by_doc and 2 not in by_doc
    assert by_doc.get(3) == ["budget report"]
    assert set(by_doc.get(4, [])) == {"three word", "word doc"}


def test_keywords_pos_gate_drops_verbs_and_adverbs(spark):
    """N3 POS gate (keywordParser.js:10-28 retext-pos noun filter):
    'running quickly' must stop ranking; nouns and proper nouns rank."""
    from horseman_article_parser_spark.functions.textstats import (
        keywords_cleaned_topk,
    )

    text = ("the runner was running quickly past the tower while the "
            "tower meeting heard Paris said nothing about the tower")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    terms = {r["term"] for r in keywords_topk(docs, k=10).collect()}
    assert "tower" in terms and "runner" in terms and "meeting" in terms
    assert "Paris" in terms  # proper-noun bypass
    assert "running" not in terms and "quickly" not in terms
    assert "was" not in terms and "said" not in terms and "heard" not in terms

    cleaned = {r["keyword"] for r in keywords_cleaned_topk(docs, k=10).collect()}
    assert "Tower" in cleaned and "Running" not in cleaned


def test_keyphrases_pos_gate_keeps_adjective_noun(spark):
    """Noun-phrase gate passes adjectives ('economic growth') but not
    verb/adverb spans ('running quickly')."""
    text = ("economic growth economic growth running quickly "
            "budget meeting budget meeting")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    phrases = {r["phrase"] for r in keyphrases_topk(docs, k=10, n=2).collect()}
    assert "economic growth" in phrases and "budget meeting" in phrases
    assert "running quickly" not in phrases


def test_keywords_acronym_retention(spark):
    """keywordParser.test.js:23-38: WWF / G7 acronyms survive, long
    shouty ECONOMIE is rejected (cleanKeyword all-caps > 4 rule)."""
    from horseman_article_parser_spark.functions.textstats import (
        keywords_cleaned_topk,
    )

    text = ("WWF rapport pollution G7 Paris climat "
            "ECONOMIE ECONOMIE ECONOMIE mesures concretes")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    kws = {r["keyword"] for r in keywords_cleaned_topk(docs, k=10).collect()}
    assert "WWF" in kws and "G7" in kws
    assert "ECONOMIE" not in kws


def test_keywords_topk_deterministic_ties(spark):
    docs = spark.createDataFrame([(1, "zebra apple zebra apple mango")],
                                 ["doc_id", "text"])
    rows = keywords_topk(docs, k=2).collect()
    assert [(r["term"], r["tf"], r["rank"]) for r in rows] == [
        ("apple", 2, 1), ("zebra", 2, 2)]


def test_trigram_langid_detects_all_profile_languages(spark):
    """N1 trigram model: every LANG_SAMPLES sentence (52 languages,
    incl. Cyrillic/Greek/Japanese scripts) must detect as itself, with
    the reference's iso6391+iso6393 pair (language.js:6-13,26-46)."""
    import __spark_entry__ as entry
    from horseman_article_parser_spark.functions.textstats import (
        ISO3_TO_1,
        langid_struct_col,
    )

    rows = [(iso3, text) for iso3, text in sorted(entry.LANG_SAMPLES.items())]
    df = spark.createDataFrame(rows, ["want", "txt"])
    got = df.select("want", langid_struct_col("txt").alias("lid")).collect()
    for r in got:
        assert r["lid"]["iso6393"] == r["want"], r
        assert r["lid"]["iso6391"] == ISO3_TO_1[r["want"]], r


def test_trigram_langid_empty_defaults_to_english(spark):
    from horseman_article_parser_spark.functions.textstats import langid_struct_col

    df = spark.createDataFrame([("",), ("12345 67890",)], ["txt"])
    for r in df.select(langid_struct_col("txt").alias("lid")).collect():
        assert r["lid"]["iso6393"] == "eng" and r["lid"]["iso6391"] == "en"


def test_bpe_token_count_pretokenizer(spark):
    """GPT-style pre-token match count: contractions split off, leading
    spaces attach to the following word, punctuation runs are one
    token."""
    from horseman_article_parser_spark.functions.textstats import (
        bpe_token_count_col,
    )

    docs = spark.createDataFrame(
        [(1, "It's 2024, isn't it?!"), (2, ""), (3, "hello   world")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n for r in docs.select(
        "doc_id", bpe_token_count_col("text").alias("n")).collect()}
    # "It" "'s" " 2024" "," " isn" "'t" " it" "?!" -> 8
    assert got[1] == 8
    assert got[2] == 0
    # "hello" "  " (ws run collapses into the next branch: " world"
    # takes one leading space, the rest is a ws token) -> 3
    assert got[3] == 3


def test_script_gates_are_identities():
    """Every gated language's trigrams each contain >=1 char inside the
    gate range, so 'text lacks script => score 0' holds and the gate
    can never change a result — only skip work."""
    import re

    from horseman_article_parser_spark.functions.textstats import (
        LANG_SCRIPT_GATES,
        LANG_TRIGRAMS,
    )

    for lang, gate in LANG_SCRIPT_GATES.items():
        pat = re.compile(gate)
        for tg in LANG_TRIGRAMS[lang]:
            assert pat.search(tg), (lang, tg)


def test_langid_gated_equals_ungated(spark):
    """The script gate is a pure runtime optimization: scores with and
    without gates agree on every sample."""
    import __spark_entry__ as entry
    from horseman_article_parser_spark.functions import textstats as TS

    rows = [(k, v) for k, v in sorted(entry.LANG_SAMPLES.items())]
    df = spark.createDataFrame(rows, ["want", "txt"]).withColumn(
        "_nt", TS.lang_normtext_col("txt")
    )
    gated = TS.trigram_lang_scores(TS.F.col("_nt"), prenormalized=True)
    ungated = TS.trigram_lang_scores(
        TS.F.col("_nt"), dict(TS.LANG_TRIGRAMS), prenormalized=True
    )
    sel = df.select(
        "want",
        *[gated[lang].alias(f"g_{lang}") for lang in sorted(gated)],
        *[ungated[lang].alias(f"u_{lang}") for lang in sorted(ungated)],
    )
    for r in sel.collect():
        for lang in gated:
            assert r[f"g_{lang}"] == r[f"u_{lang}"], (r["want"], lang)


def test_keyphrases_pooled_lengths(spark):
    """Variable-length keyphrase pooling: 2- and 3-gram noun phrases
    rank together (keywordParser.js:32-77 spans any length)."""
    text = ("annual budget report annual budget report annual budget "
            "report city council city council")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = keyphrases_topk(docs, k=10, n=(2, 3)).collect()
    got = {r["phrase"]: (r["tf"], r["rank"]) for r in rows}
    assert "annual budget report" in got  # 3-gram present
    assert "annual budget" in got and "city council" in got
    # tf ordering: 'annual budget' tf=3 beats 'city council' tf=2 and
    # the 3-gram also has tf=3
    assert got["annual budget"][0] == 3 and got["annual budget report"][0] == 3
    assert got["city council"][0] == 2


def test_latin_gate_identity_invariant():
    """Every ungated (Latin-script) profile's trigrams must each carry
    >=1 character matching the batch kernel's OWN Latin class — the
    precondition for its gate being an identity (no-class-match text
    => all Latin profile scores are 0 anyway). Testing against
    LATIN_KERNEL_CLASS itself (not Unicode names) guards the exact
    failure mode: a future trigram whose only Latin letters fall
    outside the kernel class would silently zero that language in the
    kernel while the Column-algebra path still scores it."""
    import re

    from horseman_article_parser_spark.functions.textstats import (
        LANG_SCRIPT_GATES,
        LANG_TRIGRAMS,
        LATIN_KERNEL_CLASS,
    )

    latin_re = re.compile(LATIN_KERNEL_CLASS)
    for lang, tgs in LANG_TRIGRAMS.items():
        if lang in LANG_SCRIPT_GATES:
            continue
        for tg in tgs:
            assert latin_re.search(tg), (lang, tg)


def test_langid_gate_flags_identity(spark):
    """The materialized script-gate-flags path must produce the exact
    same winners and scores as the ungated path on every sample
    language (gates are an identity, short-circuit only)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from horseman_article_parser_spark.functions import textstats as TS

    langs = sorted(TS.LANG_TRIGRAMS)
    docs = spark.createDataFrame(
        [(i, entry.LANG_SAMPLES[lang]) for i, lang in enumerate(langs)],
        ["doc_id", "txt"],
    ).withColumn("_nt", TS.lang_normtext_col("txt")).withColumn(
        "_gf", TS.script_gate_flags_col(F.col("_nt"))
    )
    # Per-score identity, compared in CHUNKS of languages: a single
    # select carrying all |langs|x15 plain terms PLUS the gated copies
    # (~3000+ expression nodes at 105 languages) OOMs the driver during
    # planning — and per-language score equality on every sample is the
    # stronger form of the winner-level identity anyway.
    plain_scores = TS.trigram_lang_scores(F.col("_nt"), prenormalized=True)
    gated_scores = TS.trigram_lang_scores(F.col("_nt"), prenormalized=True,
                                          gate_flags=F.col("_gf"))
    chunk = 15
    for start in range(0, len(langs), chunk):
        part = langs[start:start + chunk]
        rows = docs.select(
            "doc_id",
            *[plain_scores[lg].alias(f"p_{lg}") for lg in part],
            *[gated_scores[lg].alias(f"g_{lg}") for lg in part],
        ).collect()
        assert len(rows) == len(langs)
        for r in rows:
            for lg in part:
                assert r[f"p_{lg}"] == r[f"g_{lg}"], (lg, r.doc_id)


def test_langid_batch_kernel_matches_column_algebra(spark):
    """The Arrow-batched scale kernel (langid_batch_col) must be
    BIT-EXACT with the declarative Column-algebra path — same winner,
    same iso codes, same best_score — on every sample language, on
    mixed-script text, and on texts that score zero everywhere. The
    kernel exists because codegen aborts ('Code grows beyond 64 KB')
    at 70x15 trigram terms and the projection runs interpreted; see
    langid_batch_col's docstring."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from horseman_article_parser_spark.functions import textstats as TS

    langs = sorted(TS.LANG_TRIGRAMS)
    rows = [(i, entry.LANG_SAMPLES[lang]) for i, lang in enumerate(langs)]
    n = len(rows)
    rows += [
        (n, ""),                                   # all-zero -> eng/en
        (n + 1, "zzq xqj qqv"),                    # Latin chars, no hits
        (n + 2, entry.LANG_SAMPLES["rus"] + " " +
                entry.LANG_SAMPLES["fra"]),        # mixed script
        (n + 3, entry.LANG_SAMPLES["cmn"] + " le la les et"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "txt"]).withColumn(
        "_nt", TS.lang_normtext_col("txt")
    )
    scores = TS.trigram_lang_scores(F.col("_nt"), prenormalized=True)
    ref_struct = TS.langid_from_scores(scores)
    ref_best = F.greatest(*scores.values())
    kern = TS.langid_batch_col(F.col("_nt"))
    got = docs.select(
        "doc_id",
        ref_struct["iso6391"].alias("r1"), ref_struct["iso6393"].alias("r3"),
        ref_best.alias("rb"),
        kern["iso6391"].alias("k1"), kern["iso6393"].alias("k3"),
        kern["best_score"].alias("kb"),
    ).collect()
    assert len(got) == n + 4
    for r in got:
        assert (r.k1, r.k3, r.kb) == (r.r1, r.r3, r.rb), r

def test_keywords_kernel_matches_declarative(spark):
    """The Arrow keywords/keyphrases kernel (keywords_phrases_batch)
    must be BIT-EXACT with the declarative keywords_topk(10) ∪
    keyphrases_topk(8, (2,3)) union the driver query used to run —
    same grams, tf, ranks, and HALF_UP-rounded score_x1e9 — across
    testdata docs plus hand-built edge cases (ties broken term-asc,
    capitalized proper nouns passing the gate, suffix-gated words,
    short/empty docs, phrase edge stopwords, len<=3 phrases)."""
    import pyspark.sql.functions as F
    from horseman_article_parser_spark.functions.textstats import (
        keyphrases_topk,
        keywords_phrases_batch,
        keywords_topk,
    )

    edge = spark.createDataFrame(
        [
            (1, "alpha beta alpha Gamma beta alpha of the to in"),
            (2, ""),
            (3, "x"),  # single short token: no terms, no phrases
            (4, "tie tie toe toe moon moon"),  # tf ties -> term asc
            (5, "quickly running speeded feeling ceiling seed"),
            (6, "the market the report a summit of data"),
            (7, "storm Storm STORM sTorm storm"),
            (8, "ab cd ab cd ab cd"),  # phrases len<=3 dropped ("ab cd" is 5)
        ],
        "doc_id long, text string",
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for d in (edge, docs.select("doc_id", "text")):
        kws = keywords_topk(d, k=10).select(
            "doc_id", F.lit("term").alias("kind"),
            F.col("term").alias("gram"), "tf", "rank",
            F.lit(None).cast("long").alias("score_x1e9"),
        )
        phr = keyphrases_topk(d, k=8, n=(2, 3)).select(
            "doc_id", F.lit("phrase").alias("kind"),
            F.col("phrase").alias("gram"), "tf", "rank",
            F.round(F.col("score") * 1_000_000_000).cast("long")
            .alias("score_x1e9"),
        )
        want = kws.unionByName(phr)
        got = keywords_phrases_batch(d, k_terms=10, k_phrases=8,
                                     lengths=(2, 3))
        assert got.schema == want.schema or [
            (f.name, f.dataType) for f in got.schema
        ] == [(f.name, f.dataType) for f in want.schema]
        diff = want.exceptAll(got).unionAll(got.exceptAll(want))
        assert diff.count() == 0, diff.limit(20).collect()


def test_normtext_positive_class_equivalence():
    """NORMTEXT_JUNK_RE must match exactly [^A-Za-z0-9À-￿] per char."""
    import re

    from horseman_article_parser_spark.functions.textstats import (
        NORMTEXT_JUNK_RE,
    )

    neg = re.compile(r"[^A-Za-z0-9À-￿]")
    pos = re.compile(NORMTEXT_JUNK_RE.replace("\\\\", "\\").rstrip("+"))
    for i in range(0x10000):
        c = chr(i)
        assert bool(neg.match(c)) == bool(pos.match(c)), hex(i)


ADVERSARIAL_TEXTS = [
    (101, ""),
    (102, "   "),
    (103, "\t\n"),
    (104, "one. two! three? four"),
    (105, "para one\n\npara two\n\n\npara three"),
    (106, "the the the a and of to in"),
    (107, "fast big merge slow small dup good great bad error"),
    (108, "word " * 300 + "end."),
    (109, "élan café İstanbul STRASSE straße"),
    (110, "naïve nbsp bound"),          # NBSP is not Java \s
    (111, "mixed 123 digits 4.5 and—dashes it's"),
    (112, "你好 world Ж test"),
    (113, "trailing spaces   "),
    (114, "a.b.c...d!!e??f"),
    (115, "UPPER lower MiXeD 'qu 'quo"),
]


def test_text_quality_kernel_matches_declarative(spark):
    """text_quality_batch must be BIT-EXACT with the staged Column-
    algebra plan it replaced (readability_cols + occurrences 'the' +
    bpe_token_count + with_quality + bag_fingerprint) over testdata
    docs plus adversarial fixtures (empty/whitespace-only text, NBSP,
    non-Latin scripts, punctuation runs, paragraph breaks)."""
    import pyspark.sql.functions as F
    from horseman_article_parser_spark.functions import textstats as TS

    edge = spark.createDataFrame(
        ADVERSARIAL_TEXTS, "doc_id long, text string")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for d in (edge, docs.select("doc_id", "text")):
        staged = d.withColumn("_toks", TS.tokens_col("text"))
        toks = F.col("_toks")
        rcols = TS.readability_cols(F.col("text"), tokens=toks)
        staged = TS.with_quality(staged, "text", tokens=toks)
        decl = staged.select(
            "doc_id",
            *[c.alias(n) for n, c in rcols.items()],
            TS.occurrences_col("text", "the", tokens=toks).alias("n_the"),
            TS.bpe_token_count_col("text").alias("n_bpe_tokens"),
            "stopword_hits", "alpha_ratio_x1e4", "quality_score",
            TS.bag_fingerprint_col("text").alias("bag_fp"),
        )
        kern = TS.text_quality_batch(d)
        a = sorted(map(tuple, decl.collect()))
        b = sorted(map(tuple, kern.collect()))
        assert a == b, next(
            (x, y) for x, y in zip(a, b) if x != y)


def test_sentiment_kernel_matches_declarative(spark):
    """sentiment_batch must be BIT-EXACT with with_sentiment (inline
    staged algebra) and its score must equal the explode→broadcast-join
    path's sum (sentiment_via_join) over testdata + fixtures."""
    from horseman_article_parser_spark.functions import textstats as TS

    edge = spark.createDataFrame(
        ADVERSARIAL_TEXTS, "doc_id long, text string")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for d in (edge, docs.select("doc_id", "text")):
        decl = TS.with_sentiment(d).select(
            "doc_id", "sentiment_score", "comparative_x1e6",
            "sentiment_label")
        kern = TS.sentiment_batch(d)
        a = sorted(map(tuple, decl.collect()))
        b = sorted(
            (r.doc_id, r.sentiment_score, r.comparative_x1e6,
             r.sentiment_label)
            for r in kern.collect())
        assert a == b, next((x, y) for x, y in zip(a, b) if x != y)
        # the join-path twin agrees on the score (score_join column)
        jn = {r.doc_id: r.sentiment_score
              for r in TS.sentiment_via_join(d).collect()}
        for r in kern.collect():
            assert jn[r.doc_id] == r.score_join, r
