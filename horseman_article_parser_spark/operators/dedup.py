"""Document deduplication at training-pipeline scale: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

The reference's only dedup is an in-memory JS `Set` over URLs
(/root/reference/scripts/batch-sample-run.js:66,72-77); these operators
are the content-level generalization a 100 TB corpus pipeline needs.

Design rules:
- Pure Column algebra (md5-based hashing, `functions.hashing`) — no
  Python crossing anywhere, every formula renderable as DuckDB oracle SQL.
- One shuffle per logical step, always on a high-cardinality key
  (fingerprint, (doc, shingle), band-bucket); map-side partial agg takes
  the pre-shuffle volume down to distinct keys.
- SimHash avoids the tokens×bits row explosion by computing the per-bit
  sign-sums as N independent aggregate expressions over the token
  explode (rows = tokens, not tokens×bits).
- LSH candidate verification joins signatures (small, fixed width), not
  raw text — `bytes`/`text` columns never enter a shuffle (SURVEY §7.3).

Scale shape at 10^10 docs: shingle explode is the big intermediate
(docs × ~len/step rows) but it only carries (doc_id, 8-char shingle) and
collapses immediately via map-side distinct+min; band buckets are
skew-prone when corpora contain boilerplate — the candidate-pair join
caps bucket fan-out with `max_bucket` (drop degenerate mega-buckets,
standard MinHash-LSH practice; logged, not silent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

from ..functions.hashing import MINHASH_P, h32, minhash_params, universal_hash
from ..functions.partitioning import fan_out
from ..functions.textstats import fingerprint_col, normalize_text_col, tokens_col

DEFAULT_SHINGLE_K = 8
DEFAULT_SHINGLE_STEP = 4


# ------------------------------------------------------------ exact


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text,
    with the keeper (min id) and duplicate count. Single shuffle on the
    md5 fingerprint; partial agg collapses dups map-side."""
    return (
        docs.select(F.col(id_col), fingerprint_col(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per normalized-text fingerprint."""
    w = Window.partitionBy(fingerprint_col(text_col)).orderBy(id_col)
    return docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------- shingles


def shingles_col(text: Column | str, k: int = DEFAULT_SHINGLE_K,
                 step: int = DEFAULT_SHINGLE_STEP) -> Column:
    """Character k-gram shingles at a fixed stride over normalized text.
    Stride `step` bounds the explode factor to len/step (≈len/4) while
    preserving Jaccard resolution for near-dup detection."""
    t = normalize_text_col(text)
    positions = F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)), F.lit(step))
    return F.transform(positions, lambda i: F.substring(t, i, k))


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 k: int = DEFAULT_SHINGLE_K, step: int = DEFAULT_SHINGLE_STEP,
                 distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) pairs — the set representation when
    `distinct=True`; the raw multiset otherwise (enough for any
    duplicate-insensitive consumer like MinHash's `min`, saving the
    distinct's full shuffle of the exploded rows).

    The normalization regex runs ONCE per document in its own projection
    (referenced from every shingle position, CollapseProject keeps it
    un-inlined), and the narrow pre-explode rows are `fan_out` so a
    single-split local file doesn't serialize the explode."""
    t = normalize_text_col(text_col)
    norm = fan_out(docs.select(F.col(id_col), t.alias("_t")))
    positions = F.sequence(
        F.lit(1), F.greatest(F.length("_t") - (k - 1), F.lit(1)), F.lit(step)
    )
    sh = norm.select(
        F.col(id_col),
        F.explode(
            F.transform(positions, lambda i: F.substring(F.col("_t"), i, k))
        ).alias("shingle"),
    )
    return sh.distinct() if distinct else sh


# ------------------------------------------------------------ minhash


def minhash_signatures(docs: DataFrame, n_hashes: int = 16, id_col: str = "doc_id",
                       text_col: str = "text", k: int = DEFAULT_SHINGLE_K,
                       step: int = DEFAULT_SHINGLE_STEP) -> DataFrame:
    """MinHash signature per doc: columns mh0..mh{n-1} (bigint).

    Plan: shingle explode → h32(shingle) → n universal hashes → one
    hash-agg of n mins keyed on doc_id. The n hash functions are n
    *expressions* over one exploded column, not n passes. `min` is
    duplicate-insensitive, so the multiset of shingles feeds the agg
    directly — no distinct, exactly one shuffle (with map-side partial
    mins) in the whole plan."""
    params = minhash_params(n_hashes)
    sh = doc_shingles(docs, id_col, text_col, k, step, distinct=False)
    h = h32(F.col("shingle"))
    aggs = [
        F.min(universal_hash(h, a, b)).alias(f"mh{j}")
        for j, (a, b) in enumerate(params)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(signatures: DataFrame, bands: int, rows_per_band: int,
                     id_col: str = "doc_id") -> DataFrame:
    """(band, bucket, doc_id): bucket = md5-hash of the band's signature
    slice. Docs sharing (band, bucket) are near-dup candidates."""
    mh_cols = [c for c in signatures.columns if c.startswith("mh")]
    assert len(mh_cols) >= bands * rows_per_band
    # all bands in ONE pass: array of (band, bucket) structs → explode.
    # A per-band union would recompute the signature aggregation once
    # per band (the plan forks above the agg, not below it).
    entries = []
    for b in range(bands):
        slice_cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        key = F.concat_ws("_", *[c.cast("string") for c in slice_cols])
        entries.append(F.struct(F.lit(b).alias("band"), h32(key).alias("bucket")))
    return signatures.select(
        F.explode(F.array(*entries)).alias("_bb"), F.col(id_col)
    ).select(
        F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
        F.col(id_col),
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int, rows_per_band: int,
                        id_col: str = "doc_id", max_bucket: int = 1000) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from shared LSH buckets.

    Self-join on (band, bucket) — both sides shuffle on the bucket key.
    Buckets larger than `max_bucket` are dropped (boilerplate clusters;
    at 10^10 docs a single mega-bucket would otherwise quadratically
    dominate the join). Callers should report the dropped-bucket count."""
    buckets = lsh_band_buckets(signatures, bands, rows_per_band, id_col)
    sized = buckets.withColumn(
        "_n", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("_n") <= max_bucket).drop("_n")
    a = sized.select("band", "bucket", F.col(id_col).alias("id_a"))
    b = sized.select("band", "bucket", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_similarity(signatures: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature slots, for the
    candidate pairs only (signatures are narrow; text never joins)."""
    mh_cols = [c for c in signatures.columns if c.startswith("mh")]
    sig_a = signatures.select(
        F.col(id_col).alias("id_a"), *[F.col(c).alias(f"a_{c}") for c in mh_cols]
    )
    sig_b = signatures.select(
        F.col(id_col).alias("id_b"), *[F.col(c).alias(f"b_{c}") for c in mh_cols]
    )
    joined = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    agree = None
    for c in mh_cols:
        t = F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    return joined.select(
        "id_a", "id_b",
        (agree.cast("double") / F.lit(len(mh_cols))).alias("est_jaccard"),
    )


# ------------------------------------------------------ exact jaccard


def ngram_jaccard(docs_a: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = DEFAULT_SHINGLE_K,
                  step: int = DEFAULT_SHINGLE_STEP) -> DataFrame:
    """Exact shingle-set Jaccard for given (id_a, id_b) pairs.

    |A∩B| via the (doc, shingle) explode joined twice; |A∪B| = |A|+|B|−∩.
    Shuffles on shingle-id keys only — text stays at the scan."""
    sh = doc_shingles(docs_a, id_col, text_col, k, step)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("_idb"), F.col("shingle").alias("shingle_b"))
    inter = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, (F.col("id_b") == F.col("_idb")) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a", "id_b",
            (
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce("n_inter", F.lit(0)))
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------------ simhash


def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """SimHash fingerprint: per-bit sign-sum of token hashes.

    Explode rows = tokens (NOT tokens×bits): each of the `bits` sign-sums
    is an independent aggregate expression `sum(CASE (h>>b)&1 ...)`, so
    one shuffle on doc_id computes the whole fingerprint."""
    toks = fan_out(docs.select(F.col(id_col), tokens_col(text_col).alias("_toks"))).select(
        F.col(id_col), F.explode_outer("_toks").alias("tok")
    )
    h = h32(F.col("tok"))
    aggs = [
        F.sum(
            F.when(F.col("tok").isNull(), 0)
            .when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long") * (1 << b)).otherwise(0)
        sig = bit if sig is None else sig + bit
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3, bits: int = 32,
                       id_col: str = "doc_id", n_blocks: int = 4) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ max_hamming using the
    block-permutation trick: split the fingerprint into n_blocks chunks;
    any pair within distance max_hamming < n_blocks shares ≥1 exact
    chunk → equi-join per chunk, verify distance with bit_count."""
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    chunks = []
    for i in range(n_blocks):
        chunks.append(
            sig.select(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), i * block_bits).bitwiseAND(F.lit(mask)).alias("chunk"),
                F.col(id_col),
                F.col("simhash"),
            )
        )
    allc = chunks[0]
    for c in chunks[1:]:
        allc = allc.unionByName(c)
    a = allc.select("blk", "chunk", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = allc.select("blk", "chunk", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    pairs = (
        a.join(b, ["blk", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ----------------------------------------------- embedding near-dup


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold, LSH-bucketed.

    Random-hyperplane signature (n_planes sign bits, deterministic seeded
    planes) buckets the vectors; exact cosine verifies within-bucket pairs.
    High thresholds ⇒ near-dups almost surely agree on all sign bits, so
    the bucket join finds them without the O(n²) cross join."""
    from .similarity import cosine_col, hyperplane_bucket_col, l2_norm_col

    with_b = emb.select(
        F.col(id_col), F.col(vec_col),
        hyperplane_bucket_col(F.col(vec_col), n_planes=n_planes, seed=seed).alias("bucket"),
        l2_norm_col(F.col(vec_col)).alias("_norm"),
    )
    a = with_b.select(
        F.col("bucket"), F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"), F.col("_norm").alias("na"),
    )
    b = with_b.select(
        F.col("bucket"), F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"), F.col("_norm").alias("nb"),
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_col(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
