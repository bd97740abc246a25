"""The image+caption payload table (BASELINE.json input_hint): schema,
distributed deterministic generation, and the per-row decoded-pixel
PSNR≥40dB + caption-equality invariant via an Arrow-batched UDF."""

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F

from horseman_article_parser_spark.codecs.images import decode_image, psnr
from horseman_article_parser_spark.datagen.images import (
    IMAGES_SCHEMA,
    build_images_table,
    caption_for,
    synth_pixels,
)

N = 64


def test_schema_matches_input_hint(spark):
    df = build_images_table(spark, 4)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("image_id", "string"),
        ("bytes", "binary"),
        ("w", "int"),
        ("h", "int"),
        ("fmt", "string"),
        ("caption", "string"),
        ("phash", "bigint"),
    ]
    assert df.schema == IMAGES_SCHEMA


def test_generation_deterministic_across_partitionings(spark):
    a = build_images_table(spark, N, partitions=2).orderBy("image_id").collect()
    b = build_images_table(spark, N, partitions=8).orderBy("image_id").collect()
    for ra, rb in zip(a, b):
        assert ra["image_id"] == rb["image_id"]
        assert bytes(ra["bytes"]) == bytes(rb["bytes"])
        assert ra["phash"] == rb["phash"]


def test_decoded_pixel_and_caption_invariants(spark):
    """The input_hint invariant, run AS a Spark plan: decode every row's
    bytes executor-side, compare to the reference pixels, assert
    PSNR≥40dB (lossy) / exact (png) + caption equality."""
    df = build_images_table(spark, N, partitions=4)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                idx = int(row["image_id"].split("-")[1])
                expected, w, h = synth_pixels(idx)
                got = decode_image(bytes(row["bytes"]))
                exact = bool((got == expected).all())
                p = float("inf") if exact else psnr(expected, got)
                out.append(
                    {
                        "image_id": row["image_id"],
                        "fmt": row["fmt"],
                        "shape_ok": got.shape == (h, w, 3),
                        "exact": exact,
                        "psnr_ok": p >= 40.0,
                        "caption_ok": row["caption"] == caption_for(idx),
                    }
                )
            yield pd.DataFrame(out)

    res = df.mapInPandas(
        verify,
        schema="image_id string, fmt string, shape_ok boolean, exact boolean, "
        "psnr_ok boolean, caption_ok boolean",
    )
    rows = res.collect()
    assert len(rows) == N
    for r in rows:
        assert r["shape_ok"] and r["caption_ok"], r
        if r["fmt"] == "png":
            assert r["exact"], r  # lossless: exact
        else:
            assert r["psnr_ok"], r  # lossy: PSNR ≥ 40 dB


def test_bytes_pruned_from_metadata_scans(spark, tmp_store):
    """Scale hygiene (SURVEY §7.3): metadata queries over the payload
    table must never read the `bytes` column — column pruning has to
    reach the parquet scan (ReadSchema excludes bytes)."""
    path = f"{tmp_store}/images_parquet"
    build_images_table(spark, 16, partitions=2).write.parquet(path)
    agg = (
        spark.read.parquet(path)
        .filter(F.col("fmt") == "png")
        .groupBy("w", "h")
        .agg(F.count("*").alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan"):]
    read_schema = scan[scan.index("ReadSchema"): scan.index("\n", scan.index("ReadSchema"))]
    assert "bytes" not in read_schema, read_schema
    assert "PushedFilters: [" in scan  # fmt filter reaches the scan


def test_reference_quality_rows_present(spark):
    """The large smooth-gradient jpeg rows carry the reference's exact
    screenshot quality (index.js:758 quality:40) — byte-identical to a
    q40 re-encode — while still clearing the PSNR>=40 invariant; all
    other jpeg rows use q90."""
    from horseman_article_parser_spark.codecs.jpeg import encode_jpeg
    from horseman_article_parser_spark.datagen.images import (
        jpeg_quality_for,
        jpeg_subsampling_for,
        synth_pixels,
    )

    rows = build_images_table(spark, 16).collect()
    n_q40 = n_420 = 0
    for r in rows:
        if r.fmt != "jpeg":
            continue
        idx = int(r.image_id.split("-")[1])
        px, _, _ = synth_pixels(idx)
        q = jpeg_quality_for(idx)
        sub = jpeg_subsampling_for(idx)
        assert bytes(r.bytes) == encode_jpeg(px, q, subsampling=sub)
        n_q40 += q == 40
        n_420 += sub == "4:2:0"
    assert n_q40 >= 1  # id 3 (640x480 smooth) is inside the first 16
    assert n_420 >= 1  # r5: smooth-gradient jpeg rows are 4:2:0


def test_image_features_survives_truncated_payload(spark):
    """A truncated JPEG raises struct/Index errors (not just the typed
    codec errors) — the feature kernel must emit decode_ok=False for
    that row instead of failing the whole scan (review r4 follow-up)."""
    from horseman_article_parser_spark.operators.multimodal import (
        image_features,
    )

    good = build_images_table(spark, 4)
    jpeg_bytes = bytes(
        next(r for r in good.collect() if r.fmt == "jpeg").bytes
    )
    bad = spark.createDataFrame(
        [("img-trunc", bytearray(jpeg_bytes[:40]), 1, 1, "jpeg",
          "cap", 0)],
        good.schema,
    )
    rows = image_features(good.unionByName(bad)).collect()
    by_id = {r.image_id: r for r in rows}
    assert by_id["img-trunc"].decode_ok is False
    assert sum(r.decode_ok for r in rows) == 4


def test_build_images_table_column_pruning(spark):
    """columns= prunes generator work (the kernel is opaque to
    Catalyst); pruned rows must carry identical values to the full
    table's columns."""
    from horseman_article_parser_spark.datagen.images import (
        build_images_table,
    )

    full = {r.image_id: r.phash
            for r in build_images_table(spark, 16).collect()}
    pruned = build_images_table(spark, 16, columns=("image_id", "phash"))
    assert pruned.schema.fieldNames() == ["image_id", "phash"]
    got = {r.image_id: r.phash for r in pruned.collect()}
    assert got == full
