"""Decoded-pixel invariants (BASELINE.json input_hint): PNG exact,
lossy PSNR ≥ 40 dB, caption equality — the columnar restatement of the
reference's pixel assertions (tests/parseArticle.test.js:118-123)."""

import numpy as np
import pytest

from horseman_article_parser_spark.codecs.images import (
    decode_image,
    encode_lossy,
    encode_png,
    phash64,
    psnr,
)
from horseman_article_parser_spark.datagen.images import (
    caption_for,
    synth_pixels,
)


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 5, 8, 13])
def test_png_roundtrip_exact(idx):
    px, _, _ = synth_pixels(idx)
    assert (decode_image(encode_png(px)) == px).all()


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 5, 8, 13])
def test_lossy_psnr_at_least_40db(idx):
    px, _, _ = synth_pixels(idx)
    assert psnr(px, decode_image(encode_lossy(px))) >= 40.0


def test_lossy_deterministic():
    px, _, _ = synth_pixels(7)
    assert encode_lossy(px) == encode_lossy(px.copy())


def test_real_jpeg_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0junk")


def test_phash_stable_and_locality():
    px, _, _ = synth_pixels(4)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # lossy re-encode must not move the perceptual hash far
    px2 = decode_image(encode_lossy(px))
    hamming = bin((h1 ^ phash64(px2)) & ((1 << 64) - 1)).count("1")
    assert hamming <= 4


def test_captions_deterministic():
    assert caption_for(12) == caption_for(12)
    assert caption_for(12) != caption_for(13)
