"""Pure-Python baseline JPEG codec (functions/jpeg.py)."""

from __future__ import annotations

import numpy as np
import pytest

from observation_lakehouse_spark.functions.codecs import (
    UnsupportedMediaFormat,
    decode_image,
)
from observation_lakehouse_spark.functions.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)

KITTEN = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP802813.jpg"


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=-1
    ).astype(np.uint8)


def test_round_trip_psnr_rgb():
    img = _gradient(40, 56)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert dec.shape == img.shape
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > 35  # smooth content: well above 35 dB


def test_round_trip_grayscale_and_odd_dimensions():
    g = (np.mgrid[0:33, 0:41][0] * 255 / 33).astype(np.uint8)  # non-multiple of 8
    dec = decode_jpeg_baseline(encode_jpeg_baseline(g))
    assert dec.shape == (33, 41, 1)
    assert np.abs(dec[:, :, 0].astype(float) - g).mean() < 3


def test_decodes_real_libjpeg_file_with_420_subsampling():
    img = decode_jpeg_baseline(open(KITTEN, "rb").read())
    assert img.shape == (313, 199, 3)
    # plausible photo statistics (bright kitten image), not garbage
    assert 180 < img.mean() < 210


def test_cross_checked_against_jvm_imageio(spark):
    """Independent-decoder agreement: JVM ImageIO (Spark's image source) and
    this decoder must agree to within IDCT/chroma-upsampling rounding."""
    row = spark.read.format("image").load(KITTEN).select("image.*").collect()[0]
    ref = np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(
        row["height"], row["width"], row["nChannels"]
    )[:, :, ::-1]
    ours = decode_jpeg_baseline(open(KITTEN, "rb").read())
    diff = np.abs(ref.astype(float) - ours.astype(float))
    assert diff.mean() < 1.0
    assert (diff <= 2).mean() > 0.98


def test_progressive_raises_with_clear_message():
    prog = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    with pytest.raises(ValueError, match="progressive|non-baseline"):
        decode_jpeg_baseline(open(prog, "rb").read())


def test_decode_image_sniffs_jpeg():
    img = _gradient(16, 16)
    assert decode_image(encode_jpeg_baseline(img)).shape == (16, 16, 3)
    with pytest.raises(UnsupportedMediaFormat):
        decode_image(b"\xff\xd8garbage")


def test_truncated_scan_raises_not_garbage():
    """A stream cut mid-scan must raise (→ UnsupportedMediaFormat → digest
    fallback decoded=False), never decode to deterministic garbage flagged as
    a real decode (ADVICE r03: _BitReader.read_bit returned 0 past EOF)."""
    data = encode_jpeg_baseline(_gradient(40, 56))
    sos = data.find(b"\xff\xda")
    assert sos > 0
    # keep the headers and a sliver of entropy data, drop the rest (incl. EOI)
    truncated = data[: sos + 40]
    with pytest.raises(ValueError):
        decode_jpeg_baseline(truncated)
    with pytest.raises(UnsupportedMediaFormat):
        decode_image(truncated)
