"""Pure-numpy baseline JPEG codec (operators/jpeg.py) and the real
multimodal decode path it extends (VERDICT r03 #7)."""
import os

import numpy as np
import pytest

from vnlp_spark.operators.jpeg import (
    _dct2,
    _idct2,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)

SPARK_IMAGES = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


def test_dct_idct_inverse_pair():
    rng = np.random.default_rng(3)
    block = rng.normal(size=(8, 8)) * 100
    np.testing.assert_allclose(_idct2(_dct2(block)), block, atol=1e-9)
    # orthonormality: DCT preserves energy
    assert abs(np.sum(block ** 2) - np.sum(_dct2(block) ** 2)) < 1e-6


def test_roundtrip_grayscale_smooth():
    x = np.linspace(0, 255, 64, dtype=np.uint8)
    img = np.tile(x, (48, 1))
    data = encode_jpeg(img, quality=90)
    assert is_jpeg(data)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_roundtrip_rgb_and_odd_dimensions():
    yy, xx = np.mgrid[0:41, 0:53]
    img = np.zeros((41, 53, 3), dtype=np.uint8)
    img[..., 0] = (yy * 4) % 256
    img[..., 1] = (xx * 3) % 256
    img[..., 2] = 128
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape  # non-multiple-of-8 cropped exactly
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 3.0


def test_roundtrip_noise_bounded():
    img = np.random.default_rng(7).integers(
        0, 256, size=(24, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    # noise is the worst case for DCT quantization; bound the RMSE
    rmse = float(np.sqrt(((out.astype(float) - img.astype(float)) ** 2).mean()))
    assert rmse < 12.0


def test_flat_image_is_exact():
    img = np.full((16, 16), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert int(np.abs(out.astype(int) - 77).max()) <= 1


def test_not_jpeg_and_corrupt():
    assert not is_jpeg(b"\x89PNG")
    assert not is_jpeg(b"")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises((ValueError, NotImplementedError, IndexError)):
        decode_jpeg(good[:40])  # truncated before any scan


@pytest.mark.skipif(not os.path.isdir(SPARK_IMAGES),
                    reason="Spark sample images not present")
def test_decode_real_baseline_jpegs():
    """Independent validation: baseline JPEGs shipped with the Spark
    distribution (libjpeg-produced, 4:2:0 subsampled, restart-marker
    bearing) decode to their SOF dimensions with plausible content."""
    decoded = 0
    for root, _, files in os.walk(SPARK_IMAGES):
        for f in sorted(files):
            if not f.lower().endswith((".jpg", ".jpeg")):
                continue
            payload = open(os.path.join(root, f), "rb").read()
            try:
                img = decode_jpeg(payload)
            except NotImplementedError:
                continue  # progressive — honestly refused
            # dims must match the SOF header we parse independently by a
            # proper marker walk (a naive byte scan can hit the EXIF
            # thumbnail's SOF inside APP1 first)
            h = w = None
            p = 2
            while p + 4 < len(payload):
                assert payload[p] == 0xFF
                m = payload[p + 1]
                if m in (0xC0, 0xC1, 0xC2):
                    h = int.from_bytes(payload[p + 5:p + 7], "big")
                    w = int.from_bytes(payload[p + 7:p + 9], "big")
                    break
                if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
                    p += 2
                    continue
                p += 2 + int.from_bytes(payload[p + 2:p + 4], "big")
            assert img.shape[:2] == (h, w)
            assert img.dtype == np.uint8
            assert 5.0 < float(img.mean()) < 250.0  # not all-black/white
            decoded += 1
    assert decoded >= 2


def test_decode_image_integration():
    from vnlp_spark.operators.multimodal import FEATURE_DIM, decode_image

    img = np.tile(np.linspace(0, 255, 32, dtype=np.uint8), (32, 1))
    feats = decode_image(encode_jpeg(img, quality=90))
    assert feats.shape == (FEATURE_DIM,)
    assert abs(float(np.linalg.norm(feats)) - 1.0) < 1e-5
    # deterministic
    np.testing.assert_array_equal(
        feats, decode_image(encode_jpeg(img, quality=90)))


# --------------------------------------------------------------------------
# progressive (SOF2) — round-5 #5
# --------------------------------------------------------------------------

def test_progressive_roundtrip_matches_baseline():
    """Progressive and baseline encodes of the same image quantize the
    same coefficients, so the two DECODE paths must reconstruct
    bit-identical pixels — this pins them to each other."""
    yy, xx = np.mgrid[0:41, 0:53]
    img = np.zeros((41, 53, 3), dtype=np.uint8)
    img[..., 0] = (yy * 4) % 256
    img[..., 1] = (xx * 3) % 256
    img[..., 2] = 128
    prog = decode_jpeg(encode_jpeg(img, quality=95, progressive=True))
    base = decode_jpeg(encode_jpeg(img, quality=95))
    np.testing.assert_array_equal(prog, base)
    assert float(np.abs(prog.astype(int) - img.astype(int)).mean()) < 3.0


def test_progressive_roundtrip_grayscale_and_noise():
    x = np.linspace(0, 255, 64, dtype=np.uint8)
    img = np.tile(x, (48, 1))
    out = decode_jpeg(encode_jpeg(img, quality=90, progressive=True))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2
    noise = np.random.default_rng(7).integers(
        0, 256, size=(24, 24), dtype=np.uint8)
    prog = decode_jpeg(encode_jpeg(noise, quality=95, progressive=True))
    base = decode_jpeg(encode_jpeg(noise, quality=95))
    np.testing.assert_array_equal(prog, base)


@pytest.mark.skipif(not os.path.isdir(SPARK_IMAGES),
                    reason="Spark sample images not present")
def test_decode_real_progressive_jpeg():
    """grayscale.jpg in the Spark distribution is a REAL libjpeg
    progressive stream (SOF2, 5-scan script with successive
    approximation: DC Al=1 + AC bands Al=2 + AC refine Ah=2->1 + DC
    refine + AC refine Ah=1->0).  Any bit mis-consumption in the
    refinement paths desynchronizes the Huffman stream within a scan,
    so a clean decode to plausible smooth content validates them."""
    path = os.path.join(SPARK_IMAGES, "multi-channel", "grayscale.jpg")
    payload = open(path, "rb").read()
    img = decode_jpeg(payload)
    assert img.shape == (215, 300)
    assert img.dtype == np.uint8
    assert 50.0 < float(img.mean()) < 230.0
    # photographic smoothness: neighboring-pixel deltas are small on
    # average (a desynced decode produces salt-and-pepper garbage)
    assert float(np.abs(np.diff(img.astype(int), axis=1)).mean()) < 25.0
