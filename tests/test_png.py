"""Pure-python PNG codec (operators/png.py) and the real multimodal
image-decode path it unlocks (VERDICT r02 #4)."""
import struct
import zlib

import numpy as np
import pytest

from vnlp_spark.operators.png import (
    decode_png,
    encode_png,
    image_features,
    is_png,
    _MAGIC,
)


def _rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip(channels):
    img = _rng().integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    data = encode_png(img)
    assert is_png(data)
    out = decode_png(data)
    np.testing.assert_array_equal(out, img)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _manual_png(img: np.ndarray, filters: list[int], palette=None, bit_depth=8,
                color_type=None) -> bytes:
    """Encode with explicit per-row filter types, applying the spec's
    filter functions — exercises the decoder's unfilter recurrences."""
    h, w, c = img.shape
    if color_type is None:
        color_type = {1: 0, 3: 2, 4: 6}[c]
    arr = img.astype(np.int16)
    raw = bytearray()
    recon = np.zeros((h, w * c), dtype=np.int16)
    flat = arr.reshape(h, w * c)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        prev = recon[y - 1] if y else np.zeros(w * c, np.int16)
        filt = np.zeros(w * c, dtype=np.int16)
        for x in range(w * c):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (line[x] - pred) % 256
        recon[y] = line
        raw += bytes([f]) + filt.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    body = _MAGIC + _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return body + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def test_all_filter_types_decode():
    img = _rng().integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _manual_png(img, filters)
        np.testing.assert_array_equal(decode_png(data), img)


def test_palette_decode():
    palette = _rng().integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng().integers(0, 16, size=(6, 7, 1), dtype=np.uint8)
    data = _manual_png(idx, [0], palette=palette, color_type=3)
    np.testing.assert_array_equal(decode_png(data), palette[idx[:, :, 0]])


def test_unsupported_variants_raise():
    img = _rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_png(_manual_png(img, [0], bit_depth=16))
    with pytest.raises(ValueError):
        decode_png(b"\xff\xd8\xff JPEG-ish")


def test_image_features_contract():
    img = _rng().integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    v = image_features(img, 64)
    assert v.shape == (64,) and v.dtype == np.float32
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # brightness ordering survives: a bright-top image has larger
    # first-row block means than last-row
    grad = np.zeros((32, 32), dtype=np.uint8)
    grad[:16] = 200
    g = image_features(grad, 64).reshape(8, 8)
    assert g[0].mean() > g[-1].mean()


def test_decode_image_real_png_and_honest_stub():
    from vnlp_spark.operators.multimodal import FEATURE_DIM, decode_image

    img = _rng().integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
    v = decode_image(encode_png(img), fake=False)
    assert v.shape == (FEATURE_DIM,)
    # baseline+progressive JPEG and VP8L WebP now decode for real; the
    # honest NotImplementedError stub remains for LOSSY VP8 WebP
    lossy = (b"RIFF" + (16).to_bytes(4, "little") + b"WEBP"
             + b"VP8 " + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError):
        decode_image(lossy, fake=False)


def test_extract_features_real_decode_in_spark(spark):
    from vnlp_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rng = _rng()
    rows = []
    for i in range(8):
        img = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
        rows.append(
            (i, "image", bytearray(encode_png(img)), ("image/png", 12, 12, None))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == 8
    for r in feats:
        assert len(r["feature"]) == 64
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-4
