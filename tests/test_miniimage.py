"""Unit tests for the pure-Python PNG/BMP decoder (functions/miniimage.py)
that lets the real media-decode path execute on pillow-less workers (r4
verdict next-round #4).

Ground truth comes from an in-test PNG *encoder* (stdlib zlib + struct,
filter type chosen per row) and hand-assembled BMP bytes — the decoder is
tested against the format specs, not against itself.
"""

import struct
import zlib

import numpy as np
import pytest

from merge_machine_spark.functions import miniimage
from merge_machine_spark.functions.miniimage import (
    CorruptImageError,
    UnsupportedImageError,
    decode,
)

# -- in-test PNG encoder ------------------------------------------------------

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(
        ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
    )


def _filter_row(row: np.ndarray, prev: np.ndarray, ftype: int, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw row (the encoder side of the
    decoder's unfiltering), per the PNG spec's filter definitions."""
    row = row.astype(np.int32)
    prev = prev.astype(np.int32)
    out = np.empty_like(row)
    for x in range(len(row)):
        a = row[x - bpp] if x >= bpp else 0  # Raw(x-bpp)
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (row[x] - pred) & 0xFF
    return out.astype(np.uint8).tobytes()


def encode_png(
    px: np.ndarray, color_type: int, filters: list[int] | None = None, palette: bytes | None = None
) -> bytes:
    """(H, W, channels) uint8 -> PNG bytes, one filter type per row."""
    h, w, ch = px.shape
    assert ch == _CHANNELS[color_type]
    filters = filters or [0] * h
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b""
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y, ftype in zip(range(h), filters):
        row = px[y].reshape(-1)
        raw += bytes([ftype]) + _filter_row(row, prev, ftype, ch)
        prev = row
    out = miniimage._PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _rng_pixels(h, w, ch, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint16).astype(np.uint8)


# -- PNG ---------------------------------------------------------------------

@pytest.mark.parametrize("filters", [[0, 0, 0, 0, 0], [1, 2, 3, 4, 1], [4, 4, 4, 4, 4]])
def test_png_rgb_roundtrip_all_filters(filters):
    px = _rng_pixels(5, 3, 3)
    rgb, w, h = decode(encode_png(px, color_type=2, filters=filters))
    assert (w, h) == (3, 5)
    assert np.array_equal(rgb, px)


def test_png_gray_expands_to_rgb():
    px = _rng_pixels(4, 6, 1)
    rgb, w, h = decode(encode_png(px, color_type=0, filters=[0, 1, 2, 3]))
    assert (w, h) == (6, 4)
    assert np.array_equal(rgb, np.repeat(px, 3, axis=2))


def test_png_rgba_drops_alpha():
    px = _rng_pixels(3, 3, 4)
    rgb, _, _ = decode(encode_png(px, color_type=6, filters=[2, 4, 3]))
    assert np.array_equal(rgb, px[:, :, :3])


def test_png_gray_alpha():
    px = _rng_pixels(2, 5, 2)
    rgb, _, _ = decode(encode_png(px, color_type=4))
    assert np.array_equal(rgb, np.repeat(px[:, :, :1], 3, axis=2))


def test_png_palette_lookup():
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])  # 4 entries
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8).reshape(2, 2, 1)
    rgb, w, h = decode(encode_png(idx, color_type=3, palette=palette))
    assert (w, h) == (2, 2)
    expected = np.frombuffer(palette, np.uint8).reshape(4, 3)[idx[:, :, 0]]
    assert np.array_equal(rgb, expected)


def test_png_palette_index_out_of_range_is_corrupt():
    palette = bytes([255, 0, 0])  # 1 entry
    idx = np.array([[0, 5]], dtype=np.uint8).reshape(1, 2, 1)
    with pytest.raises(CorruptImageError):
        decode(encode_png(idx, color_type=3, palette=palette))


def test_png_truncated_idat_is_corrupt():
    good = encode_png(_rng_pixels(4, 4, 3), color_type=2)
    with pytest.raises(CorruptImageError):
        decode(good[: len(good) - 20])


def test_png_bad_signature_tail_is_corrupt():
    # magic[:4] matches (classified as PNG) but the full 8-byte signature
    # is wrong -> corrupt, NOT unsupported (multimodal maps this to
    # decode_ok=False rather than the stub fallback)
    with pytest.raises(CorruptImageError):
        decode(b"\x89PNG-not-really")


def test_png_16bit_depth_unsupported():
    px = _rng_pixels(2, 2, 3)
    raw = encode_png(px, color_type=2)
    # patch IHDR bit depth 8 -> 16 (IHDR data starts at offset 16; depth is
    # its 9th byte) and re-checksum is unnecessary (crc unverified)
    bad = bytearray(raw)
    bad[16 + 8] = 16
    with pytest.raises(UnsupportedImageError):
        decode(bytes(bad))


def test_png_interlaced_unsupported():
    raw = bytearray(encode_png(_rng_pixels(2, 2, 3), color_type=2))
    raw[16 + 12] = 1  # interlace flag in IHDR
    with pytest.raises(UnsupportedImageError):
        decode(bytes(raw))


# -- BMP ---------------------------------------------------------------------

def _bmp_bytes(px: np.ndarray, bitcount: int, top_down: bool = False) -> bytes:
    h, w, _ = px.shape
    bpp = bitcount // 8
    row_size = ((bitcount * w + 31) // 32) * 4
    data_offset = 54
    body = b""
    rows = px if top_down else px[::-1]
    for y in range(h):
        row = rows[y][:, 2::-1]  # RGB -> BGR
        if bpp == 4:
            row = np.concatenate([row, np.full((w, 1), 255, np.uint8)], axis=1)
        line = row.astype(np.uint8).tobytes()
        body += line + b"\x00" * (row_size - len(line))
    height_field = -h if top_down else h
    header = (
        b"BM"
        + struct.pack("<IHHI", data_offset + len(body), 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, bitcount, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def test_bmp_24bit_bottom_up_with_padding():
    px = _rng_pixels(3, 3, 3)  # 9-byte rows pad to 12
    rgb, w, h = decode(_bmp_bytes(px, 24))
    assert (w, h) == (3, 3)
    assert np.array_equal(rgb, px)


def test_bmp_32bit_top_down():
    px = _rng_pixels(2, 5, 3)
    rgb, w, h = decode(_bmp_bytes(px, 32, top_down=True))
    assert (w, h) == (5, 2)
    assert np.array_equal(rgb, px)


def test_bmp_compressed_unsupported():
    raw = bytearray(_bmp_bytes(_rng_pixels(2, 2, 3), 24))
    struct.pack_into("<I", raw, 30, 1)  # BI_RLE8
    with pytest.raises(UnsupportedImageError):
        decode(bytes(raw))


def test_bmp_truncated_is_corrupt():
    raw = _bmp_bytes(_rng_pixels(4, 4, 3), 24)
    with pytest.raises(CorruptImageError):
        decode(raw[:-8])


# -- dispatch + shared feature math ------------------------------------------

def test_unknown_magic_unsupported():
    with pytest.raises(UnsupportedImageError):
        decode(b"\xff\xd8\xff\xe0 JPEG-ish")


def test_feature_identical_across_png_and_bmp_encodings():
    """The SAME pixels through PNG and BMP containers produce bit-identical
    features — the mixed-decoder determinism claim reduced to what this
    container can verify (both formats are lossless, the feature math is
    shared numpy over decoded pixels)."""
    from merge_machine_spark.functions.multimodal import _decode_image_bytes

    px = _rng_pixels(10, 7, 3)
    v_png, w1, h1 = _decode_image_bytes(encode_png(px, color_type=2, filters=[4, 3, 2, 1, 0, 4, 3, 2, 1, 0]))
    v_bmp, w2, h2 = _decode_image_bytes(_bmp_bytes(px, 24))
    assert (w1, h1) == (w2, h2) == (7, 10)
    assert np.array_equal(v_png, v_bmp)
    assert abs(float(np.linalg.norm(v_png)) - 1.0) < 1e-6


def test_looks_like_image_magic_sniff():
    """The sniff must recognise the common real-image containers (so a
    pillow-less worker stubs them consistently with pillow decoding them)
    and reject non-image payloads (so both environments agree on
    decode_ok=False)."""
    from merge_machine_spark.functions.miniimage import looks_like_image

    assert looks_like_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
    assert looks_like_image(b"BM" + b"\x00" * 52)
    assert looks_like_image(b"\xff\xd8\xff\xe0" + b"\x00" * 8)  # JPEG
    assert looks_like_image(b"GIF89a" + b"\x00" * 8)
    assert looks_like_image(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8)
    assert looks_like_image(b"II*\x00" + b"\x00" * 8)  # TIFF LE
    assert looks_like_image(b"MM\x00*" + b"\x00" * 8)  # TIFF BE
    assert not looks_like_image(b"RIFF\x00\x00\x00\x00WAVEfmt ")  # WAV audio
    assert not looks_like_image(b"ID3\x04" + b"\x00" * 8)  # MP3
    assert not looks_like_image(b"random bytes, not an image")
    assert not looks_like_image(b"")


def test_png_decompression_bomb_is_bounded():
    """A tiny IDAT claiming huge dimensions must raise CorruptImageError
    from the bounded inflate, not materialize gigabytes (code-review r5:
    unbounded zlib.decompress would OOM-kill the worker before the size
    check ran)."""
    import struct
    import zlib

    from merge_machine_spark.functions.miniimage import CorruptImageError, decode

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", zlib.crc32(ctype + data))

    # IHDR claims 50000x50000 (2.5e9 px): rejected by the MAX_PIXELS cap
    # before any inflate is attempted
    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00" * 1000, 9)
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )
    with pytest.raises(CorruptImageError, match="pixel limit"):
        decode(payload)

    # and below the cap, a stream inflating PAST the promised size is cut
    # off by the bounded decompressobj (expected+1) and flagged corrupt
    ihdr2 = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)  # expects 52 bytes
    idat2 = zlib.compress(b"\x00" * 100_000, 9)
    payload2 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr2) + chunk(b"IDAT", idat2) + chunk(b"IEND", b"")
    )
    with pytest.raises(CorruptImageError, match="size mismatch"):
        decode(payload2)


def test_resize_box_known_values_and_shapes():
    import numpy as np

    from merge_machine_spark.functions.multimodal import resize_box

    # 4x4 -> 2x2: each output cell is the mean of a 2x2 block
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = resize_box(img, 2, 2)
    assert out.shape == (2, 2)
    assert out[0, 0] == np.mean([0, 1, 4, 5]) and out[1, 1] == np.mean([10, 11, 14, 15])
    # channel axis passes through: (H, W, 3) -> (2, 2, 3)
    rgb = np.stack([img, img + 1, img + 2], axis=-1)
    out3 = resize_box(rgb, 2, 2)
    assert out3.shape == (2, 2, 3) and (out3[:, :, 1] == out + 1).all()
    # upscale-degenerate input: 1x1 image still fills every cell (no NaN)
    tiny = resize_box(np.array([[7.0]]), 4, 4)
    assert tiny.shape == (4, 4) and (tiny == 7.0).all()
