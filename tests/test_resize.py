"""Image resize operator (multimodal decode -> RESIZE -> feature):
exact nearest semantics, bilinear vs a scalar reference, the actor-pool
stage, and tolerance on undecodable payloads."""

import random

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine.multimodal import (
    ImageResizer,
    decode_pixels,
    make_bmp,
    make_gif,
    make_png,
    make_ppm,
    make_wav,
    resize_image,
    resize_images,
)


def _rand_img(rng, h, w):
    return np.array(
        [[[rng.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)],
        np.uint8,
    )


def _bilinear_ref(px, oh, ow):
    """Scalar half-pixel-center reference (the documented convention).
    Float association mirrors the kernel exactly — (Y+0.5)*(h/oh), not
    ((Y+0.5)*h)/oh — so equality is bit-exact, not approximate."""
    h, w, c = px.shape
    out = np.zeros((oh, ow, c), np.uint8)
    for Y in range(oh):
        fy = (Y + 0.5) * (h / oh) - 0.5
        y0 = min(max(int(np.floor(fy)), 0), h - 1)
        y1 = min(y0 + 1, h - 1)
        wy = min(max(fy - y0, 0.0), 1.0)
        for X in range(ow):
            fx = (X + 0.5) * (w / ow) - 0.5
            x0 = min(max(int(np.floor(fx)), 0), w - 1)
            x1 = min(x0 + 1, w - 1)
            wx = min(max(fx - x0, 0.0), 1.0)
            for C in range(c):
                v = (
                    px[y0, x0, C] * (1 - wy) * (1 - wx)
                    + px[y0, x1, C] * (1 - wy) * wx
                    + px[y1, x0, C] * wy * (1 - wx)
                    + px[y1, x1, C] * wy * wx
                )
                out[Y, X, C] = int(np.floor(v + 0.5))
    return out


def test_nearest_matches_floor_formula():
    rng = random.Random(11)
    for _ in range(20):
        h, w = rng.randint(1, 12), rng.randint(1, 12)
        oh, ow = rng.randint(1, 15), rng.randint(1, 15)
        px = _rand_img(rng, h, w)
        r = resize_image(px, oh, ow, "nearest")
        assert r.shape == (oh, ow, 3)
        for Y in range(oh):
            for X in range(ow):
                assert (r[Y, X] == px[(Y * h) // oh, (X * w) // ow]).all()


def test_bilinear_matches_scalar_reference():
    rng = random.Random(12)
    for _ in range(12):
        h, w = rng.randint(1, 10), rng.randint(1, 10)
        oh, ow = rng.randint(1, 12), rng.randint(1, 12)
        px = _rand_img(rng, h, w)
        assert (resize_image(px, oh, ow, "bilinear") == _bilinear_ref(px, oh, ow)).all()


def test_resize_identity_and_errors():
    px = _rand_img(random.Random(13), 6, 7)
    for method in ("nearest", "bilinear"):
        assert (resize_image(px, 6, 7, method) == px).all()
    with pytest.raises(ValueError):
        resize_image(px, 0, 5)
    with pytest.raises(ValueError):
        resize_image(px, 5, 5, method="bicubic")
    # 2-d grayscale input grows a channel axis
    assert resize_image(px[:, :, 0], 3, 3).shape == (3, 3, 1)


def test_decode_pixels_formats_and_garbage():
    for blob in (make_bmp(5, 4, 3), make_ppm(5, 4, 3), make_png(5, 4, 3),
                 make_gif(5, 4, 2, 3)):
        px = decode_pixels(blob)
        assert px is not None and px.shape == (4, 5, 3) and px.dtype == np.uint8
    # PNG gray + RGBA normalize to 3 channels
    for ct in (0, 6):
        px = decode_pixels(make_png(5, 4, 3, color_type=ct))
        assert px is not None and px.shape == (4, 5, 3)
    assert decode_pixels(make_wav(16)) is None  # audio: not a still image
    rng = random.Random(14)
    for _ in range(30):
        blob = bytes(rng.randrange(256) for _ in range(rng.randint(0, 200)))
        decode_pixels(blob)  # must never raise
    assert decode_pixels(b"") is None
    assert decode_pixels(None) is None


def test_bmp_pixels_are_topdown_rgb():
    # make_bmp writes rows bottom-up BGR; decode_pixels must normalize.
    # Row 0 on disk is the BOTTOM row, byte (y_disk*3w + 3x + c + 7s) % 256.
    w, h, seed = 3, 2, 5
    px = decode_pixels(make_bmp(w, h, seed))
    for y in range(h):
        for x in range(w):
            for c in range(3):
                disk = ((h - 1 - y) * 3 * w + 3 * x + (2 - c) + seed * 7) % 256
                assert px[y, x, c] == disk


def test_resizer_stage(ray_session):
    import ray.data as rd

    rows = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "blob": pa.array(
            [make_ppm(6, 4, 0), b"not an image", make_bmp(5, 3, 1)],
            pa.large_binary(),
        ),
        "oh": pa.array([2, 2, 7], pa.int32()),
        "ow": pa.array([3, 3, 2], pa.int32()),
    })
    out = resize_images(
        rd.from_arrow(rows), "blob", out_h_col="oh", out_w_col="ow",
        method="nearest", concurrency=(1, 2),
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    assert t.column("resize_ok").to_pylist() == [True, False, True]
    assert "blob" not in t.column_names  # payload dropped after the stage
    assert t.column("resized_height").to_pylist() == [2, None, 7]
    assert t.column("resized_width").to_pylist() == [3, None, 2]
    exp0 = int(resize_image(decode_pixels(make_ppm(6, 4, 0)), 2, 3).sum())
    assert t.column("resized_sum").to_pylist()[0] == exp0

    # constant targets + keep_pixels round-trips the raster bytes
    out2 = resize_images(
        rd.from_arrow(rows.select(["doc_id", "blob"])), "blob",
        out_h=3, out_w=3, method="bilinear", keep_pixels=True,
        concurrency=(1, 2),
    )
    t2 = pa.concat_tables(out2.iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    raw = t2.column("resized_rgb").to_pylist()[0]
    got = np.frombuffer(raw, np.uint8).reshape(3, 3, 3)
    exp = resize_image(decode_pixels(make_ppm(6, 4, 0)), 3, 3, "bilinear")
    assert (got == exp).all()


def test_resizer_arg_validation():
    with pytest.raises(ValueError):
        ImageResizer(out_h=2, out_h_col="h", out_w=2)
    with pytest.raises(ValueError):
        ImageResizer(out_h=2)  # width target missing
    with pytest.raises(ValueError):
        ImageResizer(out_h=2, out_w=2, method="lanczos")
