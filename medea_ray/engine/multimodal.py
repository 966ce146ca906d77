"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payload columns with typed metadata.

The Ray-side plumbing (schema, actor-pool stage shape, batch sizing,
output layout) is real and tested; the actual media decoding is STUBBED —
image/audio libraries are not in this container. ``decoder="fake"`` is a
deterministic stand-in (hash-derived dimensions/features) used by the
tests; ``decoder="pil"``/``"ffmpeg"`` raise NotImplementedError until the
corresponding library is installed.

Scale notes: binary payloads are large → run with a SMALL batch_size (the
default 64 here vs 2048 for text stages) so batch × concurrency fits the
worker heap; payload columns are dropped right after feature extraction so
only small typed features cross downstream stages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_FEATURE_SCHEMA = pa.schema(
    [
        ("media_ok", pa.bool_()),
        ("media_format", pa.string()),
        ("media_width", pa.int32()),
        ("media_height", pa.int32()),
        ("media_n_bytes", pa.int64()),
        ("media_feature", pa.list_(pa.float32())),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: dimensions and an 8-dim
    feature vector derived from the payload hash."""
    h = hashlib.blake2b(payload, digest_size=16).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feat = (np.frombuffer(h[8:], dtype=np.uint8).astype(np.float32) / 255.0).tolist()
    return {
        "ok": True,
        "format": "fake/v1",
        "width": width,
        "height": height,
        "feature": feat,
    }


class MediaFeatureExtractor:
    """Actor-pool map_batches stage over a binary column.

    A real deployment loads the codec/model once here in ``__init__`` (the
    same pattern as ValidatorActor); ``__call__`` decodes per row and emits
    small typed features, dropping the binary payload.
    """

    def __init__(self, payload_col: str = "html", decoder: str = "fake"):
        self.payload_col = payload_col
        if decoder == "fake":
            self.decode = _fake_decode
        elif decoder in ("pil", "ffmpeg"):
            raise NotImplementedError(
                f"decoder {decoder!r} requires media libraries not present in "
                "this environment; use decoder='fake' for plumbing tests"
            )
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        ok, fmt, w, h, nb, feat = [], [], [], [], [], []
        for p in payloads:
            if p is None:
                ok.append(False)
                fmt.append(None)
                w.append(None)
                h.append(None)
                nb.append(0)
                feat.append(None)
                continue
            d = self.decode(p)
            ok.append(d["ok"])
            fmt.append(d["format"])
            w.append(d["width"])
            h.append(d["height"])
            nb.append(len(p))
            feat.append(d["feature"])
        out = batch.drop_columns([self.payload_col])  # binary never flows on
        for name, vals, typ in [
            ("media_ok", ok, pa.bool_()),
            ("media_format", fmt, pa.string()),
            ("media_width", w, pa.int32()),
            ("media_height", h, pa.int32()),
            ("media_n_bytes", nb, pa.int64()),
            ("media_feature", feat, pa.list_(pa.float32())),
        ]:
            out = out.append_column(name, pa.array(vals, typ))
        return out


def extract_media_features(
    ds,
    payload_col: str = "html",
    decoder: str = "fake",
    batch_size: int = 64,
    concurrency=(1, 8),
):
    """read → decode/feature-extract (actor pool, small batches) →
    narrow typed output."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs=dict(payload_col=payload_col, decoder=decoder),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
