"""Multimodal (image/audio/video) stages — real Ray plumbing, stubbed codecs.

Binary payloads are opaque `binary` columns with typed metadata, processed
by actor-pool ``map_batches`` stages exactly as a production pipeline would
(small batches — payload bytes dominate memory; decode state warmed per
actor). The actual codec calls are STUBBED because no imaging/audio
libraries exist in this environment (requirements of the reference —
PIL/av/pytesseract, /root/reference/requirements.txt:1-6 — are absent):

- ``decode=stub`` (default): deterministic fake decode derived from the
  payload hash — schema, batch sizing, actor signature and output layout
  are real and tested;
- ``decode=strict``: raises NotImplementedError at the decode call site, the
  clearly-marked hook where PIL/libav integration would land.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.fingerprint import chunk_hashes, payload_hash64

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_bytes", pa.int64()),
        ("payload_hash", pa.uint64()),
        ("width", pa.int32()),       # stub-decoded metadata
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # 8-dim stub embedding
    ]
)


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → decoded metadata + feature vector.

    __init__ is where a real pipeline loads the codec/model once per actor;
    the stub initializes the deterministic feature projection instead.
    """

    def __init__(self, decode: str = "stub", frame_window: int = 256) -> None:
        if decode not in ("stub", "strict"):
            raise ValueError(decode)
        self._decode = decode
        self._frame_window = frame_window
        rng = np.random.RandomState(0xFEED)
        self._proj = rng.standard_normal((8, 8)).astype(np.float32)

    def _decode_image(self, data: bytes):
        if self._decode == "strict":
            # REAL-CODEC HOOK: PIL.Image.open(BytesIO(data)) goes here.
            raise NotImplementedError("image decode requires PIL (not in this environment)")
        h = payload_hash64(data)
        # deterministic fake dimensions from the hash
        return 64 + (h & 0x3FF), 64 + ((h >> 10) & 0x3FF)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        n = len(urls)
        n_bytes = np.zeros(n, dtype=np.int64)
        ph = np.zeros(n, dtype=np.uint64)
        w = np.zeros(n, dtype=np.int32)
        hgt = np.zeros(n, dtype=np.int32)
        nf = np.zeros(n, dtype=np.int32)
        feats = []
        for i, data in enumerate(payloads):
            data = bytes(data) if data is not None else b""
            n_bytes[i] = len(data)
            ph[i] = payload_hash64(data)
            wi, hi = self._decode_image(data)
            w[i], hgt[i] = wi, hi
            ch = chunk_hashes(data, self._frame_window)
            nf[i] = len(ch)
            # 8-dim stub feature: byte-histogram moments through a fixed
            # projection (vectorized; stands in for a model forward pass)
            if len(data):
                arr = np.frombuffer(data, dtype=np.uint8)
                hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
                hist /= max(1.0, hist.sum())
            else:
                hist = np.zeros(8, dtype=np.float32)
            feats.append((self._proj @ hist).tolist())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "n_bytes": pa.array(n_bytes),
                "payload_hash": pa.array(ph),
                "width": pa.array(w),
                "height": pa.array(hgt),
                "n_frames": pa.array(nf),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            },
            schema=MEDIA_FEATURES_SCHEMA,
        )


def media_features(pages_ds, *, batch_size: int = 64, concurrency=None,
                   decode: str = "stub"):  # noqa: ANN001
    """pages (url, html binary) → media feature table. Small batch_size on
    purpose: payload bytes × batch × concurrency must fit worker heap;
    concurrency defaults to the cluster-sized pool (autoscaling floor 1)."""
    if concurrency is None:
        from ..pipelines import pool_size

        concurrency = pool_size()
    return pages_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
