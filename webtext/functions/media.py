"""Multimodal feature extraction over media spans — actor-pool stage with
REAL Ray plumbing and a STUBBED decoder.

This container ships no image/audio codecs, so ``FakeDecoder`` derives
deterministic pseudo-features (width/height/frames) from the media_ref
hash; a real deployment swaps in a codec-backed decoder with the same
``decode(media_ref) -> dict`` contract — the schema, actor lifecycle,
batch sizing and output layout below are production-shaped and tested.
Raising ``NotImplementedError`` from ``RealDecoder`` marks the seam.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

MEDIA_FEATURES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("kind", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
])


class RealDecoder:  # pragma: no cover - deployment seam
    def decode(self, media_ref: str) -> dict:
        raise NotImplementedError(
            "no media codecs in this environment; swap in a codec-backed "
            "decoder (PIL/ffmpeg) with the same contract")


class FakeDecoder:
    """Deterministic stand-in: features from the ref's crc32."""

    def decode(self, media_ref: str) -> dict:
        h = zlib.crc32(media_ref.encode("utf-8"))
        return {
            "width": 160 + (h & 0x3FF),
            "height": 120 + ((h >> 10) & 0x3FF),
            "n_frames": 1 + ((h >> 20) & 0xFF),
        }


class MediaFeatureActor:
    """map_batches over extraction OUTPUT rows: explode media spans into
    one feature row each.  Decoder loads once per actor (__init__)."""

    def __init__(self, decoder_cls=FakeDecoder):
        self.decoder = decoder_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in MEDIA_FEATURES_SCHEMA.names}
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            for span in spans or []:
                if span["kind"] != "media":
                    continue
                feats = self.decoder.decode(span["media_ref"])
                out["doc_id"].append(doc_id)
                out["media_ref"].append(span["media_ref"])
                out["kind"].append(span["kind"])
                out["width"].append(feats["width"])
                out["height"].append(feats["height"])
                out["n_frames"].append(feats["n_frames"])
        return pa.Table.from_pydict(out, schema=MEDIA_FEATURES_SCHEMA)


def media_features(extracted_ds, *, batch_size: int = 64, concurrency=None):
    """Feature table from an extracted-documents dataset.  Media payloads
    can be large — keep batch_size modest so batch × concurrency fits the
    worker heap (here refs are strings; with real binaries use 8-16)."""
    import ray

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, ncpu // 2))
    return extracted_ds.map_batches(
        MediaFeatureActor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)
