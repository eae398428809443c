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


class PilDecoder:
    """Codec-backed decoder used when the PIL wheel is present.

    Probes PIL at construction (i.e. once per actor, in ``__init__`` of
    the map_batches actor that holds it) — constructing it without PIL
    raises ImportError, which ``auto_decoder_cls`` turns into the
    FakeDecoder fallback.  Decodes ``inline:<base64>`` media_refs (bytes
    carried in the ref itself — the shape unit tests use); refs that
    are opaque storage pointers need the fetch layer of a real
    deployment and raise NotImplementedError, same as RealDecoder."""

    def __init__(self):
        from PIL import Image  # probe: ImportError when wheel absent

        self._Image = Image

    def decode(self, media_ref: str) -> dict:
        if not media_ref.startswith("inline:"):
            raise NotImplementedError(
                "PilDecoder decodes inline:<base64> refs only; opaque "
                "storage refs need the deployment fetch layer")
        import base64
        import io

        raw = base64.b64decode(media_ref[len("inline:"):])
        with self._Image.open(io.BytesIO(raw)) as im:
            return {"width": int(im.width), "height": int(im.height),
                    "n_frames": int(getattr(im, "n_frames", 1))}


def auto_decoder_cls():
    """Opportunistic codec probe: PilDecoder when PIL imports, else the
    deterministic FakeDecoder.  Pass the result as ``decoder_cls`` to
    any media actor; the default stays FakeDecoder so pinned goldens
    are environment-independent."""
    try:
        PilDecoder()
        return PilDecoder
    except ImportError:
        return FakeDecoder


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


RESIZE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("orig_w", pa.int32()),
    ("orig_h", pa.int32()),
    ("out_w", pa.int32()),
    ("out_h", pa.int32()),
])


class MediaResizeActor:
    """Aspect-preserving resize planning over media spans: the real
    pixel work is the decoder seam (RealDecoder swaps in); the
    fit-within-box arithmetic, schema and actor lifecycle are
    production-shaped.  Output dims = largest integer box ≤ (target ×
    target) preserving aspect."""

    def __init__(self, target: int = 224, decoder_cls=FakeDecoder):
        self.target = target
        self.decoder = decoder_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in RESIZE_SCHEMA.names}
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            for span in spans or []:
                if span["kind"] != "media":
                    continue
                f = self.decoder.decode(span["media_ref"])
                w, h = f["width"], f["height"]
                if w >= h:
                    ow = self.target
                    oh = max(1, (h * self.target) // w)
                else:
                    oh = self.target
                    ow = max(1, (w * self.target) // h)
                out["doc_id"].append(doc_id)
                out["media_ref"].append(span["media_ref"])
                out["orig_w"].append(w)
                out["orig_h"].append(h)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
        return pa.Table.from_pydict(out, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("frame_idx", pa.int32()),
])


class FrameSampleActor:
    """Uniform frame sampling over media spans: pick ≤ max_frames
    evenly spaced frame indices from the clip's n_frames (deterministic
    linspace-by-integer-division; the decode itself is the seam)."""

    def __init__(self, max_frames: int = 4, decoder_cls=FakeDecoder):
        self.max_frames = max_frames
        self.decoder = decoder_cls()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in FRAME_SCHEMA.names}
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            for span in spans or []:
                if span["kind"] != "media":
                    continue
                n = self.decoder.decode(span["media_ref"])["n_frames"]
                k = min(self.max_frames, n)
                for i in range(k):
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(span["media_ref"])
                    out["frame_idx"].append((i * n) // k)
        return pa.Table.from_pydict(out, schema=FRAME_SCHEMA)


def _media_stage(extracted_ds, actor_cls, *, batch_size=64,
                 concurrency=None, **actor_kwargs):
    import ray

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, ncpu // 2))
    return extracted_ds.map_batches(
        actor_cls, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=actor_kwargs)


def media_resize(extracted_ds, target: int = 224, **kw):
    """Resize-plan table over an extracted-documents dataset."""
    return _media_stage(extracted_ds, MediaResizeActor, target=target,
                        **kw)


def frame_sample(extracted_ds, max_frames: int = 4, **kw):
    """Sampled-frame index table over an extracted-documents dataset."""
    return _media_stage(extracted_ds, FrameSampleActor,
                        max_frames=max_frames, **kw)


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
