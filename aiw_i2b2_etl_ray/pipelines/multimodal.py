"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as actor-pool map_batches stages.

The container has no image/audio codecs, so the decode step is STUBBED
behind ``FakeDecoder`` (a clearly-marked deterministic stand-in) — the
Ray-side plumbing is real and tested: binary column schema, small batch
sizes for large payloads, actor-pool signature, typed feature output.

Swap ``FakeDecoder`` for a real one (PIL/torchvision/ffmpeg) by
implementing ``decode(payload: bytes) -> dict``; everything else is
unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

#: batch size for binary payload stages: payload_bytes x batch x concurrency
#: must fit the worker heap — for ~1 MB images that means O(100), not 64k.
BINARY_BATCH_SIZE = 256


class FakeDecoder:
    """STUB decoder (no codecs in this environment).

    Deterministic fake: 'decodes' a payload into (width, height, n_channels)
    derived from its sha256, so tests exercise the full plumbing with stable
    outputs.  A real implementation raises NotImplementedError paths away.
    """

    def decode(self, payload: bytes) -> dict:
        h = hashlib.sha256(payload).digest()
        return {
            "width": 64 + h[0] % 192,
            "height": 64 + h[1] % 192,
            "n_channels": 1 + h[2] % 3,
        }


class PILDecoder:
    """REAL image decoder, available when the environment ships Pillow
    (import-guarded; this container does not, so tests skip it).  Same
    ``decode(payload) -> dict`` surface as :class:`FakeDecoder` — the swap
    is one constructor argument, everything else in the pipeline is
    unchanged."""

    def __init__(self):
        from PIL import Image  # raises ImportError where unavailable

        self._Image = Image

    def decode(self, payload: bytes) -> dict:
        import io

        with self._Image.open(io.BytesIO(payload)) as im:
            return {
                "width": im.width,
                "height": im.height,
                "n_channels": len(im.getbands()),
            }


def real_decoder_available() -> bool:
    """True when an actual image codec (Pillow) is importable — the
    pytest skip-if gate for the real-decoder path."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


class MultimodalFeatures:
    """Actor-pool stage: decode the binary column + emit typed features.
    Decoder construction happens ONCE per actor (the model-load slot).
    Default decoder is the deterministic FakeDecoder (oracle-checkable in
    this codec-less container); pass ``decoder_cls=PILDecoder`` where
    Pillow exists to decode real images through the identical plumbing."""

    def __init__(self, decoder_cls=FakeDecoder):
        self.decoder = decoder_cls()

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"]
        n_bytes = np.empty(len(t), dtype=np.int64)
        width = np.empty(len(t), dtype=np.int32)
        height = np.empty(len(t), dtype=np.int32)
        chans = np.empty(len(t), dtype=np.int32)
        for i, v in enumerate(payloads):
            b = v.as_py() or b""
            n_bytes[i] = len(b)
            meta = self.decoder.decode(b)
            width[i] = meta["width"]
            height[i] = meta["height"]
            chans[i] = meta["n_channels"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "media_type": t["media_type"],
                "n_bytes": pa.array(n_bytes),
                "width": pa.array(width),
                "height": pa.array(height),
                "n_channels": pa.array(chans),
            }
        )


def _synthesize_binary(sf_dir: str) -> rd.Dataset:
    """Build an opaque-binary dataset from documents (deterministic): the
    utf-8 bytes of text stand in for an encoded media payload."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])

    def to_binary(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # a string column's buffer IS its utf-8 bytes: the payload is a
        # zero-copy cast, not a per-row encode loop
        payload = pc.cast(
            pc.fill_null(t["text"].combine_chunks(), ""), pa.large_binary()
        )
        mt = pc.if_else(
            pc.equal(pc.bit_wise_and(t["doc_id"].combine_chunks(), 1), 0),
            pa.scalar("image"),
            pa.scalar("audio"),
        )
        return pa.table({"doc_id": t["doc_id"], "media_type": mt, "payload": payload})

    return ds.map_batches(to_binary, batch_format="pyarrow")


def multimodal_features(sf_dir: str, decoder_cls=FakeDecoder) -> rd.Dataset:
    """End-to-end: binary column -> actor-pool decode/feature stage.
    ``decoder_cls=PILDecoder`` runs real image decode where Pillow
    exists; the default FakeDecoder keeps the pipeline deterministic and
    oracle-checkable in this codec-less container."""
    return _synthesize_binary(sf_dir).map_batches(
        MultimodalFeatures,
        fn_constructor_kwargs={"decoder_cls": decoder_cls},
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,
        concurrency=(1, 4),
        num_cpus=1,
    )


class FrameSampler:
    """Frame-sampling stage (video analog): emit every k-th 'frame' of each
    payload as its own row — a flat-map-shaped actor stage whose output is
    larger than its input (the decode fan-out case).  Frame extraction is
    STUBBED (fixed-size byte windows stand in for decoded frames); the
    Ray-side semantics — per-row fan-out, small batches, typed output,
    stable frame indices — are real.
    """

    FRAME_BYTES = 64

    def __init__(self, every_k: int = 4):
        self.k = every_k

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, frame_idx, frames = [], [], []
        for did, v in zip(t["doc_id"].to_pylist(), t["payload"]):
            b = v.as_py() or b""
            n_frames = max(1, len(b) // self.FRAME_BYTES)
            for fi in range(0, n_frames, self.k):
                doc_ids.append(did)
                frame_idx.append(fi)
                frames.append(b[fi * self.FRAME_BYTES : (fi + 1) * self.FRAME_BYTES])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )


def frame_sample(sf_dir: str, every_k: int = 4) -> rd.Dataset:
    """Catalog op: sample every k-th frame from each binary payload,
    emitting per-frame digests (sha256 + byte count).  The raw frame bytes
    exist inside the pipeline (FrameSampler output) but never reach the
    driver — digesting at the edge is both the scale-correct shape and what
    makes the output value-comparable (raw binary stringifies differently
    across pandas/duckdb bridges)."""
    frames = _synthesize_binary(sf_dir).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def digest(t: pa.Table) -> pa.Table:
        fb = t["frame"]
        shas = [hashlib.sha256(v.as_py() or b"").hexdigest() for v in fb]
        nb = pa.array([len(v.as_py() or b"") for v in fb], pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "frame_idx": t["frame_idx"],
                "frame_sha256": pa.array(shas, pa.string()),
                "frame_bytes": nb,
            }
        )

    return frames.map_batches(digest, batch_format="pyarrow")


# --- DuckDB oracles ----------------------------------------------------------
# The decode is a STUB, but a *deterministic* one (features derive from the
# payload's sha256), so the whole plumbing — binary synthesis, actor-pool
# decode, frame fan-out — is oracle-checkable end-to-end: the SQL recomputes
# the same features from the same bytes (hex-digit arithmetic for the
# sha256-derived fields, blob substring for the frame windows).

_HEXB = (
    "(strpos('0123456789abcdef', substr(hx,{a},1))-1)*16"
    " + strpos('0123456789abcdef', substr(hx,{b},1))-1"
)

SQL_MULTIMODAL_FEATURES = f"""
WITH h AS (
  SELECT doc_id, sha256(text) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
),
b AS (
  SELECT doc_id, n_bytes,
         {_HEXB.format(a=1, b=2)} AS b0,
         {_HEXB.format(a=3, b=4)} AS b1,
         {_HEXB.format(a=5, b=6)} AS b2
  FROM h
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
       n_bytes,
       CAST(64 + b0 % 192 AS INT) AS width,
       CAST(64 + b1 % 192 AS INT) AS height,
       CAST(1 + b2 % 3 AS INT)    AS n_channels
FROM b
"""

# DuckDB has no BLOB substring — byte windows go through hex (2 hex chars
# per byte) and back via unhex, which is byte-exact for any payload.
SQL_MULTIMODAL_FRAMES = """
WITH p AS (SELECT doc_id, hex(encode(text)) AS ph FROM documents),
f AS (
  SELECT doc_id, ph,
         GREATEST(1, (length(ph) // 2) // 64) AS nf
  FROM p
),
w AS (
  SELECT f.doc_id, CAST(fi AS INT) AS frame_idx,
         unhex(substr(ph, CAST(fi*128+1 AS BIGINT), 128)) AS frame
  FROM f, unnest(range(0, nf, 4)) AS t(fi)
)
SELECT doc_id, frame_idx,
       -- DuckDB sha256 takes VARCHAR only; decode(frame) is byte-exact for
       -- these payloads (driver tables are ASCII — verified), and sha256
       -- of a VARCHAR hashes its utf8 bytes, matching the engine's
       -- raw-bytes digest
       sha256(decode(frame))                   AS frame_sha256,
       CAST(octet_length(frame) AS BIGINT)     AS frame_bytes
FROM w
"""


# --- resize ------------------------------------------------------------------

RESIZE_TARGET = 224


def multimodal_resize(sf_dir: str, target: int = RESIZE_TARGET) -> rd.Dataset:
    """Aspect-ratio-preserving resize plan: decode (actor pool) -> compute
    output geometry scaled so max(out_w, out_h) == target.  The pixel
    resampling itself is part of the decode STUB (no codecs here); the
    geometry math is exact integer arithmetic, so — like the other
    multimodal stages — the full chained plumbing (binary synthesis ->
    actor-pool decode -> vectorized resize) is oracle-checkable.

    Reference-free op: this is a training-data pipeline stage (image
    preprocessing), not a reference analog."""
    feats = _synthesize_binary(sf_dir).map_batches(
        MultimodalFeatures,
        batch_format="pyarrow",
        batch_size=BINARY_BATCH_SIZE,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def geometry(t: pa.Table) -> pa.Table:
        w = t["width"].to_numpy().astype(np.int64)
        h = t["height"].to_numpy().astype(np.int64)
        m = np.maximum(w, h)
        out_w = (w * target) // m
        out_h = (h * target) // m
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "width": t["width"],
                "height": t["height"],
                "out_w": pa.array(out_w.astype(np.int32)),
                "out_h": pa.array(out_h.astype(np.int32)),
                "n_pixels_out": pa.array(out_w * out_h),
            }
        )

    # geometry is stateless integer math -> plain vectorized tasks, no actors
    return feats.map_batches(geometry, batch_format="pyarrow")


SQL_MULTIMODAL_RESIZE = f"""
WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents),
b AS (
  SELECT doc_id,
         CAST(64 + ({_HEXB.format(a=1, b=2)}) % 192 AS BIGINT) AS w,
         CAST(64 + ({_HEXB.format(a=3, b=4)}) % 192 AS BIGINT) AS h
  FROM h
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST((w * {RESIZE_TARGET}) // GREATEST(w, h) AS INT) AS out_w,
       CAST((h * {RESIZE_TARGET}) // GREATEST(w, h) AS INT) AS out_h,
       ((w * {RESIZE_TARGET}) // GREATEST(w, h))
         * ((h * {RESIZE_TARGET}) // GREATEST(w, h)) AS n_pixels_out
FROM b
"""
