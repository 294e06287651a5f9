"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a `kind` tag and a
JSON-ish meta column. Decode / feature-extract / resize / frame-sample are
actor-pool map_batches stages whose Ray-side plumbing (schema, batch size,
actor signature, output layout) is real and tested; the actual codecs are
NOT in this container, so the decode kernel is stubbed: it raises
NotImplementedError unless constructed with fake=True, in which case a
deterministic fake decoder (parses dimensions baked into the payload
header) stands in. Swap `_decode_impl` for a real libjpeg/ffmpeg call in
production — nothing else changes.

Scale notes: payload batches are kept SMALL (batch_size trades off against
payload width — a 4 MB image at batch 1024 is 4 GB per task heap); stages
run as actor pools so codec init happens once per actor.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

FAKE_MAGIC = b"FAKEIMG1"


def encode_fake_payload(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake 'image': header (magic, w, h) + seeded byte body."""
    rng = np.random.RandomState(seed)
    body = rng.randint(0, 256, size=width * height, dtype=np.uint8).tobytes()
    head = FAKE_MAGIC + np.array([width, height], dtype="<u4").tobytes()
    return head + body


def docs_to_media(docs: "rd.Dataset") -> "rd.Dataset":
    """Manufacture a media table from documents (test plumbing source):
    (media_id, kind, payload binary, meta string)."""

    def mk(df: pd.DataFrame) -> pa.Table:
        payloads = [
            encode_fake_payload(16 + (n % 32), 8 + (n % 16), seed=int(d))
            for d, n in zip(df["doc_id"], df["n_chars"])
        ]
        meta = [json.dumps({"src": s}, sort_keys=True) for s in df["source"]]
        return pa.table(
            {
                "media_id": pa.array(df["doc_id"].values, pa.int64()),
                "kind": pa.array(["image"] * len(df), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(meta, pa.string()),
            }
        )

    return docs.map_batches(mk, batch_format="pandas")


class DecodeImage:
    """Actor-pool decode stage. Real codec absent in this container: pass
    fake=True for the deterministic stub; fake=False raises on first batch
    (clearly-marked stub, per the build contract)."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode_impl(self, payload: bytes):
        if not self.fake:
            raise NotImplementedError(
                "real image codec not available in this environment; "
                "construct DecodeImage(fake=True) or plug in libjpeg/PIL here"
            )
        assert payload[:8] == FAKE_MAGIC, "not a fake payload"
        w, h = np.frombuffer(payload[8:16], dtype="<u4")
        body = np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8)
        return int(w), int(h), body

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means, checksums = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, body = self._decode_impl(payload)
            widths.append(w)
            heights.append(h)
            means.append(float(body.mean()) if body.size else 0.0)
            checksums.append(zlib.crc32(body.tobytes()))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "mean_pixel": pa.array(means, pa.float64()),
                "checksum": pa.array(np.array(checksums, dtype=np.int64)),
            }
        )


class ResizeImage:
    """Stub resize: fake path downsamples the fake body by striding."""

    def __init__(self, target: int = 8, fake: bool = False):
        self.target = target
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column("payload").to_pylist():
            if not self.fake:
                raise NotImplementedError("real resize kernel not available; use fake=True")
            w, h = np.frombuffer(payload[8:16], dtype="<u4")
            body = np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8).reshape(h, w)
            sy = max(1, h // self.target)
            sx = max(1, w // self.target)
            small = body[::sy, ::sx]
            head = FAKE_MAGIC + np.array([small.shape[1], small.shape[0]], dtype="<u4").tobytes()
            out.append(head + small.tobytes())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(out, pa.binary()),
                "meta": batch.column("meta"),
            }
        )


FAKE_VID_MAGIC = b"FAKEVID1"


def encode_fake_video(n_frames: int, frame_bytes: int, seed: int = 0) -> bytes:
    """Deterministic fake 'video': header (magic, n_frames, frame_bytes) +
    concatenated seeded frame bodies."""
    rng = np.random.RandomState(seed)
    body = rng.randint(0, 256, size=n_frames * frame_bytes, dtype=np.uint8).tobytes()
    head = FAKE_VID_MAGIC + np.array([n_frames, frame_bytes], dtype="<u4").tobytes()
    return head + body


class FrameSample:
    """Actor-pool frame-sampling stage: every k-th frame of a video payload
    becomes one output row (media_id, frame_idx, frame binary, checksum).

    Same stub contract as DecodeImage: the container has no real demuxer,
    so fake=False raises on first batch and fake=True parses the
    deterministic fake container. The Ray plumbing — one input row fans out
    to n_frames/k output rows, small batch_size against payload width,
    per-actor init — is real and is what a production ffmpeg-backed
    implementation would reuse unchanged.
    """

    def __init__(self, every_k: int = 2, fake: bool = False):
        self.k = every_k
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, frames, sums = [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if not self.fake:
                raise NotImplementedError(
                    "real video demuxer not available; construct FrameSample(fake=True) "
                    "or plug in ffmpeg here"
                )
            assert payload[:8] == FAKE_VID_MAGIC, "not a fake video payload"
            nf, fb = np.frombuffer(payload[8:16], dtype="<u4")
            body = np.frombuffer(payload[16 : 16 + nf * fb], dtype=np.uint8)
            for fi in range(0, int(nf), self.k):
                frame = body[fi * fb : (fi + 1) * fb]
                ids_out.append(mid)
                idx_out.append(fi)
                frames.append(frame.tobytes())
                sums.append(zlib.crc32(frame.tobytes()))
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(idx_out, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
                "checksum": pa.array(np.array(sums, dtype=np.int64)),
            }
        )


def frame_sample(media: "rd.Dataset", *, every_k: int = 2, fake: bool = True,
                 batch_size: int = 64) -> "rd.Dataset":
    """Frame-sampling wiring: tiny batches (video payloads are wide), actor
    pool, one-to-many row fanout."""
    from ccl_ray.functions.bind import bound_class

    return media.map_batches(
        bound_class(FrameSample, every_k=every_k, fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4), max_restarts=0,
    )


def docs_to_videos(docs: "rd.Dataset") -> "rd.Dataset":
    """Manufacture a fake video table from documents (test plumbing source)."""

    def mk(df: pd.DataFrame) -> pa.Table:
        payloads = [
            encode_fake_video(4 + (n % 8), 64, seed=int(d))
            for d, n in zip(df["doc_id"], df["n_chars"])
        ]
        return pa.table(
            {
                "media_id": pa.array(df["doc_id"].values, pa.int64()),
                "kind": pa.array(["video"] * len(df), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(["{}"] * len(df), pa.string()),
            }
        )

    return docs.map_batches(mk, batch_format="pandas")


def media_meta(media: "rd.Dataset", *, fake: bool = True, batch_size: int = 256) -> "rd.Dataset":
    """Decode stage wiring: small batches (payload width!), actor pool."""
    from ccl_ray.functions.bind import bound_class

    return media.map_batches(
        bound_class(DecodeImage, fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4), max_restarts=0,
    )
