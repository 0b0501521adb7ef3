"""Multimodal column plumbing — opaque binary payloads + typed metadata.

The decode libraries (PIL/ffmpeg/soundfile) are NOT in this container,
so the actual pixel/sample decode is stubbed (clearly marked below).
Everything around it is real and tested: schema, small-batch actor-pool
stages, per-actor setup, deterministic fake decode for pipeline tests,
and the output layout.  At scale these stages run with small
``batch_size`` (large binary rows) and bounded ``concurrency`` so
object-store pressure stays low (ray_guide.md "Pitfalls").
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BLOB_SCHEMA = pa.schema(
    [
        ("blob_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)

FAKE_MAGIC = b"FIMG"  # deterministic fake image header: FIMG + u16 w + u16 h


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    body = np.random.default_rng(seed).integers(0, 256, width * height, dtype=np.int64)
    return FAKE_MAGIC + struct.pack("<HH", width, height) + body.astype(np.uint8).tobytes()


class BlobStats:
    """Cheap metadata extraction — vectorized, no decode needed."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column("payload").combine_chunks()
        n_bytes = pc.cast(pc.binary_length(payload), pa.int64())
        digests = [hashlib.md5(p).hexdigest() for p in payload.to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("blob_id"), n_bytes, pa.array(digests, type=pa.string())],
            names=["blob_id", "n_bytes", "digest"],
        )


class ImageDecodeStage:
    """Actor-pool image decode stage (setup once per actor in __init__).

    ``fake=True`` parses the deterministic FIMG header (tests the full
    Ray plumbing); ``fake=False`` is the production path and raises
    until a real image library is available in the environment.
    """

    OUT_SCHEMA = pa.schema(
        [
            ("blob_id", pa.string()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("mean_pixel", pa.float64()),
        ]
    )

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            # STUB: real decode needs an image library not present in
            # this container.  The actor-pool/batch plumbing is what we
            # test; swap this guard for `import PIL.Image` when present.
            raise NotImplementedError(
                "real image decode requires PIL/opencv — not available in this environment"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, means = [], [], [], []
        for bid, p in zip(batch.column("blob_id").to_pylist(), batch.column("payload").to_pylist()):
            if p[:4] != FAKE_MAGIC or len(p) < 8:
                raise ValueError(f"not a FIMG payload: {bid}")
            w, h = struct.unpack("<HH", p[4:8])
            body = np.frombuffer(p, dtype=np.uint8, offset=8)
            ids.append(bid)
            widths.append(w)
            heights.append(h)
            means.append(float(body.mean()) if len(body) else 0.0)
        return pa.Table.from_pydict(
            {"blob_id": ids, "width": widths, "height": heights, "mean_pixel": means},
            schema=self.OUT_SCHEMA,
        )


class ImageResizeStage:
    """Actor-pool resize stage: FIMG payload -> FIMG payload at
    (target_w, target_h) via nearest-neighbor index gather.  The fake
    format carries real u8 pixel grids, so the resample math is REAL
    numpy; only the container parse would change with a production
    image library (same stub discipline as ImageDecodeStage)."""

    def __init__(self, target_w: int, target_h: int, fake: bool = True):
        self.tw, self.th = int(target_w), int(target_h)
        if not fake:
            raise NotImplementedError(
                "real image resize requires PIL/opencv — not available in this environment"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for bid, p in zip(batch.column("blob_id").to_pylist(), batch.column("payload").to_pylist()):
            if p[:4] != FAKE_MAGIC or len(p) < 8:
                raise ValueError(f"not a FIMG payload: {bid}")
            w, h = struct.unpack("<HH", p[4:8])
            body = np.frombuffer(p, dtype=np.uint8, offset=8, count=w * h).reshape(h, w)
            yi = (np.arange(self.th) * h // self.th).astype(np.int64)
            xi = (np.arange(self.tw) * w // self.tw).astype(np.int64)
            out = body[yi][:, xi]
            ids.append(bid)
            payloads.append(FAKE_MAGIC + struct.pack("<HH", self.tw, self.th) + out.tobytes())
        return pa.Table.from_pydict(
            {
                "blob_id": pa.array(ids, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "media_type": pa.array(["image/fimg"] * len(ids), type=pa.string()),
            },
            schema=BLOB_SCHEMA,
        )


class AudioFrameStage:
    """Actor-pool audio frame-sampling stage — same stub discipline."""

    def __init__(self, frame_ms: int = 25, fake: bool = True):
        self.frame_ms = frame_ms
        if not fake:
            raise NotImplementedError(
                "real audio decode requires soundfile/ffmpeg — not available here"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fake: treat payload bytes as 8 kHz u8 samples
        ids, n_frames = [], []
        samples_per_frame = 8000 * self.frame_ms // 1000
        for bid, p in zip(batch.column("blob_id").to_pylist(), batch.column("payload").to_pylist()):
            ids.append(bid)
            n_frames.append(max(0, len(p) // samples_per_frame))
        return pa.Table.from_pydict({"blob_id": ids, "n_frames": n_frames})


FAKE_VMAGIC = b"FVID"  # fake video: FVID + u16 w + u16 h + u32 n_frames + frames


def make_fake_video(width: int, height: int, n_frames: int, seed: int = 0) -> bytes:
    body = np.random.default_rng(seed).integers(
        0, 256, width * height * n_frames, dtype=np.int64
    )
    return (
        FAKE_VMAGIC
        + struct.pack("<HHI", width, height, n_frames)
        + body.astype(np.uint8).tobytes()
    )


class VideoFrameSampleStage:
    """Actor-pool video frame-sampling stage: every ``stride``-th frame
    of each payload is emitted as one FIMG image blob (feeding the
    image stages downstream).  Same stub discipline: the fake FVID
    container carries real pixel grids so the frame-slicing math is
    REAL numpy; only the demux would change with ffmpeg present."""

    def __init__(self, stride: int = 10, fake: bool = True):
        self.stride = max(1, int(stride))
        if not fake:
            raise NotImplementedError(
                "real video demux requires ffmpeg — not available in this environment"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for bid, p in zip(batch.column("blob_id").to_pylist(), batch.column("payload").to_pylist()):
            if p[:4] != FAKE_VMAGIC or len(p) < 12:
                raise ValueError(f"not an FVID payload: {bid}")
            w, h, nf = struct.unpack("<HHI", p[4:12])
            frames = np.frombuffer(p, dtype=np.uint8, offset=12, count=w * h * nf).reshape(
                nf, h, w
            )
            for fi in range(0, nf, self.stride):
                ids.append(f"{bid}#f{fi:06d}")
                payloads.append(
                    FAKE_MAGIC + struct.pack("<HH", w, h) + frames[fi].tobytes()
                )
        return pa.Table.from_pydict(
            {
                "blob_id": pa.array(ids, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "media_type": pa.array(["image/fimg"] * len(ids), type=pa.string()),
            },
            schema=BLOB_SCHEMA,
        )


def blobs_from_documents(sf_dir: str):
    """Deterministic binary-column dataset derived from documents.text
    (utf8 bytes as payload) — exercises the binary plumbing with an
    exact SQL oracle (octet_length/md5 on text)."""
    import ray.data as rd

    def to_blob(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        payload = text.cast(pa.binary())
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("doc_id"), pa.string()),
                payload,
                pa.array(["text/plain"] * batch.num_rows, type=pa.string()),
            ],
            schema=BLOB_SCHEMA,
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(to_blob, batch_format="pyarrow", zero_copy_batch=True)
