"""Multimodal (binary) column plumbing for training-data pipelines.

Images/audio/video ride as opaque `binary` columns with typed metadata
structs; decode / feature-extract / frame-sample run as Arrow-batched
pandas kernels over `mapInPandas`. The image/audio codec libraries are
not installed in this sandbox, so REAL codec decode is gated behind an
import-try (`decode_image_real`) and raises NotImplementedError when
PIL is absent; everything Spark-side — schemas, batch shapes, UDF
signatures, partitioning — is real and tested against a deterministic
container format (`FakeMedia`, a 16-byte packed header + payload) so
the plumbing is exercised end-to-end without codecs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

MAGIC = b"FMED"
HEADER = struct.Struct(">4sBBHHHI")  # magic kind ver width height sr nframes

KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 1, 2, 3
KIND_NAMES = {KIND_IMAGE: "image", KIND_AUDIO: "audio", KIND_VIDEO: "video"}

MEDIA_DDL = ("media_id long, kind string, payload binary, "
             "meta struct<width:int,height:int,sample_rate:int,n_frames:int>")

META_DDL = ("media_id long, kind string, width int, height int, "
            "sample_rate int, n_frames int, n_bytes long, checksum long")

FEATURE_DDL = "media_id long, feature array<float>"

FRAME_DDL = "media_id long, frame_idx int, frame_bytes binary"


def pack_media(media_id: int, kind: int, width: int = 0, height: int = 0,
               sample_rate: int = 0, n_frames: int = 0,
               payload: bytes = b"") -> bytes:
    return HEADER.pack(MAGIC, kind, 1, width, height, sample_rate,
                       n_frames) + payload


def synth_media_rows(n: int, seed: int = 42) -> list[dict]:
    """Deterministic fake media table rows (no external data)."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = rng.choice([KIND_IMAGE, KIND_AUDIO, KIND_VIDEO])
        w, h, sr, nf = 0, 0, 0, 0
        if kind == KIND_IMAGE:
            w, h = rng.choice([(32, 32), (64, 48), (128, 128)])
            body = bytes(rng.getrandbits(8) for _ in range(w * h))
        elif kind == KIND_AUDIO:
            sr = rng.choice([8000, 16000])
            body = bytes(rng.getrandbits(8) for _ in range(sr // 10))
        else:
            w, h, nf = 16, 16, rng.randint(2, 8)
            body = bytes(rng.getrandbits(8) for _ in range(w * h * nf))
        rows.append({
            "media_id": i, "kind": KIND_NAMES[kind],
            "payload": pack_media(i, kind, w, h, sr, nf, body),
            "meta": {"width": w, "height": h, "sample_rate": sr,
                     "n_frames": nf},
        })
    return rows


# ---------------------------------------------------------------------------
# kernels (mapInPandas)
# ---------------------------------------------------------------------------

def decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Parse the packed header out of the binary payload (real parsing of
    the container; stands in for image header sniffing)."""
    for pdf in batches:
        out = {k: [] for k in ("media_id", "kind", "width", "height",
                               "sample_rate", "n_frames", "n_bytes",
                               "checksum")}
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
            b = bytes(payload)
            magic, k, _ver, w, h, sr, nf = HEADER.unpack_from(b)
            if magic != MAGIC:
                continue
            body = np.frombuffer(b, dtype=np.uint8, offset=HEADER.size)
            out["media_id"].append(int(mid))
            out["kind"].append(kind)
            out["width"].append(w)
            out["height"].append(h)
            out["sample_rate"].append(sr)
            out["n_frames"].append(nf)
            out["n_bytes"].append(len(b))
            out["checksum"].append(int(body.sum()))
        if out["media_id"]:
            yield pd.DataFrame(out)


def byte_histogram_features(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    """256-bin normalized byte histogram per payload body — a
    deterministic, NumPy-vectorized stand-in for an embedding model."""
    for pdf in batches:
        ids, feats = [], []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8,
                              offset=HEADER.size)
            hist = np.bincount(b, minlength=256).astype(np.float32)
            total = hist.sum()
            feats.append((hist / total if total else hist).tolist())
            ids.append(int(mid))
        if ids:
            yield pd.DataFrame({"media_id": ids, "feature": feats})


def sample_frames(every_k: int = 2):
    """Video payloads -> every k-th frame as its own row (1->N explode
    inside the UDF; frame geometry from the header)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # local import: struct.Struct instances aren't picklable, so the
        # closure must not capture module globals by value
        from bank_statement_pdf_parser_spark.operators.multimodal import (
            HEADER, KIND_VIDEO, MAGIC)
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                magic, k, _v, w, h, _sr, nf = HEADER.unpack_from(b)
                if magic != MAGIC or k != KIND_VIDEO or not (w and h):
                    continue
                fsize = w * h
                body = b[HEADER.size:]
                for fi in range(0, nf, every_k):
                    ids.append(int(mid))
                    idxs.append(fi)
                    frames.append(body[fi * fsize:(fi + 1) * fsize])
            if ids:
                yield pd.DataFrame(
                    {"media_id": ids, "frame_idx": idxs,
                     "frame_bytes": frames})
    return kernel


def decode_image_real(payload: bytes):
    """Real codec path, gated: raises NotImplementedError without PIL."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec libraries are not installed in this sandbox; "
            "the FakeMedia container exercises the Spark-side plumbing "
            "instead") from e
    import io
    from PIL import Image
    return Image.open(io.BytesIO(payload))
