"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched pandas iterators (`mapInPandas`) so payload bytes never
round-trip through Python row objects.

The actual codec libraries (PIL/ffmpeg/soundfile) are NOT in this
container, so the decode kernels are stubbed: `decode=fake` produces a
deterministic feature vector from the bytes (schema/partitioning/batch
shape are fully real and tested); `decode=real` raises
NotImplementedError at the exact point a codec would be called.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int, "
    "payload binary"
)

FEATURE_SCHEMA = "doc_id bigint, media_type string, n_bytes int, feat array<float>"

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap each document's text bytes as a fake media
    payload with plausible metadata (deterministic from doc_id)."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.length("text").cast("int").alias("n_bytes"),
        ((F.col("doc_id") % 8 + 1) * 64).cast("int").alias("width"),
        ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
        F.col("text").cast("binary").alias("payload"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> list:
    # deterministic bytes -> float features (stand-in for a real encoder)
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 997
    return [v / 997.0 for v in acc]


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    Arrow delivers whole column batches to Python; each batch is
    processed vectorized-per-row without JVM round trips. At scale this
    is the standard shape for GPU/codec stages: repartition to match
    worker slots, then one python worker per partition streams batches.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "codec libraries (PIL/ffmpeg) not available in this "
                    "container; use decode='fake' for the deterministic stub"
                )
            feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling stub: emit one 'frame' per N payload bytes for video
    rows (1:N row explosion inside mapInPandas, the real frame-sampler's
    shape).

    The explode is vectorized — np.repeat for row replication, a
    cumsum-offset trick for per-row frame indices — so the template a
    real codec kernel would copy has no per-row Python loop (only the
    unavoidable per-frame byte-slice that produces each output payload).
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video/mp4"]
            if len(vids) == 0:
                yield pd.DataFrame(
                    {"doc_id": [], "frame_idx": [], "frame_bytes": []}
                ).astype({"doc_id": "int64", "frame_idx": "int32"})
                continue
            lens = vids["payload"].map(len).to_numpy()
            reps = np.maximum(np.ceil(np.maximum(lens, 1) / every_n_bytes), 1).astype(
                "int64"
            )
            # frame_idx = position within each row's run of `reps` frames
            idx = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
            ids = np.repeat(vids["doc_id"].to_numpy(), reps)
            payloads = np.repeat(vids["payload"].to_numpy(), reps)
            starts = idx * every_n_bytes
            frames = [
                bytes(p[s : s + every_n_bytes]) for p, s in zip(payloads, starts)
            ]
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idx.astype("int32"), "frame_bytes": frames}
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "out_width int, out_height int, out_bytes binary"
)


def resize_media(media: DataFrame, max_width: int = 128) -> DataFrame:
    """Resize stub (images/videos): cap width at `max_width`, scale
    height by the same integer ratio, and emit a deterministically
    'downscaled' payload (byte prefix proportional to the area ratio —
    a real kernel would hand the batch to PIL/ffmpeg here; the metadata
    arithmetic, vectorized batch shape, and output schema are the real
    contract). Integer arithmetic only (floor(h*tw/w)) so any engine
    reproduces the output dimensions exactly."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["media_type"] != "audio/wav"]
            if len(imgs) == 0:
                yield pd.DataFrame(
                    {
                        "doc_id": [],
                        "media_type": [],
                        "width": [],
                        "height": [],
                        "out_width": [],
                        "out_height": [],
                        "out_bytes": [],
                    }
                ).astype(
                    {
                        "doc_id": "int64",
                        "width": "int32",
                        "height": "int32",
                        "out_width": "int32",
                        "out_height": "int32",
                    }
                )
                continue
            w = imgs["width"].to_numpy()
            h = imgs["height"].to_numpy()
            tw = np.minimum(w, max_width)
            th = (h * tw) // w  # integer-exact scaled height
            lens = imgs["payload"].map(len).to_numpy()
            keep = np.maximum((lens * tw) // w, 1)
            out = [bytes(p[:k]) for p, k in zip(imgs["payload"], keep)]
            yield pd.DataFrame(
                {
                    "doc_id": imgs["doc_id"],
                    "media_type": imgs["media_type"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": tw.astype("int32"),
                    "out_height": th.astype("int32"),
                    "out_bytes": out,
                }
            )

    return media.mapInPandas(kernel, schema=RESIZE_SCHEMA)
