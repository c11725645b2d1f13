"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed in Arrow batches via
mapInPandas.

The decode step is STUBBED (this container has no image/audio libs —
see `decode_image`); everything Spark-side is real and tested: the
schema contract, the binary payload handling, the batch shape, and the
partition behavior. Swapping the stub for PIL/libav is a one-function
change that does not alter the plan.

Scale notes: mapInPandas streams Arrow record batches — constant
memory per task regardless of table size; binary payloads never pass
through the driver; feature extraction parallelism == partition count.
At 100 TB the payloads would live in the parquet as binary chunks
(or object-store pointers) exactly like this.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

REAL_DECODE = False  # flip when PIL/soundfile are available


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """Decode an image payload → (width, height, format).

    STUB: the container has no imaging libraries. The deterministic
    fake below derives plausible metadata from the payload hash so the
    full pipeline (schema, batching, partitioning) is exercised; the
    real implementation is a drop-in:

        from PIL import Image; im = Image.open(io.BytesIO(payload))
        return im.width, im.height, im.format
    """
    if REAL_DECODE:
        raise NotImplementedError("install PIL and implement real decode")
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, ["png", "jpeg", "webp"][h[2] % 3]


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal metadata pipeline: a binary payload column
    (synthesized from documents.text — at 100 TB this is the stored
    image bytes), decoded per Arrow batch into typed metadata."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    # Capture the decode logic by value (self-contained closure): a
    # reference to the module-level decode_image would require this
    # package on the executor PYTHONPATH.
    real_decode = REAL_DECODE

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_image(payload: bytes) -> tuple[int, int, str]:
            if real_decode:
                raise NotImplementedError("install PIL and implement real decode")
            h = hashlib.sha256(payload).digest()
            return 64 + h[0] % 192, 64 + h[1] % 192, ["png", "jpeg", "webp"][h[2] % 3]

        for pdf in batches:
            metas = [decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return doc.mapInPandas(
        extract,
        "doc_id bigint, n_bytes bigint, width bigint, height bigint, format string",
    )


FEAT_DIM = 16       # feature vector size per payload
FRAME_BYTES = 256   # "frame" granularity for the sampler
FRAME_EVERY = 4     # keep every k-th frame


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction + frame-sampling plumbing over binary
    payloads: each payload → a fixed-dim float feature vector plus a
    sampled-frame count. The extractor is a deterministic STUB (no
    image/audio libs in this container — a real model embeds the
    decoded frames, same signature); the Spark-side contract is real:
    binary in, typed rows out, Arrow batches, executor-only payload
    handling.

    Output is one row per (doc_id, dim) — scalar columns only, so the
    driver's rows-only canonicalizer can hash the result (an
    array<double> column is unhashable driver-side). Internally the
    vector form feeds the similarity operators (q_ann_*,
    q_embedding_neardup) directly; `F.collect_list` over dim
    re-assembles it when needed."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    feat_dim, frame_bytes, frame_every = FEAT_DIM, FRAME_BYTES, FRAME_EVERY

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def features(payload: bytes) -> list[float]:
            # stub embed: per-dim byte means over strided views (a real
            # impl decodes then runs the vision/audio model here)
            n = max(1, len(payload) // feat_dim)
            return [
                round(sum(payload[i * n : (i + 1) * n]) / (255.0 * n), 6)
                for i in range(feat_dim)
            ]

        def sampled_frames(payload: bytes) -> int:
            frames = range(0, max(1, len(payload) // frame_bytes), frame_every)
            return len(list(frames))

        for pdf in batches:
            out_doc, out_dim, out_val, out_frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                nf = sampled_frames(payload)
                for d, v in enumerate(features(payload)):
                    out_doc.append(doc_id)
                    out_dim.append(d)
                    out_val.append(v)
                    out_frames.append(nf)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "dim": out_dim,
                    "value": out_val,
                    "n_frames_sampled": out_frames,
                }
            )

    return doc.mapInPandas(
        extract,
        "doc_id bigint, dim bigint, value double, n_frames_sampled bigint",
    )


RESIZE_W, RESIZE_H = 8, 8  # target "thumbnail" grid for the stub


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over binary payloads — the remaining member of
    the decode/feature/frame-sample family: payload → fixed (W, H)
    grid of byte means (a real impl decodes pixels and interpolates;
    this deterministic stub strides the raw bytes into W·H cells, same
    signature and batch shape). Emits scalar rows (doc_id, px, py,
    value) so the rows-only canonicalizer can hash it; the grid
    reassembles via pivot/collect when a model consumes it."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    w, h = RESIZE_W, RESIZE_H

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def cells(payload: bytes) -> list[float]:
            n_cells = w * h
            step = max(1, len(payload) // n_cells)
            out = []
            for c in range(n_cells):
                chunk = payload[c * step : (c + 1) * step]
                out.append(
                    round(sum(chunk) / (255.0 * len(chunk)), 6) if chunk else 0.0
                )
            return out

        for pdf in batches:
            rows = {"doc_id": [], "px": [], "py": [], "value": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for c, v in enumerate(cells(bytes(p))):
                    rows["doc_id"].append(doc_id)
                    rows["px"].append(c % w)
                    rows["py"].append(c // w)
                    rows["value"].append(v)
            yield pd.DataFrame(rows)

    return doc.mapInPandas(
        resize, "doc_id bigint, px bigint, py bigint, value double"
    )


QUERIES = {
    "q_multimodal_resize": q_multimodal_resize,
    "q_multimodal_meta": q_multimodal_meta,
    "q_multimodal_features": q_multimodal_features,
}


def _hexbyte(pos: int) -> str:
    """DuckDB expression for 0-based byte `pos` of the hex digest
    column `hx` (pure strpos arithmetic — no base-conversion builtin
    needed)."""
    c1 = f"substr(hx, {2 * pos + 1}, 1)"
    c2 = f"substr(hx, {2 * pos + 2}, 1)"
    return (
        f"((strpos('0123456789abcdef', {c1}) - 1) * 16"
        f" + (strpos('0123456789abcdef', {c2}) - 1))"
    )


# q_multimodal_meta IS oracle-checkable while the decode stub is the
# deterministic sha256 fake: DuckDB's sha256(VARCHAR) hashes the same
# UTF-8 bytes mapInPandas receives, so the metadata derivation mirrors
# exactly. When REAL_DECODE flips to a real image decoder, DELETE this
# oracle (the driver falls back to the rows-only check). resize/
# features stay rows-only (their numpy kernels aren't SQL).
ORACLES: dict[str, str] = {
    "q_multimodal_meta": f"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(64 + {_hexbyte(0)} % 192 AS BIGINT) AS width,
               CAST(64 + {_hexbyte(1)} % 192 AS BIGINT) AS height,
               CASE {_hexbyte(2)} % 3 WHEN 0 THEN 'png'
                    WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
        FROM (SELECT doc_id, text, sha256(text) AS hx FROM documents)
    """,
}
