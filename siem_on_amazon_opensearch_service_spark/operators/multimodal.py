"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata; decode / feature-extract as Arrow-batched pandas UDFs.

The Spark-side plumbing (schema, partitioning, UDF signature, batch
shape) is real and tested; the actual media decode is STUBBED with a
deterministic fake (this container has no image/audio libs — see
``decode_image_stub``), gated so a real decoder drops in unchanged.

Reference analog: the magic-byte compression sniffer that routes every
S3 object by its first bytes (reference siem/utils.py:913-927 +
siem/__init__.py:385-446) — here generalized to media containers.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic-byte table (hex prefix -> format), the S1 sniffing analog.
MAGIC = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("1F8B", "gzip"),
    ("504B0304", "zip"),
    ("425A68", "bzip2"),
    ("52494646", "riff"),  # wav/avi container
    ("664C6143", "flac"),
]

FEATURE_SCHEMA = (
    "media_id long, fmt string, n_bytes long, width int, height int, "
    "feature array<float>"
)


def sniff_format_col(bin_col: str | Column) -> Column:
    """Native magic-byte sniff: hex-prefix compare, first match wins,
    'unknown' otherwise. Stays in whole-stage codegen."""
    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    h = F.hex(c)
    out: Column = F.lit("unknown")
    for prefix, fmt in reversed(MAGIC):
        out = F.when(
            F.substring(h, 1, len(prefix)) == prefix, F.lit(fmt)
        ).otherwise(out)
    return out


def duckdb_sniff_sql(bin_expr: str) -> str:
    """DuckDB twin of :func:`sniff_format_col`."""
    out = "'unknown'"
    for prefix, fmt in reversed(MAGIC):
        out = (
            f"(CASE WHEN substr(hex({bin_expr}), 1, {len(prefix)}) = "
            f"'{prefix}' THEN '{fmt}' ELSE {out} END)"
        )
    return out


def media_metadata(df: DataFrame, bin_col: str = "media",
                   id_col: str = "media_id") -> DataFrame:
    """Typed metadata projection over an opaque binary column —
    map-side only, no decode."""
    return df.select(
        F.col(id_col),
        sniff_format_col(bin_col).alias("fmt"),
        F.octet_length(bin_col).cast("long").alias("n_bytes"),
        F.md5(F.col(bin_col).cast("binary")).alias("content_md5"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decoder: a real build replaces this with PIL/libvips.

    Deterministic fake derived from the payload bytes so tests are
    stable: (width, height) from the byte length, 'pixels' from a
    repeating byte pattern. Raises on empty payloads exactly like a
    real decoder would on truncated files.
    """
    if not payload:
        raise ValueError("empty media payload")
    n = len(payload)
    w = 1 + (n % 64)
    h = 1 + ((n // 64) % 64)
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(w * h / arr.size))
    pix = np.tile(arr, reps)[: w * h].reshape(h, w)
    return w, h, pix


def extract_features(df: DataFrame, bin_col: str = "media",
                     id_col: str = "media_id",
                     n_features: int = 8) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches —
    the binary payloads never round-trip through Python rows one at a
    time). Feature = per-band mean of the (stubbed) pixel array; the
    UDF body is where a real model embedding would run.
    """
    cols = df.select(id_col, bin_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            out = []
            for mid, payload in zip(b[id_col], b[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, pix = decode_image_stub(raw)
                except ValueError:
                    out.append((int(mid), "error", 0, 0, 0,
                                np.zeros(n_features, dtype=np.float32)))
                    continue
                bands = np.array_split(pix.ravel().astype(np.float64), n_features)
                feat = np.array([bb.mean() if bb.size else 0.0 for bb in bands],
                                dtype=np.float32)
                fmt = "stub"
                out.append((int(mid), fmt, len(raw), w, h, feat))
            yield pd.DataFrame(
                out,
                columns=["media_id", "fmt", "n_bytes", "width", "height",
                         "feature"],
            )

    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic binary media column for tests/benches: the text
    bytes behind a per-row magic header (cycling through MAGIC). This
    is test scaffolding — real corpora carry real payload bytes."""
    variants = [m[0] for m in MAGIC[:4]]
    header = F.element_at(
        F.array(*[F.lit(v) for v in variants]),
        (F.col(id_col) % len(variants) + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.concat(
            F.unhex(header), F.encode(F.col(text_col), "UTF-8")
        ).alias("media"),
    )


RESIZE_SCHEMA = ("media_id long, width int, height int, "
                 "pixels array<float>")

FRAME_SCHEMA = ("media_id long, frame_idx int, n_frames int, "
                "feature array<float>")


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  bin_col: str = "media",
                  id_col: str = "media_id") -> DataFrame:
    """Decode + nearest-neighbor resize via ``mapInPandas``.  The
    resampling math (index grid + gather) is REAL — only the pixel
    source is the stub decoder — so a real decoder drops in without
    touching the Spark plumbing.  Output pixels are row-major floats
    in [0, 255] at exactly (target_h, target_w)."""
    cols = df.select(id_col, bin_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            out = []
            for mid, payload in zip(b[id_col], b[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, pix = decode_image_stub(raw)
                except ValueError:
                    continue
                # nearest-neighbor index grids (the classic resize)
                ys = np.minimum(
                    (np.arange(target_h) * h / target_h).astype(int),
                    h - 1)
                xs = np.minimum(
                    (np.arange(target_w) * w / target_w).astype(int),
                    w - 1)
                small = pix[np.ix_(ys, xs)].astype(np.float32)
                out.append((int(mid), target_w, target_h,
                            small.ravel()))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "pixels"])

    return cols.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_sample: int,
                  bin_col: str = "media", id_col: str = "media_id",
                  frame_bytes: int = 256,
                  n_features: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: treat the payload as a
    concatenation of fixed-size frames, pick ``n_sample``
    evenly-spaced frame indices (the standard uniform temporal
    sampler: ``floor((i + 0.5) * n_frames / n_sample)``), decode each
    SELECTED frame only, and emit one feature row per (media, frame).

    One payload never decodes more than ``n_sample`` frames — at 100
    TB the whole point of sampling is to avoid touching the other
    bytes; a real container parser would seek, the stub slices."""
    cols = df.select(id_col, bin_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if b.empty:
                continue
            out = []
            for mid, payload in zip(b[id_col], b[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(raw) // frame_bytes)
                idxs = sorted({
                    int((i + 0.5) * n_frames / n_sample)
                    for i in range(min(n_sample, n_frames))
                })
                for fi in idxs:
                    chunk = raw[fi * frame_bytes:(fi + 1) * frame_bytes]
                    try:
                        _w, _h, pix = decode_image_stub(chunk)
                    except ValueError:
                        continue
                    bands = np.array_split(
                        pix.ravel().astype(np.float64), n_features)
                    feat = np.array(
                        [bb.mean() if bb.size else 0.0 for bb in bands],
                        dtype=np.float32)
                    out.append((int(mid), fi, n_frames, feat))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "n_frames",
                              "feature"])

    return cols.mapInPandas(run, schema=FRAME_SCHEMA)
