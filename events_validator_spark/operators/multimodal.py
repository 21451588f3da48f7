"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs; all
heavy per-item work (decode, resize, frame-sample, feature-extract) runs in
Arrow-batched ``mapInPandas`` so bytes move executor-side in columnar batches,
never through the driver.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the decode
step is STUBBED: ``decode_stub=True`` (default) produces deterministic fake
features from the bytes; ``decode_stub=False`` raises NotImplementedError at
the exact point a real decoder plugs in. The Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = ("media_ref string, mime string, n_bytes bigint, "
                  "crc32 bigint, sha256 string")
MEDIA_FEATURES_DDL = (MEDIA_META_DDL +
                      ", width int, height int, n_frames int, "
                      "feature array<float>")


def attach_fake_media(df: DataFrame, ref_col: str = "media_ref",
                      payload_col: str = "payload") -> DataFrame:
    """Deterministic fake binary payloads derived from the ref string —
    stand-in for reading object storage; keeps tests hermetic."""
    seed = F.xxhash64(F.col(ref_col))
    blob = F.encode(
        F.concat(F.col(ref_col), F.lit(":"),
                 F.sha2(seed.cast("string"), 256),
                 F.repeat(F.lit("x"), F.pmod(seed, F.lit(4096)).cast("int"))),
        "utf-8")
    return df.withColumn(payload_col, blob)


def extract_media_metadata(df: DataFrame, ref_col: str = "media_ref",
                           payload_col: str = "payload",
                           mime_col: str | None = None) -> DataFrame:
    """Checksums + sizes per media item via mapInPandas (Arrow batches)."""
    mime_idx = df.columns.index(mime_col) if mime_col else None
    ref_idx = df.columns.index(ref_col)
    pay_idx = df.columns.index(payload_col)

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf.iloc[:, ref_idx]
            pays = pdf.iloc[:, pay_idx]
            mimes = (pdf.iloc[:, mime_idx] if mime_idx is not None
                     else pd.Series(["application/octet-stream"] * len(pdf)))
            yield pd.DataFrame({
                "media_ref": refs.values,
                "mime": mimes.values,
                "n_bytes": [len(b) for b in pays],
                "crc32": [zlib.crc32(bytes(b)) for b in pays],
                "sha256": [hashlib.sha256(bytes(b)).hexdigest() for b in pays],
            })

    return df.mapInPandas(meta, MEDIA_META_DDL)


def decode_and_featurize(df: DataFrame, ref_col: str = "media_ref",
                         payload_col: str = "payload",
                         mime_col: str | None = None,
                         feature_dim: int = 16,
                         decode_stub: bool = True) -> DataFrame:
    """Decode → (resize / frame-sample) → feature vector, per media item.

    With ``decode_stub`` the decode is a deterministic fake (hash-seeded
    pseudo-features + plausible dimensions); without it this raises where a
    real PIL/ffmpeg decoder would be called.
    """
    ref_idx = df.columns.index(ref_col)
    pay_idx = df.columns.index(payload_col)
    mime_idx = df.columns.index(mime_col) if mime_col else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_ref", "mime", "n_bytes", "crc32",
                                   "sha256", "width", "height", "n_frames",
                                   "feature")}
            for i in range(len(pdf)):
                ref = pdf.iloc[i, ref_idx]
                raw = bytes(pdf.iloc[i, pay_idx])
                mime = (pdf.iloc[i, mime_idx] if mime_idx is not None
                        else "application/octet-stream")
                if not decode_stub:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg — not present "
                        "in this container; plug the decoder in here")
                # deterministic fake decode: dims + features from the digest
                digest = hashlib.sha256(raw).digest()
                rng = np.random.default_rng(
                    int.from_bytes(digest[:8], "little"))
                out["media_ref"].append(ref)
                out["mime"].append(mime)
                out["n_bytes"].append(len(raw))
                out["crc32"].append(zlib.crc32(raw))
                out["sha256"].append(digest.hex())
                out["width"].append(16 * (1 + digest[8] % 64))
                out["height"].append(16 * (1 + digest[9] % 64))
                out["n_frames"].append(
                    1 if str(mime).startswith("image") else 1 + digest[10] % 300)
                out["feature"].append(
                    rng.standard_normal(feature_dim).astype(np.float32))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, MEDIA_FEATURES_DDL)


# ---------------------------------------------------------------------------
# Span-sequence invariant (the north rule's per-row equality contract)
# ---------------------------------------------------------------------------

def _span_field(c) -> "F.Column":
    """Injective field encoding: NULL → ``N``; a value → ``<len>#<value>``.

    Length-prefixing makes the concatenation prefix-free decodable, so NO
    payload content (``:``, ``|``, control chars, even a literal ``N`` or
    ``7#``) can make two distinct span sequences collide (ADVICE r3: the old
    ``:``-joined form was forgeable and silently dropped NULL offsets)."""
    return F.when(c.isNull(), F.lit("N")).otherwise(
        F.concat(F.length(c).cast("string"), F.lit("#"), c))


def span_signature(spans) -> "F.Column":
    """Canonical per-row signature of an interleaved span sequence: md5 over
    length-prefix-encoded ``kind/text/media_ref/offset`` pieces joined IN
    ARRAY ORDER.

    Two rows (or two engines) produce the same signature iff their span
    sequences are equal element-wise AND in the same order — the north
    rule's per-row invariant (span-sequence equality on kind/text/media_ref/
    order) made into one comparable column. The per-field encoding is
    injective (see :func:`_span_field`): NULL never collides with a real
    value, and separator characters inside payloads cannot forge a span
    boundary. Pure Column expressions; DuckDB reproduces the signature
    bit-for-bit (driver query mm2)."""
    piece = F.transform(
        spans,
        lambda s: F.concat(
            _span_field(s["kind"]),
            _span_field(s["text"]),
            _span_field(s["media_ref"]),
            _span_field(s["offset"].cast("string"))))
    return F.md5(F.concat_ws("|", piece))


def span_sequence_violations(df: DataFrame, spans_col: str = "spans",
                             id_col: str = "doc_id") -> DataFrame:
    """Violation rows for span sequences that break the interleaving
    contract: offsets must be exactly 0..n-1 in array order (the 'order'
    half of the invariant), and each span must carry the payload its kind
    declares (text spans a text, media spans a media_ref).

    One shuffle-free projection + explode of the (tiny) per-row violation
    array — scales like the validation pass."""
    spans = F.col(spans_col)
    bad_order = F.exists(
        F.zip_with(spans,
                   F.sequence(F.lit(0),
                              F.greatest(F.size(spans) - 1, F.lit(0))),
                   lambda s, i: s["offset"] != i),
        lambda x: x)
    bad_shape = F.exists(
        spans,
        lambda s: ((s["kind"] == "text") & s["text"].isNull())
        | ((s["kind"] == "media") & s["media_ref"].isNull()))
    v = F.array_compact(F.array(
        F.when(bad_order & (F.size(spans) > 0), F.struct(
            F.lit("spans").alias("field"),
            F.lit("sequence").alias("error_type"),
            F.lit("offsets 0..n-1 in order").alias("expected"),
            F.lit("out-of-order span offsets").alias("actual"))),
        F.when(bad_shape, F.struct(
            F.lit("spans").alias("field"),
            F.lit("sequence").alias("error_type"),
            F.lit("kind-declared payload present").alias("expected"),
            F.lit("span payload missing for kind").alias("actual"))),
    ))
    return (df.select(id_col, F.explode(v).alias("v"))
            .select(id_col, "v.field", "v.error_type", "v.expected",
                    "v.actual"))
