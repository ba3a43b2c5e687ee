"""Multimodal columns: opaque binary payloads + typed metadata.

Media (image/audio/video) ride as `binary` columns with a struct of
metadata; decode / feature-extract run as Arrow-batched `mapInPandas`
stages. The container lacks the media libraries, so the actual decode
is STUBBED with a clearly-marked deterministic fake (md5-derived
dimensions) — the Spark-side plumbing (schema, batching, partitioning,
UDF signature) is real and tested, and swapping the stub for
PIL/torchaudio is a one-function change.

Scale notes: mapInPandas streams Arrow batches; memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch`, decode parallelism by
input partitions — repartition before decode so batches are even.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, width int, height int"
)

# flip to use a real decoder when the media libs exist
REAL_DECODE_AVAILABLE = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    REAL_DECODE_AVAILABLE = True
except Exception:
    pass


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Testdata has no media files; synthesize a binary payload column
    from the text bytes (deterministic, engine-portable)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake 'image header parse': md5-derived dims.

    STUB: a real implementation would be PIL.Image.open(BytesIO(b));
    raise NotImplementedError there if called with REAL_DECODE_AVAILABLE
    unset and fakes disallowed.
    """
    h = hashlib.md5(payload).hexdigest()
    width = int(h[:4], 16) % 1920 + 1
    height = int(h[4:8], 16) % 1080 + 1
    fmt = ["png", "jpeg", "webp"][int(h[8], 16) % 3]
    return fmt, width, height


def decode_metadata(binaries: DataFrame) -> DataFrame:
    """mapInPandas decode stage: (doc_id, payload) → typed metadata.

    Real Arrow plumbing; fake decode (see _fake_decode). With media
    libs installed this same operator returns true format/dims.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_fake_decode(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                }
            )

    return binaries.mapInPandas(batches, schema=DECODE_SCHEMA)


def resize_stub(binaries: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize operator shape: payload→payload with target dims.

    STUB: passes payload through untouched and records the target
    box; a real version decodes, resizes, re-encodes per batch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["target_side"] = max_side
            yield out

    return binaries.mapInPandas(
        batches, schema="doc_id bigint, payload binary, target_side int"
    )


def frame_sample_stub(binaries: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling shape: payload → (doc_id, frame_no, frame).

    STUB: emits md5-sliced pseudo-frames so downstream plumbing
    (explode-like fan-out from mapInPandas) is exercised; a real
    version seeks the container every_n frames.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, nos = [], [], []
            for _, row in pdf.iterrows():
                n_frames = max(1, len(row["payload"]) // 512)
                for i in range(0, n_frames, every_n):
                    ids.append(row["doc_id"])
                    nos.append(i)
                    frames.append(hashlib.md5(row["payload"] + str(i).encode()).digest())
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return binaries.mapInPandas(
        batches, schema="doc_id bigint, frame_no int, frame binary"
    )


def audio_chunk_stub(
    binaries: DataFrame, chunk_samples: int = 48000
) -> DataFrame:
    """Audio chunking shape: payload → (doc_id, chunk_no, n_samples,
    rms) — fixed-length windows over the sample stream, the fan-out a
    speech pipeline runs before per-chunk transcribe/embed.

    STUB: samples = payload halved as 16-bit PCM; rms is md5-derived.
    A real version is soundfile/torchaudio decode + true windowed rms;
    the mapInPandas fan-out, schema, and chunk arithmetic are real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, lens, rms = [], [], [], []
            for _, row in pdf.iterrows():
                n_samples = max(1, len(row["payload"]) // 2)
                for c, start in enumerate(range(0, n_samples, chunk_samples)):
                    ids.append(row["doc_id"])
                    nos.append(c)
                    lens.append(min(chunk_samples, n_samples - start))
                    h = hashlib.md5(row["payload"] + str(c).encode()).hexdigest()
                    rms.append((int(h[:8], 16) % 10**6) / 10**6)
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_no": nos, "n_samples": lens, "rms": rms}
            )

    return binaries.mapInPandas(
        batches, schema="doc_id bigint, chunk_no int, n_samples int, rms double"
    )


def embed_stub(binaries: DataFrame, dim: int = 16) -> DataFrame:
    """Media → embedding extraction shape: payload → unit-norm
    array<float> — the bridge from the multimodal family into the
    similarity/ANN family (the output plugs directly into
    similarity.brute_force_topk / ivf_topk).

    STUB: md5-seeded deterministic pseudo-embedding; a real version
    runs a vision/audio encoder per Arrow batch (exactly where
    GPU-batched inference slots in).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for b in pdf["payload"]:
                h = hashlib.md5(b).digest()
                raw = [
                    int.from_bytes(h[2 * i: 2 * i + 2], "big") / 65535.0 - 0.5
                    for i in range(min(dim, 8))
                ]
                while len(raw) < dim:
                    h = hashlib.md5(h).digest()
                    raw.extend(
                        int.from_bytes(h[2 * i: 2 * i + 2], "big") / 65535.0 - 0.5
                        for i in range(min(dim - len(raw), 8))
                    )
                norm = sum(x * x for x in raw) ** 0.5 or 1.0
                vecs.append([float(x / norm) for x in raw])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return binaries.mapInPandas(
        batches, schema="doc_id bigint, embedding array<float>"
    )
