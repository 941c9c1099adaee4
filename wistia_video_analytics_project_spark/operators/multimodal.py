"""Multimodal column operators: opaque binary payloads + typed metadata.

BASELINE.json extension tier. Images/audio/video travel through Spark as
``binary`` columns beside typed metadata (schemas.MEDIA_ASSETS) — never
as driver-side objects. Decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators, so the Spark-side
plumbing (schema, partitioning, batch shape) is real and tested even
though the actual codecs are stubbed in this container (no image/audio
libraries available — see :data:`HAVE_CODECS`).

The deterministic fake decoder lets every pipeline stage be exercised
end-to-end: payload bytes -> stable pseudo-pixels -> features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real codecs are optional; this container has none
    import PIL.Image  # noqa: F401

    HAVE_CODECS = True
except ImportError:
    HAVE_CODECS = False

#: output schema of :func:`extract_features`
FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, content_sha256 string, "
    "feature array<double>"
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a codec+model: sha256 bytes -> [0,1)
    floats. Replace with a real decode when codecs are present."""
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def real_decode(payload: bytes, media_type: str):  # pragma: no cover
    """Real decode path — requires image/audio libraries not shipped in
    this container."""
    raise NotImplementedError(
        "no codec libraries in this environment; extract_features uses the "
        "deterministic fake decoder (HAVE_CODECS=False)"
    )


def extract_features(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Binary payload -> feature vector, Arrow batch at a time.

    The per-batch body is where a real pipeline calls cv2/PIL/ffmpeg;
    everything around it (Arrow transfer, schema contract, executor-side
    parallelism) is the production shape. At 100 TB: payloads stay
    distributed, the only driver traffic is the plan.
    """
    import pandas as pd

    decode = real_decode if HAVE_CODECS else (lambda p, _t: _fake_decode(p))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(bytes(p), t) if p is not None else None
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "content_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame offset, metadata-driven (no decode needed to *plan*
    the sampling — duration_ms comes from the asset row).

    Pure built-ins: ``sequence`` + ``explode`` generate the frame grid
    JVM-side; the downstream decode of each frame is the Pandas-UDF stage
    above.
    """
    return (
        assets.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("asset_id", "frame_ms", "payload")
    )


RESIZE_SCHEMA = (
    "asset_id long, media_type string, payload binary, width int, height int"
)


def resize_images(
    assets: DataFrame, max_width: int = 256, batch_hint: int | None = None
) -> DataFrame:
    """Resize plumbing: image payloads wider than ``max_width`` are
    scaled to it (aspect preserved). The geometry math and Arrow batch
    contract are real; the pixel transform is the deterministic stub
    (payload re-hashed with the new size) until codecs exist —
    ``real_decode`` is the splice point.
    """
    import hashlib as _hashlib

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "media_type": [], "payload": [],
                   "width": [], "height": []}
            for row in pdf.itertuples(index=False):
                w, h, payload = row.width, row.height, row.payload
                if (row.media_type == "image" and payload is not None
                        and w and w > max_width):
                    scale = max_width / w
                    new_w, new_h = max_width, max(int(h * scale), 1) if h else None
                    # stub transform: deterministic payload derived from
                    # (content, target size) — replace with a real resample
                    payload = _hashlib.sha256(
                        bytes(payload) + f":{new_w}x{new_h}".encode()
                    ).digest()
                    w, h = new_w, new_h
                for k, v in (("asset_id", row.asset_id),
                             ("media_type", row.media_type),
                             ("payload", payload), ("width", w), ("height", h)):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return assets.select(
        "asset_id", "media_type", "payload", "width", "height"
    ).mapInPandas(run, schema=RESIZE_SCHEMA)


def dedup_by_content(assets: DataFrame) -> DataFrame:
    """Exact binary dedup: sha2 over the payload, keep min asset_id.
    Same one-shuffle shape as text exact-dedup."""
    from pyspark.sql import Window

    hashed = assets.withColumn("content_sha256", F.sha2(F.col("payload"), 256))
    w = Window.partitionBy("content_sha256")
    return hashed.withColumn(
        "is_canonical", F.col("asset_id") == F.min("asset_id").over(w)
    )
