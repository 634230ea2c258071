"""Multimodal column plumbing: opaque binary + typed metadata (SURVEY §7.7).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning — is real and tested; the actual codec step
is STUBBED (this container ships no image/audio libraries):

- ``decoder="fake"``: deterministic synthetic decode (dimensions and
  pixel stats derived from the payload bytes) so the full pipeline is
  exercisable end-to-end in tests.
- ``decoder="pil"`` (or any real codec): raises ``NotImplementedError``
  at call time with a clear message — swap in ``PIL.Image.open`` in
  the marked block on a cluster that has it.

Scale notes: ``mapInPandas`` streams Arrow record batches — payload
bytes never materialize as one big list; set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down (e.g. 256) when
payloads are MB-scale so a batch stays within executor memory. Decode
is CPU-bound and embarrassingly parallel: repartition to ~2-4× cores
before the map, never ``collect``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "DECODED_IMAGE_SCHEMA",
    "extract_binary_metadata",
    "decode_images",
    "sample_frames",
]

#: Output schema of the decode stage (input columns pass through by id).
DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def extract_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Codec-free metadata over the opaque payload: byte length + sha256.
    Pure Column expressions — no Python in the loop."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_sha256", F.sha2(F.col(payload_col), 256)
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in decode: dimensions/stats from the bytes."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    mean_pixel = round(sum(digest[:16]) / 16 / 255.0, 6)
    return width, height, channels, mean_pixel


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched image decode via ``mapInPandas``.

    Returns one row per input with ``DECODED_IMAGE_SCHEMA``. The
    ``fake`` decoder keeps the plumbing fully testable; real codecs
    plug into the marked block.
    """

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "width": [],
                "height": [],
                "n_channels": [],
                "mean_pixel": [],
                "decode_ok": [],
            }
            for payload in pdf[payload_col]:
                if decoder == "fake":
                    w, h, c, m = _fake_decode(bytes(payload))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_channels"].append(c)
                    out["mean_pixel"].append(m)
                    out["decode_ok"].append(True)
                else:
                    # Real codec goes here, e.g.:
                    #   img = PIL.Image.open(io.BytesIO(payload))
                    raise NotImplementedError(
                        f"decoder {decoder!r} requires image libraries not "
                        "present in this container; use decoder='fake' or "
                        "install a codec and extend this block"
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        _decode_batches, schema=DECODED_IMAGE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    frame_col: str = "frame_idx",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling for video-like payloads: keep every n-th frame.
    Pure relational (no codec): a modulo filter that Catalyst pushes
    into the scan when ``frame_col`` is a stored column."""
    return df.filter((F.col(frame_col) % every_nth) == 0)
