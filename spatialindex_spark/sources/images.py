"""Distributed synthesis of the north-rule image+caption table.

Schema (BASELINE.json input_hint):
  image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
  caption:string, phash:int64
plus sky position ra/dec and the engine-derived x,y,z + cell-ID columns.

Synthesis is deterministic (seed 42 + row index) and *distributed*: a
``spark.range(n)`` seed frame fans out through ``mapInPandas`` so a
10^12-row build is just more partitions — no driver-side generation.
Sky positions are a uniform-sphere mixture with dense 0.1-degree clusters
(>=1% of rows) so one L7 cell holds far more than average — the skew
fixture required to exercise salting (FIXTURES.md §1, SURVEY.md J6).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import imaging

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, ra double, dec double"
)

# dense-cluster fixture: 2% of rows inside 0.1-deg discs at these centers
HOT_SPOTS = [(129.4, 43.7), (34.0, 45.0)]
HOT_FRACTION = 0.02
FMTS = ("raw", "z", "dct")
SIZES = (16, 32, 64)


def _synth_batch(idx: np.ndarray) -> pd.DataFrame:
    n = len(idx)
    rng = np.random.default_rng(42)  # position stream must be reproducible per idx
    # per-row deterministic draws keyed by index (counter-based, order-free)
    u1 = np.array([np.random.default_rng((42, int(i))).uniform() for i in idx])
    u2 = np.array([np.random.default_rng((43, int(i))).uniform() for i in idx])
    u3 = np.array([np.random.default_rng((44, int(i))).uniform() for i in idx])

    hot = u3 < HOT_FRACTION
    ra = u1 * 360.0
    dec = np.degrees(np.arcsin(2.0 * u2 - 1.0))
    for k, (hra, hdec) in enumerate(HOT_SPOTS):
        sel = hot & ((idx % len(HOT_SPOTS)) == k)
        r = 0.05 * np.sqrt(u1[sel])
        th = 2 * math.pi * u2[sel]
        ra[sel] = (hra + r * np.cos(th)) % 360.0
        dec[sel] = np.clip(hdec + r * np.sin(th), -90.0, 90.0)

    sizes = np.array(SIZES)[idx % 3]
    fmts = np.array(FMTS)[(idx // 3) % 3]

    byts, phashes, caps, ids = [], [], [], []
    for i, w, fmt, a, d in zip(idx, sizes, fmts, ra, dec):
        img = imaging.synth_image(int(i), int(w), int(w))
        byts.append(imaging.encode(img, str(fmt)))
        phashes.append(imaging.phash64(imaging.decode(byts[-1], int(w), int(w), str(fmt))))
        caps.append(f"object {int(i)} at ra={a:.6f} dec={d:.6f}")
        ids.append(f"img{int(i):012d}")
    return pd.DataFrame(
        {
            "image_id": ids,
            "bytes": byts,
            "w": sizes.astype(np.int32),
            "h": sizes.astype(np.int32),
            "fmt": fmts,
            "caption": caps,
            "phash": np.array(phashes, dtype=np.int64),
            "ra": ra,
            "dec": dec,
        }
    )


def synth_images(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic n-row image+caption DataFrame, synthesized on executors."""
    if partitions is None:
        partitions = max(4, n // 25_000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _synth_batch(b["id"].values)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, SCHEMA)


def synth_images_indexed(spark: SparkSession, n: int, level: int = 7,
                         partitions: int | None = None,
                         systems: tuple = ("htm", "hpx", "s2", "h3")) -> DataFrame:
    """Full ingest: synth + x,y,z + cell columns + spt_ind clustering key."""
    from ..functions.udfs import with_spatial_columns

    return with_spatial_columns(synth_images(spark, n, partitions),
                                level=level, systems=systems)


VIDEO_SCHEMA = "video_id string, bytes binary, nframes int, w int, h int, fmt string"


def synth_videos(spark: SparkSession, n: int, nframes: int = 24,
                 w: int = 32, h: int = 24,
                 partitions: int | None = None) -> DataFrame:
    """Deterministic n-row video table (SVC1 containers, executor-side)."""
    from . import imaging

    if partitions is None:
        partitions = max(4, n // 2_000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].values
            rows = {"video_id": [f"vid{int(i):012d}" for i in ids],
                    "bytes": [], "nframes": [], "w": [], "h": [], "fmt": []}
            for i in ids:
                fmt = "z" if int(i) % 3 else "dct"
                frames = imaging.synth_video(int(i), w, h, nframes)
                rows["bytes"].append(imaging.encode_video(frames, fmt))
                rows["nframes"].append(nframes)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append(fmt)
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, VIDEO_SCHEMA)


AUDIO_SCHEMA = "audio_id string, bytes binary, n_samples int, rate int, fmt string"


def synth_audios(spark: SparkSession, n: int, n_samples: int = 8000,
                 rate: int = 8000, partitions: int | None = None) -> DataFrame:
    """Deterministic n-row audio table (int16 PCM payloads)."""
    from . import imaging

    if partitions is None:
        partitions = max(4, n // 5_000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].values
            rows = {"audio_id": [f"aud{int(i):012d}" for i in ids],
                    "bytes": [], "n_samples": [], "rate": [], "fmt": []}
            for i in ids:
                fmt = "pcmz" if int(i) % 2 else "pcm"
                pcm = imaging.synth_audio(int(i), n_samples, rate)
                rows["bytes"].append(imaging.encode_audio(pcm, fmt))
                rows["n_samples"].append(n_samples)
                rows["rate"].append(rate)
                rows["fmt"].append(fmt)
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, AUDIO_SCHEMA)
