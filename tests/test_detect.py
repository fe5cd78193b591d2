"""Source detection + astrometry: exact recovery of planted spikes,
pixel->sky inverse consistency with the forward TAN math, and the
no-shuffle plan shape."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spatialindex_spark.operators.cutouts import tan_pix_np
from spatialindex_spark.operators.detect import detect_sources
from spatialindex_spark.sources import imaging

SCALE = 0.01


def _payload(spark, n_img=40, seed=3):
    rng = np.random.default_rng(seed)
    meta = pd.DataFrame({
        "image_id": np.arange(n_img, dtype=np.int64),
        "ra": rng.uniform(0, 360, n_img),
        "dec": np.degrees(np.arcsin(rng.uniform(-0.99, 0.99, n_img))),
        "w": rng.choice([16, 32, 64], n_img).astype(np.int32),
        "h": rng.choice([16, 32, 64], n_img).astype(np.int32),
    })
    rows = []
    for r in meta.itertuples(index=False):
        fmt = ("raw", "z")[int(r.image_id) % 2]      # lossless only
        img = imaging.synth_image_sources(int(r.image_id), int(r.w),
                                          int(r.h))
        rows.append((int(r.image_id), float(r.ra), float(r.dec),
                     int(r.w), int(r.h), fmt, imaging.encode(img, fmt)))
    df = spark.createDataFrame(
        rows, "image_id long, ra double, dec double, w int, h int, "
              "fmt string, bytes binary")
    return df, meta


def test_detect_recovers_planted_sources(spark):
    df, meta = _payload(spark)
    got = detect_sources(df, SCALE).toPandas()

    # exact planted set per image
    planted = set()
    for r in meta.itertuples(index=False):
        i, w, h = int(r.image_id), int(r.w), int(r.h)
        for s in range(3):
            planted.add((i, (i * 7919 + s * 2741 + 5) % w,
                         (i * 6133 + s * 3571 + 11) % h))
    assert {(int(r.image_id), int(r.src_x), int(r.src_y))
            for r in got.itertuples(index=False)} == planted
    assert len(got) == 3 * len(meta)

    # astrometry: forward-projecting each detection's sky position into
    # its own image must land back on the pixel center
    m = meta.set_index("image_id")
    for r in got.itertuples(index=False):
        mr = m.loc[int(r.image_id)]
        px, py, ok = tan_pix_np(float(r.src_ra), float(r.src_dec),
                                float(mr.ra), float(mr.dec),
                                int(mr.w), int(mr.h), SCALE)
        assert bool(ok)
        assert abs(float(px) - (r.src_x + 0.5)) < 1e-4
        assert abs(float(py) - (r.src_y + 0.5)) < 1e-4


def test_detect_plan_no_shuffle(spark):
    df, _ = _payload(spark, n_img=8)
    plan = detect_sources(df, SCALE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_stream_detect_matches_batch(spark, tmp_path):
    """Detection-on-ingest across two micro-batches equals the batch
    operator on the same rows (stateless map — no watermark/state)."""
    from spatialindex_spark.streaming.ingest import stream_detect

    df, meta = _payload(spark, n_img=30, seed=9)
    pdf = df.toPandas()
    src = str(tmp_path / "det_stream")
    schema = ("image_id long, ra double, dec double, w int, h int, "
              "fmt string, bytes binary")
    half = len(pdf) // 2
    for part in (pdf.iloc[:half], pdf.iloc[half:]):
        spark.createDataFrame(part, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_detect(stream, SCALE)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("det_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in
           spark.sql("SELECT * FROM det_stream").collect()}
    want = {tuple(r) for r in detect_sources(df, SCALE).collect()}
    assert got == want and len(got) == 90
