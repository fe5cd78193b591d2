

def test_frame_sample_real_demux(spark):
    """frame_sample demuxes SVC1 containers distributed: every 6th frame of
    each clip becomes a row whose payload decodes exactly (lossless fmt) or
    within the PSNR bar (dct)."""
    import numpy as np

    from spatialindex_spark.operators.multimodal import frame_sample
    from spatialindex_spark.sources import imaging
    from spatialindex_spark.sources.images import synth_videos

    vids = synth_videos(spark, 12, nframes=24)
    out = frame_sample(vids, every_n=6).toPandas()
    assert len(out) == 12 * 4  # frames 0, 6, 12, 18
    assert sorted(out.frame_idx.unique()) == [0, 6, 12, 18]
    row = out[(out.video_id == "vid000000000004") & (out.frame_idx == 12)].iloc[0]
    got = imaging.decode(bytes(row["bytes"]), row.w, row.h, row.fmt)
    want = imaging.synth_video(4, 32, 24, 24)[12]
    assert np.array_equal(got, want)  # id 4 -> lossless 'z'
    row = out[(out.video_id == "vid000000000006") & (out.frame_idx == 6)].iloc[0]
    got = imaging.decode(bytes(row["bytes"]), row.w, row.h, row.fmt)
    want = imaging.synth_video(6, 32, 24, 24)[6]
    assert imaging.psnr(got, want) >= 40.0  # id 6 -> dct (lossy)
