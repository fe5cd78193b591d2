

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


def test_audio_features_distributed(spark):
    """Audio PCM payloads decode + feature-extract distributed; the spectral
    centroid tracks each clip's fundamental (clips are tones at 110*(1+i%24)
    Hz), and codec roundtrip is exact for both pcm and pcmz."""
    import numpy as np

    from spatialindex_spark.operators.multimodal import audio_features
    from spatialindex_spark.sources import imaging
    from spatialindex_spark.sources.images import synth_audios

    aud = synth_audios(spark, 10)
    out = audio_features(aud).toPandas().set_index("audio_id")
    assert len(out) == 10
    # centroid rises with the clip's fundamental (noise floor adds a
    # constant offset, so compare relatively)
    c = [out.loc[f"aud{i:012d}"].spectral_centroid_hz for i in (0, 4, 9)]
    assert c[0] < c[1] < c[2], c
    assert (out.rms > 5000).all() and (out.zcr > 0).all()
    pcm = imaging.synth_audio(5)
    assert np.array_equal(
        imaging.decode_audio(imaging.encode_audio(pcm, "pcmz"), "pcmz"), pcm)
