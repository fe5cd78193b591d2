

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


def test_caption_conflicts(spark):
    """Near-identical images (phash within 2 bits) with DIFFERENT captions
    are flagged; the same twin with an identical caption is not."""
    from spatialindex_spark.operators.multimodal import caption_conflicts

    base = 0x5A5A_1234_ABCD_0F0F
    rows = [
        (1, base, "a cat"),
        (2, base ^ 0b11, "a dog"),        # conflict with 1 (2 bits)
        (3, base ^ 0b101, "a cat"),       # near-dup of 1, SAME caption
        (4, base ^ (0xFF << 32), "a cat"),  # far image (8 bits) -> no pair
        (5, base ^ 1, None),  # null caption differs from any text
    ]
    df = spark.createDataFrame(
        rows, "image_id long, phash long, caption string")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in caption_conflicts(df, max_hamming=3).collect()}
    assert (1, 2) in got and got[(1, 2)] == 2
    assert (1, 3) not in got            # identical caption: benign dup
    assert (2, 3) in got                # dog vs cat within 3 bits
    assert all(4 not in k for k in got)
    assert (1, 5) in got                # null caption != 'a cat'
