"""Multimodal plumbing: schemas, batch shapes, deterministic stub decode."""

from pliers_spark.multimodal import audio_frames, image_stats


def test_image_stats_plumbing(spark):
    rows = [(1, b"\x10" * 64), (2, b"\xff" * 256), (3, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in image_stats(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2].mean_brightness == 1.0  # all-0xff payload → max brightness
    assert out[1].channels == 3
    r1a = image_stats(df).orderBy("id").collect()
    r1b = image_stats(df).orderBy("id").collect()
    assert r1a == r1b  # deterministic stub


def test_audio_frames_framing(spark):
    n = 4096
    df = spark.createDataFrame([(7, bytes(range(256)) * (n // 256))], "id long, payload binary")
    out = audio_frames(df, frame=1024, hop=512, sr=16000).orderBy("frame").collect()
    assert len(out) == (n - 1024) // 512 + 1
    assert out[0].onset == 0.0 and out[1].onset == 512 / 16000
    assert all(abs(r.duration - 1024 / 16000) < 1e-9 for r in out)
    assert all(0.0 <= r.rms <= 1.01 for r in out)


def test_image_resize_plumbing(spark):
    from pliers_spark.multimodal import image_resize_stats

    df = spark.createDataFrame([(1, b"\x40" * 100), (2, b"\xff" * 30)], "id long, payload binary")
    out = {r.id: r for r in image_resize_stats(df, target_w=4, target_h=3).collect()}
    assert all((r.width, r.height, r.channels) == (4, 3, 3) for r in out.values())
    assert out[2].mean_brightness == 1.0


def test_video_frame_sample_every_nth(spark):
    from pliers_spark.multimodal import video_frame_sample

    payload = bytes(range(256)) * 2  # 512 bytes → 8 frames of 64
    df = spark.createDataFrame([(9, payload)], "id long, payload binary")
    out = video_frame_sample(df, every=2, fps=30.0).orderBy("frame").collect()
    assert [r.frame for r in out] == [0, 2, 4, 6]
    assert abs(out[1].onset - 2 / 30.0) < 1e-9
    assert all(r.width > 0 and r.height > 0 for r in out)
