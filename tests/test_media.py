"""Multimodal media plumbing: typed media relation, stubbed decode stage
(deterministic fake), NotImplementedError gate for real decoders."""

import pytest
from pyspark.sql import functions as F

from pdf2ocr_spark.operators.media import (
    FEATURE_DIM,
    decode_media,
    media_table,
)
from pdf2ocr_spark.pipeline import load_docs_corpus


@pytest.fixture(scope="module")
def media_df(spark, sf_dir):
    docs = load_docs_corpus(spark, sf_dir).where(F.col("doc_id").cast("long") < 120)
    return media_table(docs).cache()


def test_media_table_shape(media_df, spark, sf_dir):
    pdf = media_df.toPandas()
    assert len(pdf) > 0
    assert set(pdf["media_type"].unique()) <= {"image", "audio", "video"}
    assert all(isinstance(p, (bytes, bytearray)) for p in pdf["payload"])
    # metadata typing: audio has no dimensions, image has no duration
    for _, r in pdf.iterrows():
        m = r["meta"]
        assert m["n_bytes"] == len(r["payload"])
        if r["media_type"] == "audio":
            assert m["width"] is None and m["height"] is None
        if r["media_type"] == "image":
            assert m["duration_ms"] is None


def test_media_table_deterministic(media_df, spark, sf_dir):
    docs = load_docs_corpus(spark, sf_dir).where(F.col("doc_id").cast("long") < 120)
    again = media_table(docs).toPandas().sort_values("media_ref").reset_index(drop=True)
    first = media_df.toPandas().sort_values("media_ref").reset_index(drop=True)
    assert (first["payload"] == again["payload"]).all()


def test_decode_stub_raises_without_decoder(media_df):
    with pytest.raises(Exception) as exc_info:
        decode_media(media_df, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_fake_features(media_df):
    feats = decode_media(media_df, fake=True).toPandas()
    assert len(feats) == media_df.count()
    assert all(len(f) == FEATURE_DIM for f in feats["feature"])
    assert all(0.0 <= v <= 1.0 for f in feats["feature"] for v in f)
    # thumbnails only for visual media, capped at 32
    visual = feats[feats["media_type"] != "audio"]
    assert (visual["thumb_w"] <= 32).all()
    audio = feats[feats["media_type"] == "audio"]
    assert audio["thumb_w"].isna().all()


def test_frame_sampling_contract(spark, sf_dir):
    """sample_frames: video rows fan out 1->N_FRAMES at evenly spaced
    timestamps; non-video rows are filtered before the kernel; the
    default (non-fake) path raises naming the missing decoder. Full
    DuckDB value parity runs in test_oracle_parity (media_frames)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pdf2ocr_spark.operators.media import (
        N_FRAMES,
        media_table,
        sample_frames,
    )
    from pdf2ocr_spark.pipeline import load_docs_corpus

    media = media_table(load_docs_corpus(spark, sf_dir)).cache()
    n_videos = media.where("media_type = 'video'").count()
    frames = sample_frames(media, fake=True).toPandas()
    assert len(frames) == n_videos * N_FRAMES
    per = frames.groupby("media_ref")
    assert (per["frame_idx"].count() == N_FRAMES).all()
    # timestamps strictly increasing within a video, inside its duration
    assert (per["frame_ts_ms"].apply(lambda s: s.is_monotonic_increasing)).all()
    # deterministic: same input -> same hashes
    again = sample_frames(media, fake=True).toPandas()
    assert sorted(frames["frame_hash"]) == sorted(again["frame_hash"])
    # stub is honest: real path names its missing dependency
    with _pytest.raises(Exception, match="ffmpeg"):
        sample_frames(media).collect()
    media.unpersist()
