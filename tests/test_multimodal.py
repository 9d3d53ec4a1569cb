"""Multimodal stage ladder: decode-metadata, resize, feature-extract,
frame-sample. Codec work is stubbed (no image/audio libs in this
container) but the stubs are deterministic, so every stage has an
independent pure-Python expectation here and a DuckDB oracle in
__spark_entry__."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = F.col("doc_id")
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(d < 50)
        .select(
            F.concat(F.lit("media://d"), d.cast("string")).alias("url"),
            F.encode(F.col("text"), "UTF-8").alias("content"),
            F.when(d % 3 == 0, "image")
            .when(d % 3 == 1, "audio")
            .otherwise("video")
            .alias("kind"),
        )
    )
    df.cache().count()
    yield df
    df.unpersist()


def test_resize_media_matches_python(media):
    from ieps_crawler_spark.operators.multimodal import resize_media

    src = {r["url"]: bytes(r["content"]) for r in media.collect()}
    got = {r["url"]: r for r in resize_media(media, 16, 16).collect()}
    assert set(got) == set(src)
    for url, payload in src.items():
        d = hashlib.sha256(payload + b"16x16").digest()
        want = (d * 9)[:256]
        r = got[url]
        assert (r["width"], r["height"]) == (16, 16)
        assert bytes(r["content"]) == want


def test_resize_media_real_resizer_is_explicit_stub(media):
    from ieps_crawler_spark.operators.multimodal import real_resizer, resize_media

    with pytest.raises(Exception) as ei:
        resize_media(media, 8, 8, resizer=real_resizer).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_embed_media_unit_norm_and_deterministic(media):
    from ieps_crawler_spark.operators.multimodal import embed_media

    src = {r["url"]: bytes(r["content"]) for r in media.collect()}
    got = {r["url"]: np.array(r["embedding"], dtype=np.float64)
           for r in embed_media(media, dim=32).collect()}
    assert set(got) == set(src)
    for url, payload in src.items():
        v = got[url]
        assert len(v) == 32
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        d = hashlib.sha256(payload).digest()
        raw = np.frombuffer(d, dtype=np.uint8).astype(np.float64) / 255.0 * 2 - 1
        want = (raw / np.sqrt((raw * raw).sum())).astype(np.float32)
        assert np.array_equal(v.astype(np.float32), want)


def test_embed_media_feeds_similarity(media):
    """The embedding column composes with the ANN operators unchanged."""
    from ieps_crawler_spark.operators.multimodal import embed_media
    from ieps_crawler_spark.operators.similarity import brute_force_topk

    emb = embed_media(media, dim=32).select(
        F.col("url").alias("vec_id"), "embedding"
    )
    q = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    top = brute_force_topk(emb, q, k=3).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        # rank 1 is the query itself at cosine ~1
        assert rows[0]["vec_id"] == qid
        assert rows[0]["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_media_meta_and_frame_plan_compose(media):
    from ieps_crawler_spark.operators.multimodal import (
        extract_media_meta,
        frame_sample_plan,
    )

    meta = extract_media_meta(media)
    plan = frame_sample_plan(meta, every_n=24, max_frames=8)
    rows = plan.collect()
    n_videos = meta.filter(F.col("kind") == "video").count()
    assert len(rows) > 0
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r["frame_index"])
    assert len(by_url) == n_videos
    for idxs in by_url.values():
        assert len(idxs) <= 8
        assert all(i % 24 == 0 for i in idxs)
