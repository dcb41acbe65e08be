"""Text-analysis functions and multimodal binary plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cordon_spark.functions import text as TX
from cordon_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog of the farm"),
        (1, "wort wort unbekannt zzz qqq xxx yyy www vvv"),
        (2, ""),
        (3, "a a a a a"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_token_counts(spark, docs):
    got = {r.doc_id: r for r in TX.token_count_cols(docs).collect()}
    assert got[0].n_tokens == 11
    assert got[2].n_tokens == 0
    assert got[3].n_tokens == 5
    assert got[0].n_alnum_tokens == 11
    assert got[0].n_chars == len("the quick brown fox and the lazy dog of the farm")


def test_lang_id(spark, docs):
    got = {r.doc_id: r.pred_lang for r in TX.lang_id_cols(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "other"
    assert got[2] == "other"


def test_quality_score_bounds(spark, docs):
    got = {r.doc_id: r.q for r in docs.select("doc_id", TX.quality_score_col().alias("q")).collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[0] > got[3]  # diverse natural text beats "a a a a a"
    assert got[2] == pytest.approx(0.0)


def test_fingerprint_stable_and_discriminative(spark, docs):
    fp = {r.doc_id: r.f for r in docs.select("doc_id", TX.fingerprint_col(n=5).alias("f")).collect()}
    dup = spark.createDataFrame(
        pd.DataFrame([(9, "the quick brown fox and the lazy dog of the farm")], columns=["doc_id", "text"])
    )
    fp9 = dup.select(TX.fingerprint_col(n=5).alias("f")).first().f
    assert fp9 == fp[0]  # identical text -> identical fingerprint
    assert fp[0] != fp[1]


def test_multimodal_metadata_and_features(spark):
    pdf = pd.DataFrame(
        {
            "media_id": pd.Series([1, 2], dtype="int64"),
            "kind": ["image", "audio"],
            "payload": [b"\x89PNG-fake-bytes", b"RIFF-fake-audio"],
            "mime": ["image/png", "audio/wav"],
        }
    )
    media = spark.createDataFrame(pdf)
    meta = {r.media_id: r for r in MM.binary_metadata(media).collect()}
    assert meta[1].n_bytes == len(b"\x89PNG-fake-bytes")

    feats = {r.media_id: r for r in MM.extract_features(media, MM.fake_decoder).collect()}
    assert len(feats[1].features) == 8
    # deterministic fake decode: same payload -> same features
    again = {r.media_id: r for r in MM.extract_features(media, MM.fake_decoder).collect()}
    assert list(feats[2].features) == list(again[2].features)
    import hashlib

    assert feats[1].content_md5 == hashlib.md5(b"\x89PNG-fake-bytes").hexdigest()


def test_multimodal_decode_stub_raises(spark):
    pdf = pd.DataFrame(
        {
            "media_id": pd.Series([1], dtype="int64"),
            "kind": ["video"],
            "payload": [b"x"],
            "mime": ["video/mp4"],
        }
    )
    media = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        MM.extract_features(media, None).collect()


def test_resize_nearest_exact():
    import numpy as np

    from cordon_spark.operators import multimodal as MM

    img = np.arange(16).reshape(4, 4)
    got = MM.resize_nearest(img, 2, 2)
    assert got.tolist() == [[0, 2], [8, 10]]  # floor(dst*in/out) sampling
    up = MM.resize_nearest(np.array([[1, 2], [3, 4]]), 4, 4)
    assert up.tolist() == [
        [1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4],
    ]
    assert MM.sample_frame_indices(10, 4).tolist() == [0, 2, 5, 7]
    assert MM.sample_frame_indices(3, 10).tolist() == [0, 1, 2]  # capped


def test_resize_media_pipeline(spark):
    import numpy as np
    import pandas as pd

    from cordon_spark.operators import multimodal as MM

    def img_decoder(kind, payload):
        # fake codec: payload bytes ARE the row-major uint8 pixels, 4x4
        return np.frombuffer(payload, dtype=np.uint8).reshape(4, 4)

    pdf = pd.DataFrame(
        {
            "media_id": pd.Series([1, 2], dtype="int64"),
            "kind": ["image", "image"],
            "payload": [bytes(range(16)), bytes(range(16, 32))],
            "mime": ["image/raw", "image/raw"],
            "meta": [{}, {}],
        }
    )
    media = spark.createDataFrame(pdf, MM.MEDIA_SCHEMA)
    out = MM.resize_media(media, 2, 2, decode_fn=img_decoder).orderBy("media_id").collect()
    assert [(r.media_id, r.height, r.width) for r in out] == [(1, 2, 2), (2, 2, 2)]
    assert list(bytes(out[0].payload)) == [0, 2, 8, 10]
    # stub seam: no decoder -> NotImplementedError surfaces from workers
    import pytest
    from py4j.protocol import Py4JJavaError  # noqa: F401

    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        MM.resize_media(media, 2, 2).collect()


def test_sample_frames_fanout(spark):
    import numpy as np
    import pandas as pd

    from cordon_spark.operators import multimodal as MM

    def video_decoder(kind, payload):
        # fake codec: one frame per byte, each frame a 1x1 array
        return [np.array([[b]], dtype=np.uint8) for b in payload]

    pdf = pd.DataFrame(
        {
            "media_id": pd.Series([7], dtype="int64"),
            "kind": ["video"],
            "payload": [bytes(range(10))],
            "mime": ["video/raw"],
            "meta": [{}],
        }
    )
    media = spark.createDataFrame(pdf, MM.MEDIA_SCHEMA)
    out = MM.sample_frames(media, 4, decode_fn=video_decoder).orderBy("frame_idx").collect()
    assert [(r.media_id, r.frame_idx) for r in out] == [(7, 0), (7, 2), (7, 5), (7, 7)]
    assert [bytes(r.payload)[0] for r in out] == [0, 2, 5, 7]


def test_sample_frames_zero_frame_media(spark):
    """Zero-frame (corrupt/empty) media yields no rows instead of
    crashing the task."""
    import numpy as np
    import pandas as pd

    from cordon_spark.operators import multimodal as MM

    assert MM.sample_frame_indices(0, 4).tolist() == []

    def video_decoder(kind, payload):
        return [np.array([[b]], dtype=np.uint8) for b in payload]

    pdf = pd.DataFrame(
        {
            "media_id": pd.Series([1, 2], dtype="int64"),
            "kind": ["video", "video"],
            "payload": [b"", bytes(range(4))],
            "mime": ["video/raw"] * 2,
            "meta": [{}, {}],
        }
    )
    media = spark.createDataFrame(pdf, MM.MEDIA_SCHEMA)
    out = MM.sample_frames(media, 2, decode_fn=video_decoder).collect()
    assert {r.media_id for r in out} == {2}  # empty video contributes nothing


def test_repetition_cols_planted(spark):
    """Gopher-style repetition stats on planted fixtures."""
    from cordon_spark.functions.text import repetition_cols

    docs = spark.createDataFrame(
        [
            (0, "a b\na b\nc d"),            # 1 dup line of 3
            (1, "x y x y x y"),              # "x y" 2-gram dominates
            (2, "one two three four five"),  # no repetition
            (3, "t t t"),                    # all 3-grams/2-grams equal
            (4, ""),                         # empty -> all zeros
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            round(r.dup_line_frac, 4),
            round(r.top_2gram_frac, 4),
            round(r.dup_3gram_frac, 4),
        )
        for r in repetition_cols(docs).collect()
    }
    assert got[0][0] == round(1 / 3, 4)
    # "x y" occurs 3x among 5 2-grams over 6 tokens -> 3*2/6 = 1.0
    assert got[1][1] == 1.0
    # 6 tokens, 4 distinct 3-grams ("x y x","y x y","x y x","y x y")
    assert got[1][2] == 0.5
    assert got[2] == (0.0, round(2 / 5, 4), 0.0)
    assert got[3] == (0.0, 1.0, 0.0)  # "t t" twice over 3 tokens -> 4/3 capped at 1
    assert got[4] == (0.0, 0.0, 0.0)
    assert got[5] == (0.0, 0.0, 0.0)


def test_normalize_text_cols(spark):
    """NFC composition, control strip, whitespace collapse — explicit
    decomposed sequences so the NFC step is actually exercised."""
    import unicodedata

    from cordon_spark.functions.text import normalize_text_cols

    decomposed = "Cafe\u0301"  # e + COMBINING ACUTE (NFD)
    composed = unicodedata.normalize("NFC", decomposed)
    assert decomposed != composed  # sanity: the fixture IS decomposed
    docs = spark.createDataFrame(
        [
            (0, f"  {decomposed}\t\x07 x  y  "),
            (1, "plain"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.norm_text for r in normalize_text_cols(docs).collect()}
    assert got[0] == f"{composed} x y"  # composed, controls gone, collapsed
    assert got[1] == "plain"
    assert got[2] == ""
