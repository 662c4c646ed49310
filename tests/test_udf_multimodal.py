"""Internal tests for non-declared UDF/UDAF (X4) and multimodal helpers."""

from __future__ import annotations

import pytest

from paraslice_spark.functions.udfs import weighted_mean_by_group
from paraslice_spark.operators.multimodal import (
    decode_image_stub,
    frame_sample,
    resize_media,
    with_media_column,
)
from paraslice_spark.sources.io import load_tables
from tests.conftest import SF_SMALL


def test_x4_weighted_mean_udaf(spark):
    ev = load_tables(spark, SF_SMALL)["events"]
    rows = {r["event_type"]: r["wmean"] for r in weighted_mean_by_group(ev).collect()}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    # weighted mean by |value| of positive values is >= plain mean
    plain = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type").agg({"value": "avg"}).withColumnRenamed(
            "avg(value)", "m"
        ).collect()
    }
    assert all(rows[k] >= plain[k] for k in rows)


def test_multimodal_resize_halves_dimensions(spark):
    d = load_tables(spark, SF_SMALL)["documents"]
    media = with_media_column(d)
    orig = {r["media_id"]: (r["meta"]["width"], r["meta"]["height"]) for r in media.collect()}
    resized = {r["media_id"]: (r["width"], r["height"]) for r in resize_media(media, 0.5).collect()}
    assert all(
        resized[k] == (max(1, orig[k][0] // 2), max(1, orig[k][1] // 2)) for k in orig
    )


def test_multimodal_frame_sample_every_4(spark):
    d = load_tables(spark, SF_SMALL)["documents"]
    media = with_media_column(d)
    frames = frame_sample(media, every=4)
    pdf = frames.toPandas()
    assert (pdf["frame_idx"] % 4 == 0).all()
    assert pdf["media_id"].nunique() > 400  # most docs yield frames


def test_decode_stub_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG\r\n\x1a\n....")


def test_polymorphic_udtf_schema_follows_literal_width(spark):
    """X5b: the real @udtf with analyze() — output schema is computed at
    plan time from the literal width; values line up with split()."""
    from pyspark.sql.functions import lit

    from paraslice_spark.functions.udfs import make_split_fixed_udtf

    split_fixed = make_split_fixed_udtf()
    out3 = split_fixed(lit("a b c d"), lit(3))
    assert out3.columns == ["w0", "w1", "w2", "n_words"]
    assert out3.collect()[0].asDict() == {"w0": "a", "w1": "b", "w2": "c", "n_words": 4}
    out5 = split_fixed(lit("a b"), lit(5))
    assert out5.columns == ["w0", "w1", "w2", "w3", "w4", "n_words"]
    r = out5.collect()[0]
    assert (r["w0"], r["w1"], r["w2"], r["w3"], r["w4"], r["n_words"]) == (
        "a", "b", None, None, None, 2,
    )


def test_polymorphic_udtf_lateral_sql(spark):
    """Registered UDTF composes with LATERAL over a real table."""
    from paraslice_spark.functions.udfs import make_split_fixed_udtf
    from paraslice_spark.sources.io import sql_views

    sql_views(spark, SF_SMALL)  # re-POINTS the documents view (sf-swap safe)
    spark.udtf.register("split_fixed", make_split_fixed_udtf())
    rows = spark.sql(
        """SELECT d.doc_id, s.w0, s.w1, s.n_words
           FROM documents d, LATERAL split_fixed(d.text, 2) s
           ORDER BY d.doc_id LIMIT 3"""
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["w0"] is not None and r["n_words"] >= 2
