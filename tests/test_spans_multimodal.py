"""Span operators: fingerprints, sequence invariant, Arrow normalize;
multimodal plumbing with stubbed decode."""

from __future__ import annotations

import pyspark.sql.functions as F

from automatic_data_validator_spark import spans as SP
from automatic_data_validator_spark import multimodal as MM
from automatic_data_validator_spark.synth import make_media_catalog


def test_span_fingerprint_order_sensitive(spark):
    a = [("d1", [{"kind": "text", "text": "a", "media_ref": None, "offset": 0},
                 {"kind": "text", "text": "b", "media_ref": None, "offset": 1}])]
    b = [("d1", [{"kind": "text", "text": "b", "media_ref": None, "offset": 0},
                 {"kind": "text", "text": "a", "media_ref": None, "offset": 1}])]
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    fa = spark.createDataFrame(a, schema).select(SP.span_fingerprint().alias("f")).collect()[0]["f"]
    fb = spark.createDataFrame(b, schema).select(SP.span_fingerprint().alias("f")).collect()[0]["f"]
    assert fa != fb


def test_span_sequence_equality_invariant(spark, docs):
    """input_hint per-row invariant: a text-only normalization must
    preserve (kind, media_ref, order) and non-normalized text."""
    normalized = SP.normalize_spans_arrow(docs)
    # doc_id is not unique (synth injects dups), so compare multisets of
    # (doc_id, span_sequence_key) — synth text is already
    # whitespace-normalized, so keys must be preserved exactly
    a = docs.select("doc_id", SP.span_sequence_key().alias("k"))
    b = normalized.select("doc_id", SP.span_sequence_key().alias("k"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_normalize_spans_handles_empty_and_null(spark):
    """A doc whose spans array is empty or null must come back unchanged
    and must NOT corrupt alignment of the surrounding rows."""
    rows = [
        ("d-ws", [{"kind": "text", "text": "  a   b\tc ", "media_ref": None, "offset": 0}]),
        ("d-empty", []),
        ("d-null", None),
        ("d-media", [{"kind": "image", "text": None, "media_ref": "m-1", "offset": 0}]),
        ("d-nulloff", [{"kind": "text", "text": "x", "media_ref": None, "offset": None}]),
    ]
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    df = spark.createDataFrame(rows, schema)
    got = {r["doc_id"]: r["spans"] for r in SP.normalize_spans_arrow(df).collect()}
    assert got["d-ws"][0]["text"] == "a b c"
    assert got["d-empty"] == []
    assert got["d-null"] is None
    assert got["d-media"][0]["media_ref"] == "m-1" and got["d-media"][0]["text"] is None
    assert got["d-nulloff"][0]["offset"] is None and got["d-nulloff"][0]["text"] == "x"
    # an all-empty batch must not crash
    empt = spark.createDataFrame([("e1", []), ("e2", None)], schema)
    got2 = {r["doc_id"]: r["spans"] for r in SP.normalize_spans_arrow(empt).collect()}
    assert got2 == {"e1": [], "e2": None}


def test_explode_and_text_extraction(spark, docs):
    ex = SP.explode_spans(docs)
    assert set(ex.columns) == {"doc_id", "span_idx", "kind", "text", "media_ref", "offset"}
    n_spans = docs.select(F.sum(F.size("spans"))).collect()[0][0]
    assert ex.count() == n_spans
    t = docs.select("doc_id", SP.text_of().alias("txt")).filter(F.length("txt") > 0)
    assert t.count() > 0
    kc = SP.span_kind_counts(docs).collect()[0]
    assert kc["n_text"] > 0 and kc["n_text"] + kc["n_image"] + kc["n_audio"] + kc["n_table"] == n_spans


def test_spans_ordered_flag_matches_rule(spark, docs):
    flags = docs.select(SP.spans_ordered().alias("ok"))
    bad = flags.filter(~F.col("ok")).count()
    assert bad > 0  # synth injects ~0.3%


def test_multimodal_pipeline_with_fake_decoder(spark):
    cat = make_media_catalog(spark, 200)
    media = MM.synth_media_payloads(cat, payload_bytes=64)
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = MM.extract_features(media, out_dim=8)
    rows = feats.collect()
    assert len(rows) == 200
    assert all(r["decode_ok"] and len(r["feature"]) == 8 for r in rows)
    # deterministic: same ref -> same feature
    f2 = {r["media_ref"]: r["feature"] for r in MM.extract_features(media, out_dim=8).collect()}
    f1 = {r["media_ref"]: r["feature"] for r in rows}
    assert f1 == f2


def test_frame_sample_plan(spark):
    cat = make_media_catalog(spark, 100)
    media = MM.synth_media_payloads(cat)
    frames = MM.frame_sample_plan(media, every_ms=60_000)
    audio = media.filter("media_kind = 'audio'").count()
    assert frames.select("media_ref").distinct().count() == audio
    assert frames.filter("frame_ts_ms % 60000 != 0").count() == 0


def test_resize_images_plumbing(spark):
    cat = make_media_catalog(spark, 50)
    media = MM.synth_media_payloads(cat, payload_bytes=64)
    resized = MM.resize_images(media, target_w=64, target_h=64)
    rows = resized.collect()
    assert len(rows) == 50
    assert all(r["width"] == 64 and r["height"] == 64 for r in rows)
    assert all(r["resize_ok"] and len(r["payload"]) == 64 for r in rows)
    # deterministic: same input -> identical payloads across runs
    again = {r["media_ref"]: bytes(r["payload"])
             for r in MM.resize_images(media, 64, 64).collect()}
    assert all(bytes(r["payload"]) == again[r["media_ref"]] for r in rows)
    # real-decoder slot degrades to resize_ok=false, not a crash
    real = MM.resize_images(media, 64, 64, use_fake_decoder=False).collect()
    assert all(not r["resize_ok"] for r in real)


def test_normalize_preserves_null_span_elements(spark):
    """A NULL element INSIDE a spans array must stay null (the struct
    validity bitmap must survive the Arrow rebuild), not become a
    non-null all-defaults span."""
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    df = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "  a  b ", "media_ref": None, "offset": 0},
                 None,
                 {"kind": "image", "text": None, "media_ref": "m-9", "offset": 8}])],
        schema,
    )
    out = SP.normalize_spans_arrow(df).collect()[0]["spans"]
    assert len(out) == 3
    assert out[0]["text"] == "a b"
    assert out[1] is None
    assert out[2]["media_ref"] == "m-9"


def test_span_fingerprint_distinguishes_null_field_patterns(spark):
    """xxhash64 skips null args; the null-pattern mask must keep
    (text='x', media_ref=null) distinct from (text=null, media_ref='x')."""
    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    a = spark.createDataFrame(
        [("d", [{"kind": "k", "text": "x", "media_ref": None, "offset": 0}])], schema)
    b = spark.createDataFrame(
        [("d", [{"kind": "k", "text": None, "media_ref": "x", "offset": 0}])], schema)
    fa = a.select(SP.span_fingerprint().alias("f")).collect()[0]["f"]
    fb = b.select(SP.span_fingerprint().alias("f")).collect()[0]["f"]
    assert fa != fb


def test_real_decoder_slot_activates_when_codec_injected(spark):
    """Directive: prove the real-decoder slot is live plumbing, not
    dead code — inject a working bytes->ndarray codec and the SAME
    mapInPandas path must flip from all-failed to all-decoded, with
    features recomputable driver-side from the payload bytes."""

    def _toy_decoder(payload):
        # stand-in real codec; NESTED so cloudpickle ships it by value
        # (a test-module-level function pickles by reference, which
        # executor workers cannot import)
        import numpy as _np

        return _np.frombuffer(bytes(payload), dtype=_np.uint8).astype(
            _np.float32
        )

    cat = make_media_catalog(spark, 60)
    media = MM.synth_media_payloads(cat, payload_bytes=32)
    # without a codec the real path fails closed (existing contract)
    gated = MM.extract_features(media, out_dim=8, use_fake_decoder=False)
    assert all(not r["decode_ok"] for r in gated.collect())
    # with a codec injected, the identical plumbing decodes everything
    live = MM.extract_features(
        media, out_dim=8, use_fake_decoder=False, decoder=_toy_decoder
    ).collect()
    assert len(live) == 60 and all(r["decode_ok"] for r in live)
    payloads = {r["media_ref"]: bytes(r["payload"]) for r in media.collect()}
    for r in live:
        want = [float(x) for x in payloads[r["media_ref"]][:8]]
        assert r["feature"] == want
    # resize: same injection contract
    resized = MM.resize_images(
        media, 32, 32, use_fake_decoder=False, decoder=_toy_decoder
    ).collect()
    assert all(r["resize_ok"] for r in resized)


def test_injected_decoder_skips_null_payloads(spark):
    """NULL payloads must fail closed BEFORE the injected codec runs —
    a real codec need not tolerate None."""
    media = spark.createDataFrame(
        [("m-1", b"\x01\x02\x03\x04"), ("m-2", None)],
        "media_ref string, payload binary",
    )

    def touchy(payload):
        import numpy as _np

        assert payload is not None, "decoder saw a NULL payload"
        return _np.frombuffer(bytes(payload), dtype=_np.uint8).astype(_np.float32)

    feats = {r["media_ref"]: r for r in MM.extract_features(
        media, out_dim=4, decoder=touchy).collect()}
    assert feats["m-1"]["decode_ok"] and not feats["m-2"]["decode_ok"]
    rs = {r["media_ref"]: r for r in MM.resize_images(
        media, 16, 16, decoder=touchy).collect()}
    assert rs["m-1"]["resize_ok"] and not rs["m-2"]["resize_ok"]


def test_injected_decoder_failures_route_per_row(spark):
    """Round-5 review fix: a real codec raises its OWN exception types
    on corrupt payloads (not DecodeUnavailable) — one bad payload must
    land as decode_ok/resize_ok=False, never abort the job; and a
    codec returning FEWER than out_dim elements is zero-padded like
    the fake path (ANSI element_at(feature, out_dim) must stay safe)."""
    media = spark.createDataFrame(
        [("m-ok", b"\x05\x06\x07\x08\x09\x0a"),
         ("m-corrupt", b"\xff"),
         ("m-short", b"\x01\x02")],
        "media_ref string, payload binary",
    )

    def picky(payload):
        import numpy as _np

        b = bytes(payload)
        if len(b) == 1:
            raise ValueError("truncated image")  # a PIL-style error
        return _np.frombuffer(b, dtype=_np.uint8).astype(_np.float32)

    rows = {r["media_ref"]: r for r in MM.extract_features(
        media, out_dim=4, decoder=picky).collect()}
    assert rows["m-ok"]["decode_ok"] and rows["m-ok"]["feature"] == [5.0, 6.0, 7.0, 8.0]
    assert not rows["m-corrupt"]["decode_ok"] and rows["m-corrupt"]["feature"] is None
    # 2-byte payload decodes to 2 elements -> padded to out_dim=4
    assert rows["m-short"]["decode_ok"]
    assert rows["m-short"]["feature"] == [1.0, 2.0, 0.0, 0.0]
    rs = {r["media_ref"]: r for r in MM.resize_images(
        media, 16, 16, decoder=picky).collect()}
    assert rs["m-ok"]["resize_ok"] and rs["m-short"]["resize_ok"]
    assert not rs["m-corrupt"]["resize_ok"]
