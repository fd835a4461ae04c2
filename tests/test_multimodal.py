"""Multimodal decode path: real stdlib WAV decoder + plumbing."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import multimodal as mm


def test_synthesize_then_decode_wav_roundtrip():
    payload = mm.synthesize_wav(7, 40)
    # Real RIFF container: magic + sizes parse with the stdlib module.
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    feats = mm.decode_media(payload, "audio/wav")
    assert feats["sample_rate"] == mm.WAV_SAMPLE_RATE
    assert feats["channels"] == 1 and feats["bits"] == 8
    assert feats["n_samples"] == 40
    assert feats["amp_sum"] == sum(
        abs((7 * 31 + i * 7) % 256 - 128) for i in range(40)
    )


def test_decode_media_unknown_mime_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_wav_features_distributed(spark):
    docs = io.load(spark, SF_DIR, "documents").limit(20)
    out = mm.wav_features(mm.attach_wav_payload(docs)).collect()
    assert len(out) == 20
    for r in out:
        assert r.n_samples == r.doc_id % 50 + 20
        assert r.sample_rate == mm.WAV_SAMPLE_RATE
        assert abs(r.duration_ms - r.n_samples * 1000.0 / 8000) < 1e-6
        assert 0.0 <= r.amp_mean <= 128.0


def test_fake_decoder_plumbing_still_works(spark):
    docs = io.load(spark, SF_DIR, "documents").limit(5)
    media = mm.attach_binary_payload(docs)
    rows = mm.extract_features(media).collect()  # FAKE_DECODER default
    assert len(rows) == 5
    assert all(r.byte_len is not None and r.payload_md5 for r in rows)


def test_png_decoder_roundtrip():
    """The stdlib PNG codec pair: synthesize -> decode recovers the
    exact header fields and pixel sum."""
    from ts_data_pipeline_spark.operators import multimodal as mm

    for doc_id in (0, 7, 123, 4999):
        w, h = doc_id % 16 + 1, doc_id % 8 + 1
        got = mm._decode_png(mm.synthesize_png(doc_id))
        want_sum = sum(
            (doc_id * 17 + y * 31 + x * 7) % 256
            for y in range(h) for x in range(w)
        )
        assert got == {
            "width": w, "height": h, "bit_depth": 8, "color_type": 0,
            "n_pixels": w * h, "pix_sum": want_sum,
        }


def test_png_decoder_rejects_garbage():
    import pytest

    from ts_data_pipeline_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="bad signature"):
        mm._decode_png(b"GIF89a not a png")
