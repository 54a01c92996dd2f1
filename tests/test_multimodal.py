

def test_audio_features_square_wave_closed_forms(spark, sf_dir):
    """The graded square-wave features equal their closed forms, and the
    extractor itself is unit-checked on a hand-built payload (peak,
    strict-sign-flip crossings, exact energy, error fallback)."""
    import struct
    from array import array

    from watsondedupe_spark.operators.multimodal import _wav_pcm16_features
    from watsondedupe_spark.queries import all_queries

    # unit: 6 samples [5, -5, 5, 0, -3, 3] -> peak 5, energy 93,
    # crossings: 5/-5, -5/5, -3/3 (zero breaks the 0/-3 run) = 3
    samples = array("h", [5, -5, 5, 0, -3, 3])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = samples.tobytes()
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    n, peak, zc, energy = _wav_pcm16_features(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (n, peak, zc, energy) == (6, 5, 3, 93)
    import pytest

    with pytest.raises(ValueError):
        _wav_pcm16_features(b"RIFF\x00\x00\x00\x00NOPE")

    rows = all_queries()["multimodal_audio_features"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        did = int(r.id)
        amp, period, n = 1000 + did % 29000, 1 + did % 16, 200 + did % 700
        assert (r.n_samples, r.peak, r.zero_crossings, r.energy) == (
            n, amp, (n - 1) // period, n * amp * amp
        )
