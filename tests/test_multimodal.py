

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


def test_scene_cuts_match_reference(spark, sf_dir):
    """Frame features and cut flags equal a plain-Python re-derivation
    from the raw text payloads (slice arithmetic + byte sums + integer
    cross-product threshold)."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.engine_native import _CUT_THRESH
    from watsondedupe_spark.sources import read_table

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter("doc_id % 7 = 0 AND length(text) > 0")
        .select("doc_id", "text")
        .collect()
    )
    expected = {}
    for r in docs:
        payload = r.text.encode("utf-8")
        L = len(payload)
        step = max(1, L // 4)
        frames = [
            payload[i * step : (i + 1) * step]
            for i in range(min(4, (L + step - 1) // step))
        ]
        cuts = []
        for i in range(1, len(frames)):
            f0, f1 = frames[i - 1], frames[i]
            s0, s1 = sum(f0), sum(f1)
            cuts.append(
                abs(s1 * len(f0) - s0 * len(f1)) > _CUT_THRESH * len(f0) * len(f1)
            )
        first = next((i + 1 for i, c in enumerate(cuts) if c), -1)
        expected[str(r.doc_id)] = (len(frames), sum(cuts), first)

    got = all_queries()["multimodal_scene_cuts"].spark(spark, sf_dir).collect()
    assert {r.id: (r.n_frames, r.n_cuts, r.first_cut) for r in got} == expected
    assert any(v[1] > 0 for v in expected.values())
