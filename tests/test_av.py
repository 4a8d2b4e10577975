"""Audio/video stand-in codecs + actor-stage plumbing."""

import numpy as np
import pyarrow.parquet as pq

from humid_ray.av import (
    audio_features,
    decode_fvid_frame,
    decode_fwav,
    encode_fvid,
    encode_fwav,
    fvid_info,
)


def test_fwav_roundtrip():
    rng = np.random.default_rng(0)
    s = (rng.normal(0, 8000, 12345)).astype(np.int16)
    back, sr = decode_fwav(encode_fwav(s, 16000))
    assert sr == 16000
    assert np.array_equal(back, s)
    for junk in (b"", b"RIFFxxxx", b"FWAV\x00"):
        try:
            decode_fwav(junk)
            assert False, "junk must raise"
        except ValueError:
            pass


def test_audio_features_oracle():
    sr = 8000
    t = np.arange(sr) / sr
    s = (np.sin(2 * np.pi * 440 * t) * 10000).astype(np.int16)
    f = audio_features(s, sr)
    assert abs(f["duration"] - 1.0) < 1e-9
    # RMS of a sine with amplitude a is a/sqrt(2)
    assert abs(f["rms"] - (10000 / 32768) / np.sqrt(2)) < 1e-3
    # a 440 Hz sine crosses zero 2*440 times per second
    assert abs(f["zcr"] - 2 * 440 / sr) < 1e-3
    # spectral centroid of a pure tone is its frequency
    assert abs(f["centroid"] - 440.0) < 1.0


def test_fvid_random_access():
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (16, 16)).astype(np.uint8) for _ in range(7)]
    data = encode_fvid(frames, fps=5)
    n, fps = fvid_info(data)
    assert (n, fps) == (7, 5)
    from humid_ray.png import psnr

    for i in (0, 3, 6):
        assert psnr(decode_fvid_frame(data, i), frames[i]) >= 40.0


def test_audio_stage_pipeline(ray_session, tmp_path):
    from humid_ray.pipelines.multimodal import audio_feature_stats
    from humid_ray.synth import make_audio_corpus

    corpus = make_audio_corpus(str(tmp_path), 40)
    df = audio_feature_stats(corpus).to_pandas()
    src = pq.read_table(f"{corpus}/part-00000.parquet").to_pandas()
    assert len(df) == len(src)
    # decodable iff stored metadata non-null, and dims must agree
    merged = df.merge(src[["audio_id", "sr", "n_samples"]], on="audio_id",
                      suffixes=("", "_stored"))
    assert (merged.ok == merged.sr_stored.notna()).all()
    ok = merged[merged.ok]
    assert (ok.sr == ok.sr_stored).all()
    assert (ok.n_samples == ok.n_samples_stored).all()
    assert (ok.rms > 0).all()


def test_video_stage_pipeline(ray_session, tmp_path):
    from humid_ray.pipelines.multimodal import video_frame_samples
    from humid_ray.synth import make_video_corpus

    corpus = make_video_corpus(str(tmp_path), 22)
    df = video_frame_samples(corpus, stride=4).to_pandas()
    src = pq.read_table(f"{corpus}/part-00000.parquet").to_pandas()
    valid = src[src.n_frames.notna()]
    # one row per sampled frame: ceil(n_frames / stride) per valid video
    expect = int(np.ceil(valid.n_frames / 4).sum())
    assert len(df) == expect
    assert set(df.video_id) == set(valid.video_id)
    assert (df.fw == 32).all() and (df.fh == 32).all()
    # sampled idx pattern
    got = df[df.video_id == valid.video_id.iloc[0]].frame_idx.tolist()
    n0 = int(valid.n_frames.iloc[0])
    assert sorted(got) == list(range(0, n0, 4))


def test_video_neardup_matches_bruteforce(ray_session, tmp_path):
    """Frame-pHash-set Jaccard >= t pairs vs an all-pairs oracle:
    planted near-dup clips (same frames, one re-rendered) recovered
    with recall 1.0 and zero false positives."""
    from humid_ray.av import decode_fvid_frame, fvid_info
    from humid_ray.functions.phash import phash_image
    from humid_ray.pipelines.multimodal import video_neardup_pairs
    from humid_ray.synth import make_video_corpus

    corpus = make_video_corpus(str(tmp_path), 50)
    src = pq.read_table(f"{corpus}/part-00000.parquet").to_pandas()
    sets = {}
    for _, row in src[src.n_frames.notna()].iterrows():
        n, _ = fvid_info(row.bytes)
        sets[row.video_id] = {int(phash_image(decode_fvid_frame(row.bytes, f)))
                              for f in range(n)}
    truth = {}
    vids = sorted(sets)
    for i in range(len(vids)):
        for j in range(i + 1, len(vids)):
            a, b = sets[vids[i]], sets[vids[j]]
            union = len(a | b)
            jac = len(a & b) / union if union else 0.0
            if jac >= 0.6:
                truth[(vids[i], vids[j])] = round(jac, 6)

    out = video_neardup_pairs(corpus, threshold=0.6)
    rows = out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert got == truth
    assert truth, "corpus must contain planted near-dup videos"


def test_audio_neardup_matches_bruteforce(ray_session, tmp_path):
    """Spectral-landmark-set Jaccard >= t pairs vs an all-pairs oracle:
    planted re-encoded clips recovered; zero deviations either way."""
    from humid_ray.av import audio_landmarks, decode_fwav
    from humid_ray.pipelines.multimodal import audio_neardup_pairs
    from humid_ray.synth import make_audio_corpus

    corpus = make_audio_corpus(str(tmp_path), 55)
    src = pq.read_table(f"{corpus}/part-00000.parquet").to_pandas()
    sets = {}
    for _, row in src[src.sr.notna()].iterrows():
        s, sr = decode_fwav(row.bytes)
        sets[row.audio_id] = set(audio_landmarks(s, sr).tolist())
    truth = {}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            union = len(a | b)
            jac = len(a & b) / union if union else 0.0
            if jac >= 0.6:
                truth[(ids[i], ids[j])] = round(jac, 6)

    out = audio_neardup_pairs(corpus, threshold=0.6)
    rows = out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert got == truth
    # the planted re-encodes must be among them
    valid = set(src[src.sr.notna()].audio_id)
    planted = {(f"aud{i-1:08d}", f"aud{i:08d}") for i in range(55)
               if i % 9 == 8 and i % 13 != 12 and f"aud{i-1:08d}" in valid}
    assert planted <= set(got)


def test_set_neardup_hot_bucket_salted(ray_session):
    """VERDICT r2 #1: >=1k clips sharing band keys must complete with
    bounded per-task pairs (salted sub-bands + chunked verify) and
    still produce the exact all-pairs result: two identical-set
    families (600 + 400 members) whose sets overlap at jaccard 0.777."""
    import numpy as np
    import ray.data

    from humid_ray.pipelines.multimodal import (
        _set_band_counts,
        _set_signature_table,
        set_neardup_pairs,
    )

    set_a = list(range(1000, 1040))          # |A|=40
    set_b = list(range(1005, 1045))          # |A∩B|=35, |A∪B|=45 -> 0.777778
    ids, flat, counts = [], [], []
    for i in range(1000):
        s = set_a if i < 600 else set_b
        ids.append(f"clip{i:06d}")
        flat.extend(s)
        counts.append(len(s))
    sigs_t = _set_signature_table(ids, flat, counts, 64)
    sigs = ray.data.from_arrow(sigs_t)

    # the counting pre-pass must actually flag hot buckets here
    assert _set_band_counts(ray.data.from_arrow(sigs_t), 16, 64)

    out = set_neardup_pairs(sigs, 0.6, 64, 16, hot_bucket_threshold=64)
    t = out.to_pandas() if hasattr(out, "to_pandas") else out.to_pandas()
    assert len(t) == 1000 * 999 // 2  # every unordered pair, exactly once
    assert not t.duplicated(["doc_a", "doc_b"]).any()
    ones = t[t.jaccard == 1.0]
    cross = t[t.jaccard != 1.0]
    assert len(ones) == 600 * 599 // 2 + 400 * 399 // 2
    assert len(cross) == 600 * 400
    assert np.allclose(cross.jaccard, round(35 / 45, 6))


def test_set_neardup_single_band_hot_bucket(ray_session):
    """n_bands=1 leaves no other band to salt hot rows into; the stage
    must fall back to plain emission instead of silently dropping every
    row of a hot bucket (which returned zero pairs)."""
    import ray.data

    from humid_ray.pipelines.multimodal import (
        _set_signature_table,
        set_neardup_pairs,
    )

    items = list(range(50))
    ids, flat, counts = [], [], []
    for i in range(400):  # 400 identical sets >> hot_bucket_threshold
        ids.append(f"clip{i:06d}")
        flat.extend(items)
        counts.append(len(items))
    sigs = ray.data.from_arrow(_set_signature_table(ids, flat, counts, 64))
    out = set_neardup_pairs(sigs, 0.6, 64, 1, hot_bucket_threshold=64)
    t = out.to_pandas()
    assert len(t) == 400 * 399 // 2
    assert (t.jaccard == 1.0).all()
