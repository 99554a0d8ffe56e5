"""Multimodal plumbing (stubbed decode) + JSON trim tool."""

import json

import pytest

import ray.data as rd

from mlp_ray.ops import multimodal, trim


def test_media_pipeline_plumbing():
    tbl = multimodal.synth_media_table(200, seed=1)
    ds = rd.from_arrow(tbl)
    feats = ds.map_batches(multimodal.MediaDecoder, batch_format="pyarrow",
                           batch_size=64, concurrency=2).to_pandas()
    assert len(feats) == 200
    assert all(len(f) == multimodal.MediaDecoder.FEATURE_DIM
               for f in feats["features"])
    # deterministic: same payload → same features
    again = ds.map_batches(multimodal.MediaDecoder, batch_format="pyarrow",
                           batch_size=64, concurrency=2).to_pandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = again.sort_values("media_id").reset_index(drop=True)
    for x, y in zip(a["features"], b["features"]):
        assert list(x) == list(y)


def test_codec_roundtrips():
    """Pure-numpy codecs: encode→decode identity for PPM, BMP (row
    padding + bottom-up + BGR) and PCM-16 WAV."""
    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)  # odd row pad
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    assert (multimodal.decode_bmp24(
        multimodal.encode_bmp24(img)) == img).all()
    tone = (np.sin(np.arange(2000) / 10) * 10000).astype(np.int16)
    s, sr = multimodal.decode_wav_pcm16(
        multimodal.encode_wav_pcm16(tone, 8000))
    assert sr == 8000 and (s == tone).all()


def test_media_real_decode():
    """real=True genuinely decodes PPM/BMP/WAV (dims + channel means
    land in the features); compressed/unknown payloads raise at the
    marked seam (or route out with decoded=False when skipping)."""
    import numpy as np

    tbl = multimodal.synth_media_table(60, seed=7, real_payloads=True)
    ds = rd.from_arrow(tbl)
    out = ds.map_batches(multimodal.MediaDecoder, batch_format="pyarrow",
                         fn_constructor_kwargs={"real": True},
                         batch_size=16, concurrency=2).to_pandas()
    df = tbl.to_pandas()
    m = out.merge(df[["media_id", "media_type", "width", "height"]],
                  on=["media_id", "media_type"])
    img = m[m["media_type"] == "image"]
    assert img["decoded"].all()
    # feature[0:2] are the true decoded dims
    assert all(int(f[0]) == w and int(f[1]) == h
               for f, w, h in zip(img["features"], img["width"],
                                  img["height"]))
    aud = m[m["media_type"] == "audio"]
    assert aud["decoded"].all()
    assert all(int(f[0]) == 8000 and f[2] > 0.1 for f in aud["features"])
    vid = m[m["media_type"] == "video"]  # opaque noise: not decodable
    assert (~vid["decoded"]).all()
    with pytest.raises(NotImplementedError):
        multimodal.MediaDecoder(real=True, skip_undecodable=False)(
            tbl.filter(__import__("pyarrow").compute.equal(
                tbl["media_type"], "video")).slice(0, 1))


def test_frame_sampler():
    tbl = multimodal.synth_media_table(10, seed=2, payload_bytes=2560)
    ds = rd.from_arrow(tbl)
    frames = ds.map_batches(multimodal.FrameSampler, batch_format="pyarrow",
                            batch_size=8, concurrency=2).to_pandas()
    assert set(frames["media_id"]) == set(range(10))
    assert (frames["frame_index"] % 10 == 0).all()


def test_trim_semantics():
    doc = {
        "ns": "a-very-long-namespace-name-over-35-chars-long.collection",
        "lsid": {"id": "x"},
        "filter": {"s": "y" * 60, "arr": [1, 2, 3, 4, 5, 6]},
        "pipeline": [1, 2, 3, 4, 5],
        "empty": {},
    }
    out = json.loads(trim.trim_json_str(json.dumps(doc)))
    assert "lsid" not in out                      # verbose key dropped
    assert out["ns"] == doc["ns"]                 # ns never truncated
    assert out["filter"]["s"].endswith("...")
    assert len(out["filter"]["s"]) == 38
    assert out["filter"]["arr"] == [1, "<truncated 5 elements>"]
    assert out["pipeline"] == [1, 2, 3, 4, 5]     # preserved array key
    assert out["empty"] == {}                     # empty stays (was empty)


def test_trim_pipeline_row_preserving():
    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = ds.map_batches(trim.trim_batch, batch_format="pyarrow")
    assert out.count() == ds.count()
    sample = out.take(3)
    for r in sample:
        assert json.loads(r["trimmed"]) is not None


def test_resizer(ray_session):
    import numpy as np
    import ray.data as rd
    from mlp_ray.ops.multimodal import Resizer, synth_media_table

    tbl = synth_media_table(64, seed=3)
    out = (rd.from_arrow(tbl)
           .map_batches(Resizer, batch_format="pyarrow", batch_size=32,
                        fn_constructor_kwargs={"max_side": 128},
                        concurrency=(1, 2)).to_pandas())
    assert len(out) == 64
    assert (out[["width", "height"]].max(axis=1) <= 128).all()
    # aspect ratio preserved within integer rounding
    orig = tbl.to_pandas()
    merged = out.merge(orig, on="media_id", suffixes=("_n", ""))
    ar_new = merged["width_n"] / merged["height_n"]
    ar_old = merged["width"] / merged["height"]
    assert np.allclose(ar_new, ar_old, rtol=0.15)
    # payload shrinks proportionally, never empty
    assert (merged["payload_n"].str.len() >= 1).all()
    # already-small images untouched
    small = merged[(merged["width"] <= 128) & (merged["height"] <= 128)]
    if len(small):
        assert (small["scale"] == 1.0).all()


def test_resizer_real(ray_session):
    """real=True decodes, nearest-neighbor-resamples and re-encodes:
    output payloads are valid PPMs at the reported dims."""
    import numpy as np
    from mlp_ray.ops.multimodal import (Resizer, decode_ppm,
                                        synth_media_table)

    tbl = synth_media_table(40, seed=9, real_payloads=True)
    out = (rd.from_arrow(tbl)
           .map_batches(Resizer, batch_format="pyarrow", batch_size=16,
                        fn_constructor_kwargs={"max_side": 16,
                                               "real": True},
                        concurrency=(1, 2)).to_pandas())
    img = out[out["media_type"] == "image"]
    assert len(img) and (img[["width", "height"]].max(axis=1) <= 16).all()
    for _, r in img.iterrows():
        dec = decode_ppm(r["payload"])
        assert dec.shape == (r["height"], r["width"], 3)
    # non-image payloads pass through untouched
    other = out[out["media_type"] != "image"]
    orig = tbl.to_pandas().set_index("media_id")["payload"]
    assert all(r["payload"] == orig[r["media_id"]]
               for _, r in other.iterrows())


def test_malformed_payloads_never_hang_or_crash():
    """Truncated headers with a known magic must raise cleanly (not
    spin, not struct-crash), and skip paths must route them out."""
    import pyarrow as pa

    bad = [b"P6 12", b"P6\n", b"BM" + b"\x01" * 6, b"RIFF1234WAVEfmt "]
    for p in bad:
        with pytest.raises(multimodal.UNDECODABLE):
            multimodal.decode_payload(p)
    tbl = pa.table({
        "media_id": pa.array(range(len(bad)), pa.int64()),
        "payload": pa.array(bad, pa.binary()),
        "media_type": pa.array(["image"] * len(bad), pa.string()),
        "width": pa.array([8] * len(bad), pa.int32()),
        "height": pa.array([8] * len(bad), pa.int32())})
    out = multimodal.MediaDecoder(real=True)(tbl).to_pandas()
    assert (~out["decoded"]).all()
    res = multimodal.Resizer(max_side=4, real=True)(tbl).to_pandas()
    assert list(res["payload"]) == bad  # passed through untouched
    frames = multimodal.FrameSampler()(tbl).to_pandas()
    assert set(frames["media_id"]) == set(range(len(bad)))


def test_spectrogram_recovers_tone_frequency(ray_session):
    """A pure sine at f Hz must put the dominant rfft bin within one
    bin width (sr/n_fft) of f, and its log-band energy must peak in
    the band containing f."""
    import numpy as np

    from mlp_ray.ops.multimodal import (encode_wav_pcm16,
                                        decode_wav_pcm16,
                                        stft_band_energies)

    sr = 8000
    for f in (150.0, 440.0, 1000.0, 3500.0):
        t = np.arange(sr)  # 1 s
        tone = (np.sin(2 * np.pi * f * t / sr) * 12000).astype(np.int16)
        samples, got_sr = decode_wav_pcm16(encode_wav_pcm16(tone, sr))
        e, hz = stft_band_energies(samples, got_sr)
        assert got_sr == sr
        assert abs(hz - f) <= sr / 512 + 1e-9, (f, hz)
        edges = np.geomspace(50.0, sr / 2.0, 17)
        want_band = int(np.searchsorted(edges, f, side="right") - 1)
        assert int(np.argmax(e)) == want_band, (f, np.argmax(e))


def test_spectrogram_stage_routes_non_audio(ray_session):
    import numpy as np
    import ray.data as rd

    from mlp_ray.ops.multimodal import (SpectrogramExtractor,
                                        synth_media_table)

    tbl = synth_media_table(64, real_payloads=True)
    out = (rd.from_arrow(tbl)
           .map_batches(SpectrogramExtractor, batch_format="pyarrow",
                        batch_size=16, concurrency=(1, 2))
           .to_pandas())
    assert len(out) == 64
    kinds = tbl["media_type"].to_pylist()
    assert (out["decoded"].to_numpy()
            == np.array([k == "audio" for k in kinds])).all()
    aud = out.loc[out["decoded"]]
    assert (aud["dominant_hz"] > 0).all()


def test_sharpness_orders_blurred_below_sharp(ray_session):
    """For any noise image, its box-blurred twin must score a LOWER
    laplacian variance, and the stage must route non-images out."""
    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    from mlp_ray.ops.multimodal import (SharpnessScorer, box_blur,
                                        encode_ppm, laplacian_variance,
                                        synth_media_table)

    rng = np.random.default_rng(3)
    sharp = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    blurred = box_blur(sharp, radius=3)
    assert laplacian_variance(blurred) < laplacian_variance(sharp) / 4

    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([encode_ppm(sharp), encode_ppm(blurred),
                             b"garbage"], pa.binary()),
        "media_type": pa.array(["image", "image", "image"], pa.string()),
    })
    out = (rd.from_arrow(tbl)
           .map_batches(SharpnessScorer, batch_format="pyarrow",
                        batch_size=8, concurrency=(1, 2))
           .to_pandas().set_index("media_id"))
    assert out.loc[0, "laplacian_var"] > out.loc[1, "laplacian_var"]
    assert not out.loc[2, "decoded"]

    full = (rd.from_arrow(synth_media_table(64, real_payloads=True))
            .map_batches(SharpnessScorer, batch_format="pyarrow",
                         batch_size=16, concurrency=(1, 2))
            .to_pandas())
    assert (full["decoded"] == (full["laplacian_var"] > 0)).all()


def test_phash_near_dup_planted_recall(ray_session):
    """Blurred twins of structured images must pair with their source
    at small Hamming distance; the pair set must contain every planted
    twin (8-band pigeonhole at max_hamming=6)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from mlp_ray.ops.multimodal import (box_blur, encode_ppm,
                                        phash_near_dup)

    rng = np.random.default_rng(11)
    rows = []
    y, x = np.mgrid[0:48, 0:64]
    for i in range(12):
        img = np.stack([(x * (i + 2)) % 256, (y * (i + 3)) % 256,
                        ((x + y) * (i + 1)) % 256], axis=2) \
            .astype(np.uint8)
        img[8 + i:30 + i, 10:50] = (i * 37) % 256
        rows.append((i, encode_ppm(img), img))
    planted = []
    for i, (mid, _p, img) in enumerate(rows[:5]):
        planted.append((100_000 + mid,
                        encode_ppm(box_blur(img, 1))))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows]
                             + [p[0] for p in planted], pa.int64()),
        "payload": pa.array([r[1] for r in rows]
                            + [p[1] for p in planted], pa.binary()),
        "media_type": pa.array(["image"] * (len(rows) + len(planted)),
                               pa.string()),
    })
    out = phash_near_dup(rd.from_arrow(tbl))
    got = dict(zip(out["media_id"], out["dup_of"]))
    from mlp_ray.ops.multimodal import hamming64, phash64, decode_payload
    for pid, payload in planted:
        # every twin is flagged; its canonical is the EARLIEST image
        # within threshold (may precede the true source when two
        # originals are themselves similar — same contract as simhash)
        assert pid in got, (pid, got)
        assert got[pid] <= pid - 100_000
        src_img = rows[pid - 100_000][2]
        twin_img = decode_payload(payload)[1]
        assert hamming64(phash64(src_img), phash64(twin_img)) <= 6
    assert (out["hamming"] <= 6).all()
