"""Pure-numpy media codecs (PPM / WAV / RCRV), nearest-neighbor resize,
and the feature math that the DuckDB oracles recompute byte-for-byte."""

import numpy as np
import pytest

from rdf_canon_ray.stages.multimodal import (
    MediaFeatureExtractor,
    _chunk_sums,
    decode_ppm,
    decode_rcrv,
    decode_wav,
    encode_ppm,
    encode_rcrv,
    encode_wav,
    resize_nearest,
    synth_media_table,
)


def test_ppm_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    payload = encode_ppm(img)
    assert payload.startswith(b"P6\n7 5\n255\n")
    out = decode_ppm(payload)
    assert out is not None and np.array_equal(out, img)


def test_ppm_rejects_malformed():
    assert decode_ppm(b"") is None
    assert decode_ppm(b"JUNKBYTES") is None
    assert decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 11) is None  # short data
    assert decode_ppm(b"P6\n2 2\n254\n" + b"\x00" * 12) is None  # maxval
    # comment in header is tolerated
    img = np.zeros((2, 2, 3), np.uint8)
    with_comment = b"P6\n# c\n2 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)


def test_wav_roundtrip():
    samples = np.arange(256, dtype=np.uint8)
    payload = encode_wav(samples)
    assert len(payload) == 44 + 256
    out = decode_wav(payload)
    assert out is not None and np.array_equal(out, samples)
    assert decode_wav(payload[:40]) is None
    assert decode_wav(b"RIFFxxxxNOPE" + payload[12:]) is None


def test_rcrv_roundtrip():
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (3, 4, 6)).astype(np.uint8)
    payload = encode_rcrv(frames)
    out = decode_rcrv(payload)
    assert out is not None and np.array_equal(out, frames)
    assert decode_rcrv(payload[:-1]) is None
    assert decode_rcrv(b"XXXX" + payload[4:]) is None


def test_resize_nearest_floor_grid():
    """resize uses src_y = (y*H)//out_h — checked by hand on a 4×4."""
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_nearest(img, 2, 2)
    # y grid: (0*4)//2=0, (1*4)//2=2 ; x grid likewise
    assert np.array_equal(out, img[[0, 2]][:, [0, 2]])
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[0, 0], img[0, 0]) and np.array_equal(
        up[7, 7], img[3, 3]
    )


def test_chunk_sums_partition_total():
    x = np.arange(1000) % 251
    f = _chunk_sums(x, 64)
    assert len(f) == 64
    assert int(f.sum()) == int(x.sum())
    # fewer bytes than chunks still partitions the total
    small = np.array([10, 20, 30])
    fs = _chunk_sums(small, 64)
    assert int(fs.sum()) == 60 and len(fs) == 64


def test_extractor_fallback_for_undecodable():
    import pyarrow as pa

    ex = MediaFeatureExtractor(feature_dim=64)
    batch = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "kind": pa.array(["image", "audio"]),
            "payload": pa.array([b"not a ppm", b"not a wav"], pa.binary()),
        }
    )
    out = ex(batch)
    assert out["decoded"].to_pylist() == [False, False]
    assert all(len(f) == 64 for f in out["feature"].to_pylist())


def test_synth_corpus_all_decodable():
    t = synth_media_table(64, seed=9)
    for kind, payload, w, h, dur in zip(
        t["kind"].to_pylist(),
        t["payload"].to_pylist(),
        t["width"].to_pylist(),
        t["height"].to_pylist(),
        t["duration_ms"].to_pylist(),
    ):
        if kind == "image":
            img = decode_ppm(payload)
            assert img is not None and img.shape == (h, w, 3)
        elif kind == "audio":
            s = decode_wav(payload)
            assert s is not None and dur == len(s) * 1000 // 8000
        else:
            fr = decode_rcrv(payload)
            assert fr is not None and fr.shape == (dur // 1000, h, w)


def test_pil_decode_parity_when_importable():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (9, 11, 3)).astype(np.uint8)
    via_pil = np.asarray(
        PIL_Image.open(io.BytesIO(encode_ppm(img))).convert("RGB")
    )
    assert np.array_equal(via_pil, decode_ppm(encode_ppm(img)))


def test_sample_frames_ts_aligns_with_frame_bytes(ray_session):
    """When more native frames exist than samples (n < nf), the emitted
    frame bytes are the frame AT the emitted timestamp, not frame i."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rdf_canon_ray.stages.multimodal import encode_rcrv, sample_frames

    rng = np.random.RandomState(7)
    nf = 20  # 20 s at 1 fps → sampled n = max_frames = 8
    frames = rng.randint(0, 256, (nf, 4, 4)).astype(np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["video"]),
            "payload": pa.array([encode_rcrv(frames)], pa.binary()),
            "duration_ms": pa.array([nf * 1000], pa.int32()),
        }
    )
    out = sample_frames(rd.from_arrow(t)).to_pandas().sort_values("frame_idx")
    assert len(out) == 8
    for _, row in out.iterrows():
        src = (row["frame_idx"] * nf) // 8
        assert row["frame"] == frames[src].tobytes()
        # ts and source frame agree at 1 fps: src == ts_ms // 1000
        assert src == row["ts_ms"] // 1000


def test_ivf_persisted_raises_on_corrupt_index(ray_session, tmp_path):
    import os

    import pytest as _pytest

    from rdf_canon_ray.pipelines import corpus
    from rdf_canon_ray.stages.similarity import ivf_cosine_topk_persisted

    index_dir = "/tmp/rcr_cache/sf0.001/ivf_index_16"
    corpus.ann_ivf_persisted("/root/testdata/sf0.001")  # ensure built
    # clone the index, then gut one list's data file
    import shutil

    broken = str(tmp_path / "broken_index")
    shutil.copytree(index_dir, broken)
    victims = [d for d in os.listdir(broken) if d.startswith("list=")]
    os.remove(os.path.join(broken, victims[0], "data.parquet"))
    q = corpus._query_vectors("/root/testdata/sf0.001")
    with _pytest.raises(FileNotFoundError, match="corrupt"):
        ivf_cosine_topk_persisted(broken, q, n_probes=16)
    # wholly deleted partition dir is detected too (manifest authority)
    broken2 = str(tmp_path / "broken_index2")
    shutil.copytree(index_dir, broken2)
    shutil.rmtree(os.path.join(broken2, victims[0]))
    with _pytest.raises(FileNotFoundError, match="corrupt"):
        ivf_cosine_topk_persisted(broken2, q, n_probes=16)


def test_codec_roundtrips_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from rdf_canon_ray.stages import multimodal as mm

    @settings(max_examples=50, deadline=None)
    @given(
        arrays(
            np.uint8,
            st.tuples(
                st.integers(1, 12), st.integers(1, 12), st.just(3)
            ),
        )
    )
    def ppm_rt(img):
        out = mm.decode_ppm(mm.encode_ppm(img))
        assert out is not None and np.array_equal(out, img)

    @settings(max_examples=50, deadline=None)
    @given(arrays(np.uint8, st.integers(1, 500)))
    def wav_rt(samples):
        out = mm.decode_wav(mm.encode_wav(samples))
        assert out is not None and np.array_equal(out, samples)

    @settings(max_examples=50, deadline=None)
    @given(
        arrays(
            np.uint8,
            st.tuples(
                st.integers(1, 6),
                st.integers(1, 8),
                st.integers(1, 8),
            ),
        )
    )
    def rcrv_rt(frames):
        out = mm.decode_rcrv(mm.encode_rcrv(frames))
        assert out is not None and np.array_equal(out, frames)

    ppm_rt()
    wav_rt()
    rcrv_rt()

    # corrupt payloads must return None (the stub-fallback contract),
    # never raise
    assert mm.decode_ppm(b"") is None
    assert mm.decode_wav(b"RIFFxxxx") is None
    assert mm.decode_rcrv(b"\x00\x01") is None


def test_dhash_scalar_reference_and_invariances():
    from rdf_canon_ray.stages.multimodal import dhash_ppm

    rng = np.random.RandomState(11)
    img = rng.randint(0, 200, (24, 31, 3)).astype(np.uint8)
    h = dhash_ppm(img)
    assert len(h) == 16 and set(h) <= set("0123456789abcdef")
    # scalar reference: recompute one bit by hand
    gy = (0 * 24) // 8
    gxl, gxr = (0 * 31) // 9, (1 * 31) // 9
    bit0 = int(img[gy, gxl].astype(np.int64).sum() > img[gy, gxr].astype(np.int64).sum())
    assert (int(h[0], 16) >> 3) & 1 == bit0
    # uniform brightness shift preserves every gradient sign
    assert dhash_ppm(np.clip(img.astype(np.int64) + 40, 0, 255).astype(np.uint8)) == h
    # determinism / equality of identical content at a different size is
    # NOT expected; identical content is
    assert dhash_ppm(img.copy()) == h


def test_dhash_near_dup_small_hamming(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdf_canon_ray.stages.multimodal import encode_ppm, image_dhash

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    noisy = base.copy()
    noisy[5, 7] = 255 - noisy[5, 7]  # flip one pixel
    other = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "kind": pa.array(["image"] * 3),
            "payload": pa.array(
                [encode_ppm(base), encode_ppm(noisy), encode_ppm(other)],
                pa.binary(),
            ),
        }
    )
    got = image_dhash(rd.from_arrow(t)).to_pandas().set_index("media_id")["dhash"]

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert ham(got[0], got[1]) <= 4       # near-dup: tiny distance
    assert ham(got[0], got[2]) >= 16      # unrelated: far apart


def test_media_dhash_pairs_exact_vs_brute_force(ray_session):
    """Banded dHash LSH (8 one-byte bands) is EXACT for hamming <= 7:
    the pair set must equal the all-pairs brute force, and the planted
    near-dup variants (v4 corpus) must be found."""
    import numpy as np

    from rdf_canon_ray.pipelines import corpus

    got = corpus.media_dhash_pairs("unused").to_pandas()
    d = corpus.media_dhash("unused").to_pandas()
    h = np.array([int(x, 16) for x in d["dhash"]], dtype=np.uint64)
    ids = d["media_id"].to_numpy()
    exp = set()
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            ham = bin(int(h[i] ^ h[j])).count("1")
            if ham <= 7:
                a, b = sorted((int(ids[i]), int(ids[j])))
                exp.add((a, b, ham))
    assert set(zip(got["media_id_a"], got["media_id_b"], got["hamming"])) == exp
    assert len(exp) >= 20  # the planted variants are present
    assert (got["hamming"] == 0).any()  # pixel-exact re-encodes
