"""Native C++ preprocess library: built-on-demand equality tests
against the numpy reference implementations."""

import numpy as np
import pytest

from movenet_tpu.data import preprocess as pp


@pytest.fixture(scope="module")
def native():
    from movenet_tpu.native import loader
    if not loader.available():
        try:
            from movenet_tpu.native.build import build
            build(verbose=False)
            loader._checked = False  # re-probe
        except Exception as e:
            pytest.skip(f"native build unavailable: {e}")
    if not loader.available():
        pytest.skip("native library not built")
    return loader


def test_native_audio_codes_match_numpy(native, rng_np):
    audio = rng_np.standard_normal((2, 3937)).astype(np.float32)
    got = native.preprocess_audio(audio, 256, True, 1600)
    mono = audio.mean(axis=0)
    want = pp.mu_law_encode_np(
        pp.normalize_audio_np(pp.resample_np(mono, 3937, 1600)[:1600]),
        256)
    # identical integer codes (same double-precision filter weights)
    np.testing.assert_array_equal(got, want)


def test_native_audio_mono_and_edge_cases(native):
    silent = np.zeros((1, 1000), np.float32)
    codes = native.preprocess_audio(silent, 64, True, 500)
    # all-zero guard: stays zero -> mu-law of 0
    assert (codes == pp.mu_law_encode_np(np.zeros(500), 64)).all()


def test_native_video_matches_numpy(native, rng_np):
    video = rng_np.integers(0, 255, (33, 48, 56, 3)).astype(np.uint8)
    got = native.preprocess_video(video, 16, (64, 64))
    gray = np.trunc(video.astype(np.float32) @ pp._LUMA)
    frames = np.stack([pp._bilinear_resize(f, (64, 64)) for f in gray])
    want = pp.uniform_temporal_subsample(frames, 16, axis=0)[..., None]
    assert got.shape == want.shape == (16, 64, 64, 1)
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_native_dispatch_used_by_preprocess(native, rng_np):
    # the public preprocess functions route through the native library
    # when built; results must agree with the numpy fallback
    video = rng_np.integers(0, 255, (20, 32, 32, 3)).astype(np.uint8)
    audio = rng_np.standard_normal(4410).astype(np.float32)
    v = pp.preprocess_video(video, num_frames=8)
    a = pp.preprocess_audio(audio, 128, target_frames=800)
    assert v.shape == (8, 64, 64, 1)
    assert a.shape == (800,) and a.dtype == np.int32
