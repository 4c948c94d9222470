"""Data layer: index scanning, preprocessing parity (numpy vs jax ops),
loader batching/cropping, curation CLI, synthetic datasets."""

import numpy as np
import pytest

import jax.numpy as jnp

from movenet_tpu.data import (
    DataLoader,
    get_dataloader,
    kinetics_index,
    make_synthetic_dataset,
    preprocess_audio,
    preprocess_video,
    uniform_temporal_subsample,
)
from movenet_tpu.data.preprocess import (
    mu_law_decode_np,
    mu_law_encode_np,
    normalize_audio_np,
    resample_np,
)
from movenet_tpu.ops import (
    mu_law_encode,
    mu_law_decode,
    normalize_audio,
    resample,
)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kinetics_synth")
    # small geometry: 1s @ 4 kHz audio, 16 frames, so tests stay fast
    make_synthetic_dataset(
        root, categories=["breakdancing", "salsa"], clips_per_category=3,
        audio_fps=4000, video_fps=16, duration_s=1.0, frame_hw=(48, 48),
        seed=7)
    return root


# ----------------------------------------------------------------- index
def test_kinetics_index_structure(dataset_root, tmp_path):
    idx = kinetics_index(dataset_root, train=True)
    assert len(idx) == 6
    assert idx.contexts == ["breakdancing", "salsa"]
    assert idx.class_balance == {"breakdancing": 0.5, "salsa": 0.5}

    val = kinetics_index(dataset_root, train=False)
    assert len(val) == 2  # clips_per_category // 2 per category

    # skip rules: _raw and dotfiles (reference dataset.py:126-128)
    d = dataset_root / "train" / "breakdancing"
    (d / "clip_x_raw.npz").write_bytes(b"junk")
    (d / ".hidden.npz").write_bytes(b"junk")
    try:
        idx2 = kinetics_index(dataset_root, train=True)
        assert len(idx2) == 6
    finally:
        (d / "clip_x_raw.npz").unlink()
        (d / ".hidden.npz").unlink()


def test_index_sharding(dataset_root):
    idx = kinetics_index(dataset_root, train=True)
    shards = [idx.shard(i, 3) for i in range(3)]
    assert sum(len(s) for s in shards) == len(idx)
    all_fps = sorted(e.filepath for s in shards for e in s.entries)
    assert all_fps == sorted(e.filepath for e in idx.entries)


# ------------------------------------------------------- host/device par
def test_numpy_ops_match_jax(rng_np):
    x = rng_np.standard_normal(400).astype(np.float32)
    np.testing.assert_array_equal(
        mu_law_encode_np(np.tanh(x), 256),
        np.asarray(mu_law_encode(jnp.asarray(np.tanh(x)), 256)))
    q = rng_np.integers(0, 256, 100)
    np.testing.assert_allclose(
        mu_law_decode_np(q, 256),
        np.asarray(mu_law_decode(jnp.asarray(q), 256)), rtol=1e-6)
    np.testing.assert_allclose(
        normalize_audio_np(x),
        np.asarray(normalize_audio(jnp.asarray(x))), rtol=1e-5,
        atol=1e-7)
    np.testing.assert_allclose(
        resample_np(x, 400, 160),
        np.asarray(resample(jnp.asarray(x), 400, 160)),
        rtol=1e-5, atol=1e-6)


def test_preprocess_audio_shapes(rng_np):
    stereo = rng_np.standard_normal((2, 3937)).astype(np.float32)
    codes = preprocess_audio(stereo, 256, target_frames=1600)
    assert codes.shape == (1600,)
    assert codes.dtype == np.int32
    assert codes.min() >= 0 and codes.max() < 256


def test_preprocess_video_shapes(rng_np):
    video = rng_np.integers(0, 255, (33, 48, 56, 3)).astype(np.uint8)
    out = preprocess_video(video, num_frames=16, frame_hw=(64, 64))
    assert out.shape == (16, 64, 64, 1)
    assert out.dtype == np.float32
    assert out.max() <= 255.0 and out.min() >= 0.0


def test_uniform_temporal_subsample_semantics():
    x = np.arange(10)
    out = uniform_temporal_subsample(x, 4)
    # linspace(0, 9, 4) = [0, 3, 6, 9]
    np.testing.assert_array_equal(out, [0, 3, 6, 9])
    out = uniform_temporal_subsample(x, 20)  # oversample repeats
    assert out.shape == (20,)


# ------------------------------------------------------------------ load
def test_dataloader_batches(dataset_root):
    loader = get_dataloader(
        dataset_root, input_channels=64, batch_size=2, train=True,
        use_video=True, num_workers=2, shuffle=True, seed=1,
        max_audio_frames=1600, max_video_frames=16)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # 6 clips / batch 2
    for b in batches:
        assert b.codes.shape == (2, 1600) and b.codes.dtype == np.int32
        assert b.video.shape == (2, 16, 64, 64, 1)

    # epoch shuffling is deterministic per (seed, epoch)
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0].codes, again[0].codes)


def test_dataloader_audio_only_and_accumulation(dataset_root):
    loader = get_dataloader(
        dataset_root, input_channels=64, batch_size=2, train=True,
        use_video=False, num_workers=1, accumulation_steps=3,
        shuffle=False, max_audio_frames=800, max_video_frames=16)
    batches = list(loader.epoch(0))
    assert len(batches) == 1  # 6 clips = 1 x (A=3, B=2)
    assert batches[0].codes.shape == (3, 2, 800)
    assert batches[0].video is None


def test_dataloader_synchronized_crop(dataset_root):
    loader = get_dataloader(
        dataset_root, input_channels=64, batch_size=2, train=True,
        use_video=True, num_workers=1, batch_subsample_frac=0.25,
        shuffle=False, max_audio_frames=1600, max_video_frames=16)
    b = next(iter(loader.epoch(0)))
    assert b.video.shape[1] == 4          # ceil(16 * 0.25)
    assert b.codes.shape[1] == 400        # 4 * (1600/16)


def test_dataloader_reference_crop(dataset_root):
    loader = get_dataloader(
        dataset_root, input_channels=64, batch_size=2, train=True,
        use_video=True, num_workers=1, batch_subsample_frac=0.5,
        synchronized_crop=False, shuffle=False,
        max_audio_frames=1600, max_video_frames=16)
    b = next(iter(loader.epoch(0)))
    assert b.codes.shape[1] == 800        # ceil(1600 * 0.5)
    assert b.video.shape[1] == 8          # ceil(16 * 0.5), independent


def test_dataloader_skips_unreadable(dataset_root, tmp_path):
    # a corrupt clip is substituted, not a ragged batch
    import shutil
    root = tmp_path / "ds"
    shutil.copytree(dataset_root, root)
    bad = root / "train" / "salsa" / "clip_bad.npz"
    bad.write_bytes(b"not a zip")
    loader = get_dataloader(
        root, input_channels=64, batch_size=2, train=True,
        use_video=False, num_workers=1, shuffle=False,
        max_audio_frames=400, max_video_frames=16)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # 7 files, 1 bad -> 6 good -> 3 batches
    for b in batches:
        assert b.codes.shape == (2, 400)


# ---------------------------------------------------------------- curate
def test_curation_cli(dataset_root, tmp_path):
    import yaml

    meta = {
        "train": {"breakdancing": ["clip_000", "clip_001"]},
        "valid": {"salsa": ["clip_000"]},
    }
    meta_fp = tmp_path / "meta.yaml"
    meta_fp.write_text(yaml.safe_dump(meta))

    from movenet_tpu.data.curate import main
    out = tmp_path / "curated"
    main([str(dataset_root), str(out),
          "--curation-metadata-fp", str(meta_fp)])
    idx = kinetics_index(out, train=True)
    assert len(idx) == 2 and idx.contexts == ["breakdancing"]
    assert len(kinetics_index(out, train=False)) == 1


def test_loader_host_pack(dataset_root):
    """host_pack=True ships the (T, 3B) fused-kernel codes pack from
    the loader workers, bit-identical to the in-device pack."""
    import jax.numpy as jnp

    from movenet_tpu.data.pipeline import DataLoader
    from movenet_tpu.models.fused import _codes_pack

    idx = kinetics_index(dataset_root, train=True)
    loader = DataLoader(idx, input_channels=64, batch_size=2,
                        use_video=False, num_workers=2, shuffle=False,
                        max_audio_frames=4000, max_video_frames=16,
                        host_pack=True)
    batch = next(iter(loader.epoch(0)))
    assert batch.codes_pack is not None
    assert batch.codes_pack.shape == (4000, 6)
    want = np.asarray(_codes_pack(jnp.asarray(batch.codes),
                                  with_targets=True))
    np.testing.assert_array_equal(np.asarray(batch.codes_pack), want)
