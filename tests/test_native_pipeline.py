"""Native C++ decode->preprocess pipeline (native/pipeline.cpp) vs the
Python thread-pool path: identical batches from the same dataset tree.

Uses stub ffmpeg/ffprobe binaries (no real ffmpeg in the image); the
stubs emit deterministic rawvideo/PCM so both paths see the same
streams and the outputs must be bit-identical.
"""

import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest

from movenet_tpu.data.dataset import kinetics_index
from movenet_tpu.data.pipeline import DataLoader
from movenet_tpu.native.loader import pipeline_available

FFPROBE_STUB = """#!{py}
import json, sys
args = sys.argv[1:]
if "-show_entries" in args:     # the C++ pipeline's channels query
    print(2)
else:                           # the Python path's JSON probe
    print(json.dumps({{"streams": [
        {{"codec_type": "video", "width": 96, "height": 72,
          "avg_frame_rate": "10/1"}},
        {{"codec_type": "audio", "sample_rate": "8000",
          "channels": 2}},
    ]}}))
"""

FFMPEG_STUB = """#!{py}
import hashlib, sys
import numpy as np

args = sys.argv[1:]
fp = args[args.index("-i") + 1]
# per-file determinism so different clips differ
seed = int(hashlib.md5(fp.encode()).hexdigest()[:6], 16)
rng = np.random.default_rng(seed)
out = sys.stdout.buffer
if "f32le" in args:
    pcm = rng.standard_normal(2 * 100).astype(np.float32) * 0.3
    out.write(pcm.tobytes())
elif "gray" in args:
    for i in range(5):
        out.write(rng.integers(0, 255, (64, 64),
                               dtype=np.uint8).tobytes())
else:
    sys.exit(2)
"""


@pytest.fixture
def media_tree(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in (("ffprobe", FFPROBE_STUB),
                       ("ffmpeg", FFMPEG_STUB)):
        p = bindir / name
        p.write_text(body.format(py=sys.executable))
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    root = tmp_path / "data"
    for cat, names in (("dance_a", ["c0", "c1"]),
                       ("dance_b", ["c2", "c3"])):
        d = root / "train" / cat
        d.mkdir(parents=True)
        for n in names:
            (d / f"{n}.mp4").write_bytes(b"fake")
    return root


@pytest.mark.skipif(not pipeline_available(),
                    reason="native pipeline library not built")
def test_native_pipeline_matches_python_path(media_tree):
    index = kinetics_index(media_tree, train=True)

    def load(native):
        loader = DataLoader(
            index, input_channels=64, batch_size=2, use_video=True,
            num_workers=2, shuffle=False, max_audio_frames=1000,
            max_video_frames=4, native_pipeline=native)
        return list(loader.epoch(0))

    py_batches = load("off")
    nat_batches = load("on")
    assert len(py_batches) == len(nat_batches) == 2
    for pb, nb in zip(py_batches, nat_batches):
        np.testing.assert_array_equal(np.asarray(pb.codes),
                                      np.asarray(nb.codes))
        np.testing.assert_array_equal(np.asarray(pb.labels),
                                      np.asarray(nb.labels))
        np.testing.assert_array_equal(np.asarray(pb.video),
                                      np.asarray(nb.video))


@pytest.mark.skipif(not pipeline_available(),
                    reason="native pipeline library not built")
def test_native_pipeline_audio_only(media_tree):
    index = kinetics_index(media_tree, train=True)
    loader = DataLoader(
        index, input_channels=64, batch_size=2, use_video=False,
        num_workers=2, shuffle=False, max_audio_frames=1000,
        max_video_frames=4, native_pipeline="on")
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0].video is None
    assert batches[0].codes.shape == (2, 1000)


def test_native_pipeline_off_for_npz(tmp_path):
    """.npz trees must fall back to the Python path even on 'auto'."""
    from movenet_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path / "npz"
    make_synthetic_dataset(root, categories=["breakdancing"],
                           clips_per_category=2, splits=("train",),
                           duration_s=0.05, video_fps=40,
                           frame_hw=(32, 32))
    index = kinetics_index(root, train=True)
    loader = DataLoader(index, input_channels=64, batch_size=1,
                        use_video=True, num_workers=1, shuffle=False,
                        max_audio_frames=256, max_video_frames=2)
    assert not loader._native_pipe_usable()
    assert len(list(loader.epoch(0))) >= 1
