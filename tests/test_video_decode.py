"""ffmpeg-CLI decode backend: server-side scale+gray streaming path and
the original-resolution rgb24 path, exercised against stub ffmpeg/ffprobe
binaries (the CI image has no real ffmpeg; the stubs emit deterministic
rawvideo/PCM exactly as the CLI contract specifies)."""

import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest

FFPROBE_STUB = """#!{py}
import json, sys
print(json.dumps({{"streams": [
    {{"codec_type": "video", "width": 96, "height": 72,
      "avg_frame_rate": "10/1"}},
    {{"codec_type": "audio", "sample_rate": "8000", "channels": 2}},
]}}))
"""

FFMPEG_STUB = """#!{py}
import sys
import numpy as np

args = sys.argv[1:]
out = sys.stdout.buffer
if "f32le" in args:
    # 2-channel interleaved PCM, 100 samples/ch
    pcm = np.arange(200, dtype=np.float32) / 200.0
    out.write(pcm.tobytes())
elif "gray" in args:
    vf = args[args.index("-vf") + 1]
    assert vf.startswith("scale=64:64"), vf
    for i in range(5):
        out.write((np.full((64, 64), i, dtype=np.uint8)).tobytes())
elif "rgb24" in args:
    for i in range(5):
        out.write((np.full((72, 96, 3), i, dtype=np.uint8)).tobytes())
else:
    sys.exit(2)
"""


@pytest.fixture
def stub_bin(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in (("ffprobe", FFPROBE_STUB), ("ffmpeg", FFMPEG_STUB)):
        p = bindir / name
        p.write_text(body.format(py=sys.executable))
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return bindir


def test_scaled_gray_streaming_decode(stub_bin, tmp_path):
    from movenet_tpu.data.video import decode_media_file

    clip = decode_media_file(tmp_path / "clip.mp4")
    assert clip.video.shape == (5, 64, 64, 1)
    assert clip.video.dtype == np.uint8
    assert (clip.video[3] == 3).all()
    assert clip.info["video_fps"] == 10.0
    assert clip.info["video_orig_dim"] == 5
    # stereo PCM decoded to (channels, samples)
    assert clip.audio.shape == (2, 100)
    assert clip.info["audio_fps"] == 8000.0


def test_fullres_rgb_decode(stub_bin, tmp_path):
    from movenet_tpu.data.video import decode_media_file

    clip = decode_media_file(tmp_path / "clip.mp4", scale_hw=None)
    assert clip.video.shape == (5, 72, 96, 3)
    assert (clip.video[2] == 2).all()


def test_scaled_frames_flow_through_preprocess(stub_bin, tmp_path):
    from movenet_tpu.data.preprocess import preprocess_video
    from movenet_tpu.data.video import decode_media_file

    clip = decode_media_file(tmp_path / "clip.mp4")
    frames = preprocess_video(clip.video, num_frames=4, frame_hw=(64, 64))
    assert frames.shape == (4, 64, 64, 1)
    assert frames.dtype == np.float32
    # same-size resize is (numerically) the identity on the gray values
    assert frames.max() <= 4.0 and frames.min() >= 0.0


def test_decode_error_without_ffmpeg(tmp_path, monkeypatch):
    from movenet_tpu.data.video import decode_media_file

    monkeypatch.setenv("PATH", str(tmp_path / "empty"))
    with pytest.raises(RuntimeError, match="no ffmpeg"):
        decode_media_file(tmp_path / "clip.mp4")
