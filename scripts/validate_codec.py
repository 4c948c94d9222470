"""One-time real-codec validation (round-3 VERDICT item 8).

The CI image has no ffmpeg, so `tests/test_video_decode.py` and
`tests/test_native_pipeline.py` pin the ffmpeg CLI *contract* with stub
binaries.  This script closes the remaining gap on a machine where real
ffmpeg exists (e.g. inside the image built from `Dockerfile`): it

  1. synthesizes a deterministic clip (moving gradient frames + a sine
     sweep) and encodes it to a real mp4 (mpeg4 + aac) with ffmpeg;
  2. decodes it through BOTH the Python path (`data/video.py` ffmpeg
     pipes -> `data/preprocess.py`) and the native C++ pipeline
     (`native/pipeline.cpp`) via the public DataLoader, and asserts the
     resulting (codes, video, labels) batches are bit-identical;
  3. round-trips a wav through `utils.samples.encode_mp3` and checks
     the mp3 decodes back to the right length.

Run: `make codec-validate` (documented in RESULTS.md).  Mirrors the
reference's decode path (reference dataset.py:162-183) which also rides
ffmpeg underneath torchvision.io.
"""

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_clip(fp: Path, seed: int, fps: int = 10, seconds: int = 2,
              hw: int = 128, sr: int = 8000) -> None:
    rng = np.random.default_rng(seed)
    phase = float(rng.uniform(0, 2 * np.pi))
    with tempfile.TemporaryDirectory() as td:
        raw_v = Path(td) / "v.raw"
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32) / hw
        frames = []
        for i in range(fps * seconds):
            f = 127 + 100 * np.sin(2 * np.pi * (xx + i / 7.0) + phase) \
                * np.cos(2 * np.pi * (yy - i / 11.0))
            frames.append(np.clip(f, 0, 255).astype(np.uint8))
        g = np.stack(frames)[..., None]
        raw_v.write_bytes(np.repeat(g, 3, axis=-1).tobytes())

        t = np.arange(sr * seconds, dtype=np.float32) / sr
        pcm = (0.5 * np.sin(2 * np.pi * (220 + 100 * t) * t + phase)
               ).astype(np.float32)
        raw_a = Path(td) / "a.raw"
        raw_a.write_bytes(pcm.tobytes())

        subprocess.run(
            ["ffmpeg", "-v", "error", "-y",
             "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-s", f"{hw}x{hw}", "-r", str(fps), "-i", str(raw_v),
             "-f", "f32le", "-ar", str(sr), "-ac", "1",
             "-i", str(raw_a),
             "-c:v", "mpeg4", "-q:v", "3", "-c:a", "aac",
             "-b:a", "96k", str(fp)],
            check=True)


def main() -> int:
    if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
        print("SKIP: no ffmpeg/ffprobe on PATH — run inside the Docker "
              "image (Dockerfile installs ffmpeg and builds the native "
              "library).")
        return 2

    from movenet_tpu.data.dataset import kinetics_index
    from movenet_tpu.data.pipeline import DataLoader
    from movenet_tpu.native.loader import pipeline_available

    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "data"
        for ci, cat in enumerate(("dance_a", "dance_b")):
            d = root / "train" / cat
            d.mkdir(parents=True)
            for i in range(2):
                make_clip(d / f"clip{i}.mp4", seed=100 * ci + i)

        index = kinetics_index(root, train=True)

        def load(native: str):
            loader = DataLoader(
                index, input_channels=64, batch_size=2, use_video=True,
                num_workers=2, shuffle=False, max_audio_frames=16_000,
                max_video_frames=16, native_pipeline=native)
            return list(loader.epoch(0))

        py_batches = load("off")
        assert len(py_batches) == 2, \
            f"expected 2 batches from 4 real mp4s, got {len(py_batches)}"
        print(f"python decode path: {len(py_batches)} batches, codes "
              f"{np.asarray(py_batches[0].codes).shape}, video "
              f"{np.asarray(py_batches[0].video).shape}")

        if pipeline_available():
            nat_batches = load("on")
            assert len(nat_batches) == len(py_batches)
            for pb, nb in zip(py_batches, nat_batches):
                np.testing.assert_array_equal(np.asarray(pb.codes),
                                              np.asarray(nb.codes))
                np.testing.assert_array_equal(np.asarray(pb.video),
                                              np.asarray(nb.video))
                np.testing.assert_array_equal(np.asarray(pb.labels),
                                              np.asarray(nb.labels))
            print("native pipeline.cpp batches: bit-identical to the "
                  "python path on real mpeg4/aac media")
        else:
            print("WARNING: native library not built "
                  "(python -m movenet_tpu.native.build); python path "
                  "validated, C++ pipeline not exercised.")

        # mp3 export (reference trainer.py:566-580 writes wav+mp3)
        from movenet_tpu.utils.samples import encode_mp3, write_wav

        wav = Path(td) / "sample.wav"
        audio = (0.3 * np.sin(np.arange(16_000) / 16_000.0
                              * 2 * np.pi * 440)).astype(np.float32)
        write_wav(wav, audio, 16_000)
        mp3 = encode_mp3(wav)
        assert mp3 is not None and mp3.exists() and \
            mp3.stat().st_size > 1_000, "mp3 export failed"
        dec = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", str(mp3), "-f", "f32le",
             "-"], capture_output=True, check=True).stdout
        n = len(np.frombuffer(dec, np.float32))
        assert abs(n - len(audio)) < 4_000, \
            f"mp3 round-trip length {n} vs {len(audio)}"
        print(f"mp3 export ok ({mp3.stat().st_size} bytes, "
              f"{n} samples decoded back)")

    print("PASS: real-codec validation")
    return 0


if __name__ == "__main__":
    sys.exit(main())
