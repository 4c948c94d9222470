"""Artifact-export parity: mp3 encode (ffmpeg CLI), W&B table with the
video column, and run-name warm-start resolution
(reference trainer.py:566-580, callbacks.py:82-99, trainer.py:709-728)."""

import types
from pathlib import Path

import numpy as np
import pytest

from movenet_tpu.utils import samples as S


FFMPEG_STUB = """#!/bin/sh
in=""; out=""
while [ $# -gt 0 ]; do
  case "$1" in
    -y) shift;;
    -i) in="$2"; shift 2;;
    -*) shift 2;;
    *) out="$1"; shift;;
  esac
done
cp "$in" "$out"
"""


@pytest.fixture
def stub_ffmpeg(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    ff = bindir / "ffmpeg"
    ff.write_text(FFMPEG_STUB)
    ff.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bindir}:" + str(Path("/usr/bin")))
    return ff


def _codes(b=2, t=400, channels=64):
    rng = np.random.default_rng(0)
    return rng.integers(0, channels, size=(b, t)).astype(np.int32)


def test_export_writes_mp3_when_ffmpeg_present(tmp_path, stub_ffmpeg):
    written = S.export_samples(
        tmp_path / "samples", epoch=0, split="val",
        codes={"original": _codes(), "generated": _codes()},
        input_channels=64, model_rate=2000)
    for kind in ("original", "generated"):
        assert len(written[kind]) == 2
        mp3s = written[f"{kind}_mp3"]
        assert len(mp3s) == 2
        for p in mp3s:
            assert p.suffix == ".mp3" and p.exists()
            assert p.stat().st_size > 0


def test_export_skips_mp3_without_ffmpeg(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path / "nothing-here"))
    S._warned_no_mp3 = False
    written = S.export_samples(
        tmp_path / "samples", epoch=0, split="val",
        codes={"original": _codes()}, input_channels=64, model_rate=2000)
    assert written["original"]
    assert "original_mp3" not in written
    assert not list((tmp_path / "samples").rglob("*.mp3"))


class _FakeMedia:
    def __init__(self, path):
        self.path = str(path)

    def __eq__(self, other):
        return type(other) is type(self) and other.path == self.path


class _FakeAudio(_FakeMedia):
    pass


class _FakeVideo(_FakeMedia):
    pass


class _FakeTable:
    def __init__(self, columns, data):
        self.columns, self.data = columns, data


def _fake_wandb_writer():
    from movenet_tpu.utils.observability import WandbWriter

    logged = {}

    class _Run:
        def log(self, d):
            logged.update(d)

    w = object.__new__(WandbWriter)
    w._wandb = types.SimpleNamespace(
        Audio=_FakeAudio, Video=_FakeVideo, Table=_FakeTable)
    w._run = _Run()
    return w, logged


def test_samples_table_includes_video_column(tmp_path):
    w, logged = _fake_wandb_writer()
    wavs = []
    for i in range(2):
        p = tmp_path / f"original_{i:02d}.wav"
        p.write_bytes(b"RIFF")
        wavs.append(p)
    mp4 = tmp_path / "clip.mp4"
    mp4.write_bytes(b"\x00")
    npz = tmp_path / "clip.npz"  # non-video source: column gets None
    npz.write_bytes(b"\x00")
    S.log_samples_table(
        w, "val", 3, {"original": wavs},
        filepaths=[mp4, npz], videos=[mp4, npz])
    table = logged["sample_output"]
    assert table.columns == ["split", "epoch", "idx", "fp", "video",
                             "original_audio"]
    assert table.data[0][4] == _FakeVideo(mp4)
    assert table.data[1][4] is None
    assert table.data[0][5] == _FakeAudio(wavs[0])


def test_samples_table_without_videos(tmp_path):
    w, logged = _fake_wandb_writer()
    p = tmp_path / "generated_00.wav"
    p.write_bytes(b"RIFF")
    S.log_samples_table(w, "val", 0, {"generated": [p]},
                        filepaths=["x.mp4"])
    assert "video" not in logged["sample_output"].columns


def test_resolve_run_dir(tmp_path):
    import jax.numpy as jnp
    from movenet_tpu.train.checkpoint import CheckpointManager
    from movenet_tpu.train.trainer import _resolve_run_dir

    runs = tmp_path / "runs"
    prev = runs / "exp_a"
    state = types.SimpleNamespace(
        params={"w": jnp.zeros(2)}, opt_state={"m": jnp.zeros(2)},
        step=jnp.asarray(0))
    mgr = CheckpointManager(prev, async_save=False)
    mgr.save(0, state)
    mgr.wait()
    mgr.close()

    out_dir = runs / "exp_b"
    assert _resolve_run_dir("exp_a", out_dir) == prev
    assert _resolve_run_dir(str(prev), out_dir) == prev
    with pytest.raises(FileNotFoundError, match="no run directory"):
        _resolve_run_dir("nope", out_dir)
    # a directory without checkpoints is not a run
    (runs / "empty").mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        _resolve_run_dir("empty", out_dir)
