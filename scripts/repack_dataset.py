#!/usr/bin/env python
"""Repack a Kinetics-style mp4 dataset tree into portable .npz clips.

    python scripts/repack_dataset.py SRC DST [--workers N]

Decodes each ``<src>/{split}/<category>/*.mp4`` with the available
backend (ffmpeg CLI) and writes the same tree under <dst> as .npz with raw
uint8 frames + float32 waveform + fps metadata.  After repacking, the
training pipeline needs no video codec at all — useful for TPU pods
where installing ffmpeg is undesirable, and the .npz decode path is
also ~an order of magnitude faster than re-decoding H.264 every epoch.
"""

import argparse
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def repack_one(src: Path, dst: Path) -> bool:
    from movenet_tpu.data.video import decode_media_file

    try:
        clip = decode_media_file(src)
    except Exception as e:
        print(f"skip {src}: {e}", file=sys.stderr)
        return False
    dst.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "audio_fps": np.float32(clip.info.get("audio_fps", 0)),
        "video_fps": np.float32(clip.info.get("video_fps", 0)),
    }
    if clip.audio is not None:
        payload["audio"] = np.asarray(clip.audio, np.float32)
    if clip.video is not None:
        payload["video"] = np.asarray(clip.video, np.uint8)
    np.savez_compressed(dst, **payload)
    return True


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", type=Path)
    ap.add_argument("dst", type=Path)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    jobs = []
    for fp in sorted(args.src.rglob("*")):
        if fp.suffix.lower() in (".mp4", ".mkv", ".webm", ".avi", ".mov"):
            rel = fp.relative_to(args.src)
            jobs.append((fp, (args.dst / rel).with_suffix(".npz")))
    print(f"repacking {len(jobs)} clips -> {args.dst}")
    with ThreadPoolExecutor(args.workers) as pool:
        ok = sum(pool.map(lambda j: repack_one(*j), jobs))
    print(f"done: {ok}/{len(jobs)} repacked")


if __name__ == "__main__":
    main()
