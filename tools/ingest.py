#!/usr/bin/env python
"""Offline ingest: raw videos -> fixed-shape training stores.

Replaces the reference's scattered acquisition/normalization scripts
(process_downloads.py, process_downloads_framerate.py, convert_framerate.py,
extract_audio.py, get_video_stats.py, save_memmap.py) AND its train-time
native decode path (video_utils_custom.py get_clip) with ONE run-once tool:

  for each video under --data_path:
    ffmpeg -> mono 16 kHz wav            (process_downloads.py:19 parity)
    ffmpeg -> fps-normalized grayscale frames at --framesize, rawvideo pipe
              -> uint8 frame shard .npy  (replaces per-clip libav decode)
  then: audio memmap + index             (save_memmap.py parity)

Steady-state training never touches ffmpeg — the input pipeline is pure array
slicing (SURVEY.md §7.1 L1/L2 design). Videos with no audio stream are moved
to a reject directory (extract_audio.py:15-19 parity).

A C++ libav ingest (native/ingest_native) implements the same contract; this
Python driver is the reference implementation and fallback.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REJECT_DIR = "rejected"
VIDEO_EXTS = (".mp4", ".mkv", ".webm", ".avi", ".mov")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_NATIVE_BIN = os.path.join(_NATIVE_DIR, "ingest_native")


def native_bin():
    """Path to the libav-linked ingest tool (native/ingest.cc), building it
    on demand; None when neither the binary nor a compiler is available."""
    if os.path.exists(_NATIVE_BIN):
        return _NATIVE_BIN
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "ingest_native"],
                       check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError):
        return None
    return _NATIVE_BIN if os.path.exists(_NATIVE_BIN) else None


def native_ingest_one(video: str, frames_npy: str, wav_out: str,
                      framesize: int, fps: int, sr: int) -> dict:
    """One video through the native decoder; returns its JSON metadata."""
    out = subprocess.run(
        [native_bin(), "ingest", video, frames_npy, wav_out,
         str(framesize), str(fps), str(sr)],
        capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip()[:200])
    return json.loads(out.stdout.strip().splitlines()[-1])


def ffprobe_info(path: str) -> dict:
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-print_format", "json",
         "-show_streams", path],
        capture_output=True, text=True, timeout=120,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip()[:200])
    info = json.loads(out.stdout)
    streams = {s["codec_type"]: s for s in info.get("streams", [])}
    return streams


def extract_audio(video: str, wav_out: str, sr: int) -> None:
    """16 kHz mono wav (process_downloads.py:19: -ac 1 -ar 16000)."""
    subprocess.run(
        ["ffmpeg", "-y", "-v", "error", "-i", video, "-vn",
         "-ac", "1", "-ar", str(sr), "-f", "wav", wav_out],
        check=True, timeout=600,
    )


def decode_frames(video: str, framesize: int, fps: int) -> np.ndarray:
    """fps-normalized grayscale frames [T, framesize, framesize] uint8 via a
    single rawvideo pipe (replaces per-clip torchvision/libav decode)."""
    cmd = [
        "ffmpeg", "-v", "error", "-i", video,
        "-vf", f"fps={fps},scale={framesize}:{framesize}",
        "-pix_fmt", "gray", "-f", "rawvideo", "-",
    ]
    raw = subprocess.run(cmd, capture_output=True, timeout=1800, check=True).stdout
    n = len(raw) // (framesize * framesize)
    return np.frombuffer(raw, np.uint8, count=n * framesize * framesize).reshape(
        n, framesize, framesize)


def ingest_tree(data_path: str, out_path: str, framesize: int, fps: int,
                sr: int) -> None:
    from maavss_tpu.data.audio_memmap import build_audio_memmap
    from maavss_tpu.data.frame_shards import write_frame_shard

    frames_dir = os.path.join(out_path, "frames")
    audio_dir = os.path.join(out_path, "audio")
    reject_dir = os.path.join(out_path, REJECT_DIR)
    os.makedirs(audio_dir, exist_ok=True)

    videos = []
    for root, _, files in os.walk(data_path):
        for f in sorted(files):
            if f.lower().endswith(VIDEO_EXTS):
                videos.append(os.path.join(root, f))
    print(f"ingesting {len(videos)} videos from {data_path}")

    use_native = native_bin() is not None
    print(f"decode backend: {'native libav (native/ingest_native)' if use_native else 'ffmpeg subprocess'}")

    wavs = []
    for v in videos:
        vid = os.path.splitext(os.path.basename(v))[0]
        try:
            wav = os.path.join(audio_dir, f"{vid}.wav")
            if use_native:
                import numpy as np

                tmp_npy = os.path.join(audio_dir, f".{vid}.frames.npy")
                meta = native_ingest_one(v, tmp_npy, wav, framesize, fps, sr)
                if not meta.get("has_audio") or meta.get("audio_samples", 0) == 0:
                    os.remove(tmp_npy)
                    os.remove(wav)
                    raise RuntimeError("no audio stream")
                frames = np.load(tmp_npy, mmap_mode="r")
                if len(frames) == 0:
                    raise RuntimeError("decoded 0 frames")
                write_frame_shard(frames_dir, vid, np.asarray(frames), fps, source=v)
                os.remove(tmp_npy)
            else:
                streams = ffprobe_info(v)
                if "audio" not in streams:  # quarantine (extract_audio.py:15-19)
                    raise RuntimeError("no audio stream")
                if not os.path.exists(wav):
                    extract_audio(v, wav, sr)
                frames = decode_frames(v, framesize, fps)
                if len(frames) == 0:
                    raise RuntimeError("decoded 0 frames")
                write_frame_shard(frames_dir, vid, frames, fps, source=v)
            wavs.append(wav)
            print(f"ok: {vid} ({len(frames)} frames)")
        except Exception as e:
            print(f"reject ({e}): {v}", file=sys.stderr)
            os.makedirs(reject_dir, exist_ok=True)
            try:
                shutil.copy2(v, reject_dir)
            except OSError:
                pass
    if wavs:
        build_audio_memmap(sorted(wavs), audio_dir, samplerate=sr)
        print(f"audio memmap: {len(wavs)} files")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True, help="raw video tree")
    p.add_argument("--out_path", default="data/processed")
    p.add_argument("--framesize", type=int, default=256)
    p.add_argument("--framerate", type=int, default=30)
    p.add_argument("--samplerate", type=int, default=16000)
    args = p.parse_args()
    if native_bin() is None and shutil.which("ffmpeg") is None:
        raise SystemExit("no decode backend: build native/ingest_native "
                         "(needs libav dev libs + g++) or install ffmpeg — "
                         "training itself needs neither")
    ingest_tree(args.data_path, args.out_path, args.framesize,
                args.framerate, args.samplerate)


if __name__ == "__main__":
    main()
