#!/usr/bin/env python
"""Build the flat float32 audio memmap cache from a directory of wavs.

Entry-point parity with the reference's `save_memmap.py`: concatenates every
file's mono audio into one `audio_memmap.memmap` plus a `[paths, [start,end]]`
index (save_memmap.py:22-46). Our index is JSON with a reference-format
pickle alongside (maavss_tpu/data/audio_memmap.py).

Usage: python save_memmap.py --data_path <dir with wavs (searched recursively)>
"""

from __future__ import annotations

import argparse
import os

from maavss_tpu.data.audio_memmap import build_audio_memmap
from maavss_tpu.utils.files import get_all_files


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, default="data/processed/audio")
    p.add_argument("--out_dir", type=str, default=None,
                   help="output dir (default: data_path)")
    p.add_argument("--samplerate", type=int, default=16000)
    args = p.parse_args()
    wavs = sorted(get_all_files(args.data_path, "wav"))
    if not wavs:
        raise SystemExit(f"no .wav files under {args.data_path}")
    out = args.out_dir or args.data_path
    mm, idx = build_audio_memmap(wavs, out, samplerate=args.samplerate)
    print(f"wrote {mm} ({os.path.getsize(mm)} bytes) and {idx} ({len(wavs)} files)")


if __name__ == "__main__":
    main()
