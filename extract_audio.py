#!/usr/bin/env python
"""Extract paired wavs for every video; quarantine videos with no audio.

Entry-point parity with the reference's `extract_audio.py` (:11-19): the
audio-extraction + reject-folder subset of the ingest tool.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

from tools.ingest import REJECT_DIR, VIDEO_EXTS, extract_audio, ffprobe_info


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="data/raw")
    p.add_argument("--out_path", default="data/processed/audio")
    p.add_argument("--samplerate", type=int, default=16000)
    args = p.parse_args()
    os.makedirs(args.out_path, exist_ok=True)
    reject = os.path.join(os.path.dirname(args.out_path), REJECT_DIR)
    for root, _, files in os.walk(args.data_path):
        for f in sorted(files):
            if not f.lower().endswith(VIDEO_EXTS):
                continue
            v = os.path.join(root, f)
            vid = os.path.splitext(f)[0]
            try:
                if "audio" not in ffprobe_info(v):
                    os.makedirs(reject, exist_ok=True)
                    shutil.move(v, reject)  # extract_audio.py:15-19
                    print(f"no audio stream, moved to reject: {v}")
                    continue
                extract_audio(v, os.path.join(args.out_path, f"{vid}.wav"),
                              args.samplerate)
            except Exception as e:
                print(f"error on {v}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
