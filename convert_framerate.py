#!/usr/bin/env python
"""Normalize video framerates (standalone pass).

Entry-point parity with the reference's `convert_framerate.py` /
`process_downloads_framerate.py` (ffmpeg fps conversion in place, :22-30).
In this framework fps normalization happens inside the unified ingest
(tools/ingest.py decodes at the target fps directly); this wrapper runs just
that conversion for users who want re-encoded video files instead of shards.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

from tools.ingest import VIDEO_EXTS


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="data/raw")
    p.add_argument("--out_path", default=None,
                   help="default: <data_path>/video (reference layout)")
    p.add_argument("--framerate", type=int, default=30)
    args = p.parse_args()
    if shutil.which("ffmpeg") is None:
        raise SystemExit("ffmpeg not found on PATH")
    out_root = args.out_path or os.path.join(args.data_path, "video")
    for root, _, files in os.walk(args.data_path):
        if os.path.abspath(root).startswith(os.path.abspath(out_root)):
            continue
        for f in sorted(files):
            if not f.lower().endswith(VIDEO_EXTS):
                continue
            src = os.path.join(root, f)
            rel = os.path.relpath(root, args.data_path)
            out_dir = os.path.join(out_root, rel)
            os.makedirs(out_dir, exist_ok=True)
            dst = os.path.join(out_dir, f)
            if os.path.exists(dst):
                continue
            try:
                subprocess.run(
                    ["ffmpeg", "-y", "-v", "error", "-i", src,
                     "-vf", f"fps={args.framerate}", "-c:a", "copy", dst],
                    check=True, timeout=1800)
                print(f"converted: {dst}")
            except Exception as e:
                print(f"error on {src}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
