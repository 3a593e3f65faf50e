#!/usr/bin/env python
"""Scan videos for fps/frame-count stats; list 30-fps-compatible files.

Entry-point parity with the reference's `get_video_stats.py` (:12-29, cv2
scan -> fps_info.npy + valid_clips.obj) using ffprobe; writes JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from tools.ingest import VIDEO_EXTS, ffprobe_info


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="data/raw")
    p.add_argument("--out", default="video_stats.json")
    p.add_argument("--framerate", type=int, default=30,
                   help="fps filter for the valid list (utilities.py:105-126)")
    args = p.parse_args()
    stats, valid = {}, []
    for root, _, files in os.walk(args.data_path):
        for f in sorted(files):
            if not f.lower().endswith(VIDEO_EXTS):
                continue
            v = os.path.join(root, f)
            try:
                s = ffprobe_info(v).get("video", {})
                num, den = (s.get("avg_frame_rate", "0/1").split("/") + ["1"])[:2]
                fps = float(num) / float(den) if float(den) else 0.0
                stats[v] = {"fps": fps, "frames": int(s.get("nb_frames", 0) or 0)}
                if round(fps) == args.framerate:
                    valid.append(v)
            except Exception as e:
                print(f"error on {v}: {e}", file=sys.stderr)
    with open(args.out, "w") as f:
        json.dump({"stats": stats, "valid": valid}, f, indent=1)
    print(f"{len(stats)} videos scanned, {len(valid)} at {args.framerate} fps "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
