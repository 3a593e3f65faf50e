#!/usr/bin/env python
"""Download the MUSICES dataset (YouTube videos of musicians, 9 classes).

Entry-point parity with the reference's `download-musices.py`: iterates a
MUSICES manifest {class: [video_ids]}, downloads each id with yt-dlp (or
youtube-dl) into `<out>/<class>/`, skipping ids already present, with a
per-download timeout (:11-21,53-75).

The manifest is bundled at the repo root (`MUSICES.json`, carried verbatim
from the reference dataset — it is data, not code; classes: flute,
acoustic_guitar, accordion, xylophone, tuba, saxophone, cello, violin,
trumpet — 1438 ids total). Both the original `{"videos": {class: [ids]}}`
shape and a flat `{class: [ids]}` are accepted.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess


def downloader() -> str:
    for tool in ("yt-dlp", "youtube-dl"):
        if shutil.which(tool):
            return tool
    raise SystemExit("need yt-dlp or youtube-dl on PATH")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", default="MUSICES.json")
    p.add_argument("--out", default="data/raw")
    p.add_argument("--timeout", type=int, default=60)  # :71-75
    p.add_argument("--classes", nargs="*", default=None)
    args = p.parse_args()
    tool = downloader()
    with open(args.manifest) as f:
        manifest = json.load(f)
    manifest = manifest.get("videos", manifest)  # original nesting (MUSICES.json)
    for cls, ids in manifest.items():
        if args.classes and cls not in args.classes:
            continue
        out_dir = os.path.join(args.out, cls)
        os.makedirs(out_dir, exist_ok=True)
        have = {os.path.splitext(f)[0] for f in os.listdir(out_dir)}
        for vid in ids:
            if vid in have:  # filename dedup (:53-60)
                continue
            try:
                subprocess.run(
                    [tool, "-f", "mp4", "-o", os.path.join(out_dir, f"{vid}.%(ext)s"),
                     f"https://www.youtube.com/watch?v={vid}"],
                    timeout=args.timeout, check=False,
                )
            except subprocess.TimeoutExpired:
                print(f"timeout: {vid}")


if __name__ == "__main__":
    main()
