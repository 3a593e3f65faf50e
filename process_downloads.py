#!/usr/bin/env python
"""Re-encode raw downloads into training stores (audio + frame shards).

Entry-point parity with the reference's `process_downloads.py` (ffmpeg 16 kHz
wav extraction + 30 fps re-encode into processed/{audio,video}, :7-65) and
`process_downloads_framerate.py` / `convert_framerate.py`. One pass of the
unified ingest tool (tools/ingest.py) produces the equivalent stores directly
(frames shards instead of re-encoded mp4s — decode happens once, here).
"""

from __future__ import annotations

import argparse

from tools.ingest import ingest_tree


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="data/raw")
    p.add_argument("--out_path", default="data/processed")
    p.add_argument("--framesize", type=int, default=256)
    p.add_argument("--framerate", type=int, default=30)
    p.add_argument("--samplerate", type=int, default=16000)
    args = p.parse_args()
    ingest_tree(args.data_path, args.out_path, args.framesize, args.framerate,
                args.samplerate)


if __name__ == "__main__":
    main()
