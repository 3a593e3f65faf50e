#!/usr/bin/env python
"""fps/sr re-normalization of downloaded videos — named-entry parity shim.

The reference ships this as its own CLI (process_downloads_framerate.py:22-40:
per-video ffmpeg `-filter:v fps=<fr> -ar <sr>` re-encode of --dlpath into
--outpath). In this framework that function is absorbed by the run-once ingest
tool (tools/ingest.py decodes, fps-normalizes and writes frame shards + the
audio memmap in one pass; no ffmpeg binary exists in this image, the libav
C++ tool does the decoding). This shim preserves the reference's public flag
names and delegates to the ingest tree walk.
"""

from __future__ import annotations

import argparse

import shutil

from tools.ingest import ingest_tree, native_bin


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag surface (process_downloads_framerate.py:33-40)
    p.add_argument("--dlpath", type=str, default="./data/raw",
                   help="path to downloaded videos")
    p.add_argument("--outpath", type=str, default="./data/processed",
                   help="path to output saved files")
    p.add_argument("-sr", type=int, default=16000,
                   help="samplerate to convert to")
    p.add_argument("-fr", type=int, default=30, help="framerate to convert to")
    p.add_argument("--framesize", type=int, default=256,
                   help="decoded frame dims (ingest-store addition)")
    a = p.parse_args()
    if native_bin() is None and shutil.which("ffmpeg") is None:
        raise SystemExit("no decode backend: build native/ingest_native "
                         "(needs libav dev libs + g++) or install ffmpeg")
    ingest_tree(a.dlpath, a.outpath, a.framesize, a.fr, a.sr)


if __name__ == "__main__":
    main()
