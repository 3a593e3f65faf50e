#!/usr/bin/env python
"""Buffered copy of a video+audio dataset tree.

Entry-point parity with the reference's `copy_dataset.py` (:16-51,
Colab/Drive -> local staging).
"""

from __future__ import annotations

import argparse
import os
import shutil


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--exts", nargs="*", default=[".mp4", ".wav", ".npy", ".json"])
    args = p.parse_args()
    n = 0
    for root, _, files in os.walk(args.src):
        rel = os.path.relpath(root, args.src)
        for f in files:
            if not any(f.lower().endswith(e) for e in args.exts):
                continue
            out_dir = os.path.join(args.dst, rel)
            os.makedirs(out_dir, exist_ok=True)
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(root, f), dst)
                n += 1
    print(f"copied {n} files to {args.dst}")


if __name__ == "__main__":
    main()
