#!/usr/bin/env python
"""Print (and optionally plot) a random clip from the audio memmap cache.

Entry-point parity with the reference's `inspect_memmap.py` (:7-19): loads the
memmap + index and inspects one random file's samples.
"""

from __future__ import annotations

import argparse

import numpy as np

from maavss_tpu.data.audio_memmap import AudioMemmap


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, default="data/processed/audio")
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()
    am = AudioMemmap(args.data_path)
    i = int(np.random.default_rng().integers(0, len(am)))
    n = am.file_num_samples(i)
    clip = am.read(i, 0, min(n, 16000))
    print(f"file {i}: {am.paths[i]}  {n} samples  "
          f"rms {np.sqrt((clip**2).mean()):.4f}  peak {np.abs(clip).max():.4f}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(clip)
        plt.savefig("memmap_clip.png")
        print("saved memmap_clip.png")


if __name__ == "__main__":
    main()
