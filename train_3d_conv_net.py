#!/usr/bin/env python
"""Phasegram-AE training from a video-only dataset (older regime).

Entry-point parity with the reference's `train_3d_conv_net.py`
(Video_Dataset -> phasegram autoencoder). The reference script is partially
broken (undefined `y_attn_val` at :142); this implementation is the working
equivalent — functionally it is train_visual_net over Video_Dataset.
"""

from __future__ import annotations

from maavss_tpu.config import RunConfig, model_args
import train_visual_net


def train(config: RunConfig = None):
    return train_visual_net.train(config or model_args())


if __name__ == "__main__":
    train()
