"""ctypes binding for the native C++ batch loader (native/dataloader.cc).

`NativeAVLoader` is a drop-in producer of the same `{'audio', 'frames'}`
batches as `dataset.batches(AVDataset(...))`, with batch assembly (memmap
slicing, frame gathers, uint8->float conversion) running in C++ worker
threads behind a bounded prefetch ring — the native-runtime counterpart of
the dependencies the reference leaned on (SURVEY.md §2.4).

The shared library is built on demand (`make -C native`); if no compiler is
available, callers fall back to the Python pipeline (`native_available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional

import numpy as np

from maavss_tpu.data.audio_memmap import AudioMemmap
from maavss_tpu.data.dataset import AVDataset

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmaavss_dataloader.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError) as e:
        print(f"native loader build failed ({e}); using Python pipeline")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.c_char_p,                      # audio_path
        ctypes.POINTER(ctypes.c_char_p),      # shard_paths
        ctypes.c_int32,                       # n_shards
        ctypes.POINTER(ctypes.c_int64),       # clip_audio_start
        ctypes.POINTER(ctypes.c_int64),       # clip_audio_end
        ctypes.POINTER(ctypes.c_int32),       # clip_video
        ctypes.POINTER(ctypes.c_int64),       # clip_frames
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,  # n_clips, t_total, samples
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # batch, queue, threads
        ctypes.c_uint64,                      # seed
    ]
    lib.dl_next.restype = ctypes.c_int32
    lib.dl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_uint8)]
    lib.dl_frame_dims.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeAVLoader:
    """Infinite epoch-shuffled batch stream over an AVDataset's stores,
    assembled by the C++ runtime."""

    def __init__(self, dataset: AVDataset, batch_size: int, seed: int = 0,
                 queue: int = 2, threads: int = 2,
                 clip_indices: Optional[np.ndarray] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        audio: AudioMemmap = dataset.audio
        store = dataset.frames
        ids = (np.arange(len(dataset)) if clip_indices is None
               else np.asarray(clip_indices, np.int64))
        n = len(ids)
        t_total = dataset.clip_len
        self.samples = dataset.samples_per_frame * t_total
        self.batch = batch_size

        a_start = np.empty(n, np.int64)
        a_end = np.empty(n, np.int64)
        vid = np.empty(n, np.int32)
        fidx = np.empty((n, t_total), np.int64)
        sr = dataset.cfg.samplerate
        for row, i in enumerate(ids):
            # ids live in the dataset's (possibly --max_clip_len-filtered)
            # index VIEW; translate to raw clip-index space like __getitem__
            v, fi = dataset.index.clip_frame_indices(dataset._clip_id(int(i)))
            vid[row] = v
            fidx[row] = fi
            # same audio pairing + native-fps offset math as AVDataset
            fs, fe = audio.indexes[dataset._audio_of_video[v]]
            src_fps = store.fps(v) or dataset.cfg.framerate
            a_start[row] = fs + int(round(fi[0] * sr / src_fps))
            a_end[row] = fe
        shard_paths = [
            os.path.join(store.dir, f"{vid_}.npy").encode()
            for vid_ in store.video_ids
        ]
        arr = (ctypes.c_char_p * len(shard_paths))(*shard_paths)
        self._h = lib.dl_create(
            os.path.abspath(audio.map.filename).encode(), arr, len(shard_paths),
            a_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            a_end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            vid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.ascontiguousarray(fidx).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, t_total, self.samples, batch_size, queue, threads, seed,
        )
        if not self._h:
            raise RuntimeError("dl_create failed")
        h = ctypes.c_int64()
        w = ctypes.c_int64()
        lib.dl_frame_dims(self._h, ctypes.byref(h), ctypes.byref(w))
        self.frame_hw = (h.value, w.value)
        self.t_total = t_total

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        a = np.empty((self.batch, self.samples), np.float32)
        f = np.empty((self.batch, self.t_total) + self.frame_hw, np.uint8)
        rc = self._lib.dl_next(
            self._h,
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise StopIteration
        return {"audio": a, "frames": f}

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.dl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception as e:  # a wedged C++ worker would surface here
            # during interpreter shutdown the warnings machinery itself may be
            # torn down; the diagnostic must never raise from __del__
            try:
                import sys
                import warnings

                warnings.warn(f"native loader shutdown failed: {e!r}",
                              RuntimeWarning, stacklevel=1)
            except Exception:
                try:
                    if sys.stderr is not None:
                        sys.stderr.write(
                            f"native loader shutdown failed: {e!r}\n")
                except Exception:
                    pass
