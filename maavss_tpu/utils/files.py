"""Host-side file and cache utilities.

Parity with the reference's glob/pickle/json helpers (utilities.py:16-66,
:199-204, :419-423), reimplemented without torch.
"""

from __future__ import annotations

import glob
import json
import os
import pickle
from typing import Any, Iterable, List, Optional


def get_all_files(base_dir: str, ext: str) -> List[str]:
    """Recursive glob for `*.ext` under base_dir (reference: utilities.py:16-17).

    The reference pattern requires at least one intermediate directory; we keep
    its semantics but also match files directly under base_dir so synthetic
    fixture layouts work.
    """
    nested = glob.glob(f"{base_dir}/*/**/**.{ext}", recursive=True)
    flat = glob.glob(f"{base_dir}/*.{ext}")
    return sorted(set(nested) | set(flat))


def save_json(out_path: str, data: Any, indent: int = 3) -> None:
    with open(out_path, "w") as outfile:
        json.dump(data, outfile, sort_keys=False, indent=indent)


def load_json(path: str) -> Any:
    with open(path) as json_file:
        return json.load(json_file)


def save_cache_obj(path: str, obj: Any) -> None:
    """Pickle an object to disk (reference: utilities.py:47-49)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(obj, fh)


def load_cache_obj(path: str) -> Any:
    with open(path, "rb") as fh:
        return pickle.load(fh)


def latest_file(directory: str, ext: str) -> Optional[str]:
    """Newest `*.ext` in directory by ctime (reference: utilities.py:199-204).

    Used for `-c` auto-resume-latest checkpoint semantics.
    """
    all_files = glob.glob(f"{directory}/*.{ext}", recursive=True)
    if all_files:
        return max(all_files, key=os.path.getctime)
    return None


def verify_files(files: Iterable[str]) -> bool:
    """True iff every path exists (reference: utilities.py:419-423)."""
    return all(os.path.isfile(f) for f in files)
