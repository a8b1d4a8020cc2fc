"""Fingerprinted processed-array disk cache.

Same semantics as the reference (data_loader.py:19-49): a cache is valid
when its sidecar JSON matches the source file (size, mtime) and processing
parameters; any read or write problem silently falls back to the regular
path, so a broken cache can only cost time, never correctness. Bump
CACHE_VERSION when processing changes.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

CACHE_VERSION = 1


def fingerprint(filepath: str, **params) -> dict:
    return {
        "version": CACHE_VERSION,
        "source_size": os.path.getsize(filepath),
        "source_mtime": int(os.path.getmtime(filepath)),
        **params,
    }


def load(cache_base: str, fp: dict) -> tuple[Optional[np.ndarray], dict]:
    try:
        with open(cache_base + ".json", "r", encoding="utf-8") as f:
            meta = json.load(f)
        if all(meta.get(k) == v for k, v in fp.items()):
            return np.load(cache_base + ".npy"), meta
    except Exception:
        pass
    return None, {}


def save(cache_base: str, array: np.ndarray, meta: dict) -> None:
    try:
        np.save(cache_base + ".npy", array)
        with open(cache_base + ".json", "w", encoding="utf-8") as f:
            json.dump(meta, f)
        print(f"  Cached to {cache_base}.npy for faster next start")
    except Exception as e:
        print(f"Warning: could not write cache {cache_base}.npy: {e}")
