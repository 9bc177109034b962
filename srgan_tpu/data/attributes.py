"""CelebA attribute-file parsing and the label-folder store.

Capability mirror of notebook A cell 5: parses ``list_attr_celeba.txt``
(202,599 rows x 40 attrs) into 5,000-row string arrays (filename + 40 "+-1"
columns, dtype <U15) pickled as ``label_folder/000000_to_004999.pkl`` etc.
The 1-based column convention of ``dataset_label`` (column 0 = filename)
comes from this layout.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import List

import numpy as np

CHUNK = 5000


def parse_attr_file(attr_path: str) -> np.ndarray:
    """list_attr_celeba.txt -> (N, 41) <U15 array: [filename, 40 x "+-1"]."""
    with open(attr_path) as f:
        lines = f.read().splitlines()
    # line 0: count, line 1: attr names, rest: filename + 40 values
    rows = []
    for line in lines[2:]:
        parts = line.split()
        if len(parts) != 41:
            continue
        rows.append(parts)
    return np.asarray(rows, dtype="<U15")


def attr_names(attr_path: str) -> List[str]:
    with open(attr_path) as f:
        f.readline()
        return f.readline().split()


def build_label_folder(attr_path: str, out_dir: str) -> List[str]:
    """Write the reference's chunked pickle layout (notebook A cell 5)."""
    os.makedirs(out_dir, exist_ok=True)
    info = parse_attr_file(attr_path)
    paths = []
    for start in range(0, len(info), CHUNK):
        chunk = info[start:start + CHUNK]
        end = min(start + CHUNK, len(info)) - 1
        path = os.path.join(out_dir, f"{start:06d}_to_{end:06d}.pkl")
        with open(path, "wb") as f:
            pickle.dump(chunk, f)
        paths.append(path)
    return paths


def load_label_store(label_root: str) -> List[np.ndarray]:
    """Load every chunk pickle under ``label_root`` (the FaceDataset glob,
    dataset.py:89)."""
    chunks = []
    for path in sorted(glob.glob(os.path.join(label_root, "*"))):
        with open(path, "rb") as f:
            chunks.append(np.asarray(pickle.load(f)))
    return chunks
