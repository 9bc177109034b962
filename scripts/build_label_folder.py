#!/usr/bin/env python
"""Build the CelebA label folder (reference notebook A cell 5).

Parses list_attr_celeba.txt into the 5,000-row chunked pickle layout the
reference's FaceDataset consumes.  (Our FaceDataset also reads the attr file
directly via --attr-file, so this exists for layout compatibility.)
"""

import argparse
import sys

try:  # installed via `pip install -e .`
    import srgan_tpu  # noqa: F401
except ImportError:  # running from a bare checkout
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.data import build_label_folder


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--attr-file", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    paths = build_label_folder(args.attr_file, args.out)
    print(f"wrote {len(paths)} chunks -> {args.out}")


if __name__ == "__main__":
    main()
