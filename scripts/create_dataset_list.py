#!/usr/bin/env python
"""Build a .txt file list for SimpleDataset
(reference `/root/reference/scripts/create_dataset_list.py`).

    python scripts/create_dataset_list.py --root /data/imagenet/val \
        --output val_list.txt [--exts JPEG jpg png]
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--exts", nargs="*", default=["JPEG", "jpg", "png"])
    args = p.parse_args()

    exts = tuple(f".{e.lstrip('.')}" for e in args.exts)
    count = 0
    with open(args.output, "a") as out:
        for dirpath, _, filenames in os.walk(args.root):
            for fname in sorted(filenames):
                if fname.endswith(exts):
                    out.write(os.path.join(dirpath, fname) + "\n")
                    count += 1
    print(f"wrote {count} paths to {args.output}")


if __name__ == "__main__":
    main()
