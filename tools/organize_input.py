"""Offline input organization — the organize_input.ipynb equivalent.

The reference notebook (cells 0-14) parses the ILSVRC2012 devkit metadata,
builds the three class-mapping files, shuffles all 1,281,167 image ids, and
assigns them to 40 shards of 32,768 with random 0-31 crop offsets, emitting
per-shard CSVs `class,img_num,row_off,col_off` consumed by the shard
builder (csrc/build_shards.cc ~ build_training_shards.c).

This tool performs the shuffle/assignment/offset steps given a class->count
mapping (from id_to_img_count_mapping.txt or a directory scan), seeded for
reproducibility.

Usage:
  python tools/organize_input.py --counts id_to_img_count_mapping.txt \
      --out-dir partitions/ --num-shards 40 --shard-images 32768
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_partitions(
    counts,
    *,
    num_shards: int = 40,
    shard_images: int = 32768,
    src_dim: int = 256,
    crop_dim: int = 224,
    seed: int = 1234,
):
    """Returns a list of per-shard row arrays (class, img_num, row_off, col_off)."""
    rng = np.random.default_rng(seed)
    pairs = np.array(
        [(cls, i) for cls, n in enumerate(counts) for i in range(n)], dtype=np.int64
    )
    rng.shuffle(pairs)
    max_off = src_dim - crop_dim  # 32 for 256->224 (notebook cell 14: 0-31)
    offs = rng.integers(0, max_off, size=(len(pairs), 2))
    rows = np.concatenate([pairs, offs], axis=1)
    shards = []
    for s in range(num_shards):
        shards.append(rows[s * shard_images : (s + 1) * shard_images])
    return shards


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", required=True,
                    help="id_to_img_count_mapping.txt (one count per class)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--num-shards", type=int, default=40)
    ap.add_argument("--shard-images", type=int, default=32768)
    ap.add_argument("--src-dim", type=int, default=256)
    ap.add_argument("--crop-dim", type=int, default=224)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args(argv)

    with open(args.counts) as f:
        counts = [int(line.strip()) for line in f if line.strip()]
    shards = build_partitions(
        counts,
        num_shards=args.num_shards,
        shard_images=args.shard_images,
        src_dim=args.src_dim,
        crop_dim=args.crop_dim,
        seed=args.seed,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    for s, rows in enumerate(shards):
        with open(os.path.join(args.out_dir, f"{s:03d}.csv"), "w") as f:
            for cls, img, ro, co in rows:
                f.write(f"{cls},{img},{ro},{co}\n")
    total = sum(len(r) for r in shards)
    print(f"wrote {len(shards)} partition CSVs ({total} images) -> {args.out_dir}")


if __name__ == "__main__":
    main()
