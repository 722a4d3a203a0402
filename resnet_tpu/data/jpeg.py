"""Host-side JPEG decode / augment pipeline.

The reference does all decode/crop work offline (organize_input.ipynb +
build_training_shards.c) and trains from pre-cropped float shards with no
train-time augmentation beyond the baked random crop. The BASELINE north
star (SURVEY.md section 7) additionally mandates an online host-side
JPEG pipeline: decode -> random-resized-crop -> random horizontal flip ->
BGR-free RGB -> per-channel mean subtraction, feeding the same batch dict
the shard loaders produce. Standard ImageNet recipe (Goyal et al. 2017)
augmentation, required to reach 76% top-1.

Decoding uses PIL on a true multiprocess pool (spawn context — decode is
GIL-bound work, threads do not scale it): workers ship uint8 crops back
(4x less IPC than float32) and the parent does the mean-subtract
vectorized. A thread pool remains available (``use_processes=False``) for
tests and small runs where process startup dominates. For the 24k img/s
8-chip target the shard path (pre-decoded floats, zero host decode cost)
remains the fast path; this pipeline is for training straight from a raw
ImageNet directory tree.
"""

from __future__ import annotations

import os
import random
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

IMAGENET_MEANS = (123.68, 116.78, 103.94)  # RGB (build_training_shards.c:115)


def list_imagefolder(root: str) -> Tuple[List[str], List[int], List[str]]:
    """Scan an ImageNet-style tree root/<synset>/<img>.JPEG.

    Returns (paths, labels, class_names) with classes sorted by synset."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    paths, labels = [], []
    for i, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".jpeg", ".jpg", ".png")):
                paths.append(os.path.join(cdir, f))
                labels.append(i)
    return paths, labels, classes


def decode_and_augment(
    path: str,
    *,
    out_dim: int = 224,
    train: bool = True,
    rng: Optional[random.Random] = None,
    flip: bool = True,
    subtract_means: bool = True,
    dtype=np.float32,
) -> np.ndarray:
    """One image -> (out_dim, out_dim, 3) NHWC (float32, or uint8 when
    subtract_means=False and dtype=np.uint8 — the IPC-lean worker form).

    Train: random-resized-crop (scale 0.08-1.0, ratio 3/4-4/3) + optional
    horizontal flip. Eval: resize-short-side-256 + center crop.
    """
    from PIL import Image

    rng = rng or random
    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        if train:
            area = w * h
            for _ in range(10):
                target = rng.uniform(0.08, 1.0) * area
                ratio = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
                cw = int(round(np.sqrt(target * ratio)))
                ch = int(round(np.sqrt(target / ratio)))
                if cw <= w and ch <= h:
                    x0 = rng.randint(0, w - cw)
                    y0 = rng.randint(0, h - ch)
                    im = im.resize(
                        (out_dim, out_dim), Image.BILINEAR,
                        box=(x0, y0, x0 + cw, y0 + ch),
                    )
                    break
            else:  # fallback: center crop
                s = min(w, h)
                x0, y0 = (w - s) // 2, (h - s) // 2
                im = im.resize((out_dim, out_dim), Image.BILINEAR,
                               box=(x0, y0, x0 + s, y0 + s))
            if flip and rng.random() < 0.5:
                im = im.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            scale = 256 / min(w, h)
            im = im.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
            w2, h2 = im.size
            x0, y0 = (w2 - out_dim) // 2, (h2 - out_dim) // 2
            im = im.crop((x0, y0, x0 + out_dim, y0 + out_dim))
        arr = np.asarray(im, dtype=dtype)
    if subtract_means:
        arr = arr.astype(np.float32) - np.asarray(IMAGENET_MEANS, np.float32)
    return arr


def _decode_worker(task) -> np.ndarray:
    """Pool worker: decode one image to a uint8 crop (mean-subtract happens
    vectorized in the parent — uint8 is 4x less pipe traffic)."""
    path, out_dim, train, seed = task
    return decode_and_augment(
        path, out_dim=out_dim, train=train, rng=random.Random(seed),
        subtract_means=False, dtype=np.uint8,
    )


class JpegDataset:
    """Batch iterator over an ImageFolder tree with multiprocess decoding."""

    def __init__(
        self,
        root: str,
        batch_size: int,
        *,
        out_dim: int = 224,
        train: bool = True,
        layout: str = "NHWC",
        seed: int = 1234,
        num_workers: int = 0,
        use_processes: bool = True,
        drop_remainder: bool = True,
    ):
        self.paths, self.labels, self.classes = list_imagefolder(root)
        if not self.paths:
            raise ValueError(f"no images under {root}")
        self.batch_size = batch_size
        self.out_dim = out_dim
        self.train = train
        self.layout = layout
        self.rng = random.Random(seed)
        self.epoch = 0
        self._order = list(range(len(self.paths)))
        if train:
            self.rng.shuffle(self._order)
        self._pos = 0
        workers = num_workers or min(32, (os.cpu_count() or 8))
        if use_processes:
            # spawn, not fork: the parent holds a live JAX runtime whose
            # internal threads make fork() unsafe. Workers import only
            # PIL/numpy at task time.
            import multiprocessing as mp

            self._pool = ProcessPoolExecutor(
                max_workers=workers, mp_context=mp.get_context("spawn")
            )
            self._chunk = max(1, batch_size // (4 * workers))
        else:
            self._pool = ThreadPoolExecutor(max_workers=workers)
            self._chunk = 1

    @property
    def batches_per_epoch(self) -> int:
        return len(self.paths) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        b = self.batch_size
        if self._pos + b > len(self._order):
            self._pos = 0
            self.epoch += 1
            if self.train:
                self.rng.shuffle(self._order)
        idx = self._order[self._pos : self._pos + b]
        self._pos += b
        tasks = [
            (self.paths[i], self.out_dim, self.train, self.rng.getrandbits(32))
            for i in idx
        ]
        crops = list(self._pool.map(_decode_worker, tasks, chunksize=self._chunk))
        # mean-subtract vectorized on the full batch (workers shipped uint8)
        images = np.stack(crops).astype(np.float32) - np.asarray(
            IMAGENET_MEANS, np.float32
        )
        if self.layout == "NCHW":
            images = np.ascontiguousarray(images.transpose(0, 3, 1, 2))
        labels = np.asarray([self.labels[i] for i in idx], np.int32)
        return {"images": images, "labels": labels}

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
