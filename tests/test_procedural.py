"""Procedural convergence-proxy dataset (data/procedural.py).

The dataset exists to exercise the full training recipe for thousands of
steps (SURVEY 7 / round-4 verdict item #7); these tests pin the contract
that makes its results meaningful: determinism, train/eval disjointness,
genuine 3-channel class structure, and the shard pixel scale.
"""

import numpy as np

from resnet_tpu.data.procedural import ProceduralDataset, ProceduralIterator


def test_deterministic_across_constructions():
    a = ProceduralDataset(num_classes=7, image_dim=16, seed=5)
    b = ProceduralDataset(num_classes=7, image_dim=16, seed=5)
    np.testing.assert_array_equal(a.protos, b.protos)
    ia = ProceduralIterator(a, 8, seed=3)
    ib = ProceduralIterator(b, 8, seed=3)
    ba, bb = next(ia), next(ib)
    np.testing.assert_array_equal(ba["labels"], bb["labels"])
    np.testing.assert_array_equal(ba["images"], bb["images"])


def test_train_eval_streams_disjoint():
    ds = ProceduralDataset(num_classes=7, image_dim=16, seed=5)
    tr = next(ProceduralIterator(ds, 64, seed=1))
    ev = next(ProceduralIterator(ds, 64, seed=1, evaluation=True))
    # different rng streams: neither labels nor instances line up
    assert not np.array_equal(tr["labels"], ev["labels"])
    assert not np.array_equal(tr["images"], ev["images"])


def test_color_mixing_is_three_channel():
    """Regression: an einsum bug once collapsed the 3x3 mixing matrix to
    its column sums — every channel was the SAME grayscale image times a
    scalar (|corr| == 1), and near-zero column sums silently attenuated
    whole classes below the noise floor."""
    ds = ProceduralDataset(num_classes=12, image_dim=32, seed=0)
    decorrelated = 0
    for c in range(ds.num_classes):
        ch = ds.protos[c].reshape(-1, 3).T  # (3, H*W)
        cc = np.corrcoef(ch)
        off = np.abs(cc[np.triu_indices(3, 1)])
        if np.all(off < 0.999):
            decorrelated += 1
    assert decorrelated >= ds.num_classes // 2, (
        f"only {decorrelated}/{ds.num_classes} classes have independent "
        "channel structure — color mixing degenerate"
    )
    # and no class is attenuated to (near) nothing
    stds = ds.protos.reshape(ds.num_classes, -1).std(axis=1)
    assert stds.min() > 5.0, f"attenuated class: min std {stds.min():.2f}"


def test_pixel_scale_matches_shards():
    # mean-subtracted ImageNet shard scale is roughly [-120, 120]
    ds = ProceduralDataset(num_classes=10, image_dim=32, seed=2)
    batch = next(ProceduralIterator(ds, 128, seed=4))
    assert batch["images"].dtype == np.float32
    s = batch["images"].std()
    assert 20.0 < s < 120.0, f"pixel std {s:.1f} out of shard-like range"


def test_augmentation_varies_instances():
    ds = ProceduralDataset(num_classes=3, image_dim=16, seed=5)
    it = ProceduralIterator(ds, 4, seed=9)
    b1, b2 = next(it), next(it)
    assert not np.array_equal(b1["images"], b2["images"])
