"""Data-layer tests: shard binary format round-trip, cursor/resume
semantics, layout conversion, metadata, prefetcher."""

import numpy as np
import pytest

from resnet_tpu.data import (
    DevicePrefetcher,
    ShardCursor,
    ShardDataset,
    ShardIterator,
    SyntheticDataset,
    load_class_metadata,
    write_shard,
)


@pytest.fixture
def shard_dir(tmp_path, rng):
    """Two tiny shards of 8 images (4x4x3), NCHW on disk like
    build_training_shards.c:133-147."""
    d = str(tmp_path / "shards")
    for s in range(2):
        imgs = rng.normal(0, 1, (8, 3, 4, 4)).astype(np.float32)
        labels = (np.arange(8) + 10 * s).astype(np.int32)
        write_shard(d, s, imgs, labels)
    return d


def make_dataset(shard_dir):
    return ShardDataset(
        shard_dir, num_shards=2, shard_images=8, image_dim=4, channels=3,
        disk_layout="NCHW",
    )


def test_shard_roundtrip(shard_dir, rng):
    ds = make_dataset(shard_dir)
    imgs, labels = ds.open_shard(0)
    assert imgs.shape == (8, 3, 4, 4)
    assert labels.tolist() == list(range(8))


def test_iterator_cursor_and_epoch(shard_dir):
    ds = make_dataset(shard_dir)
    it = ShardIterator(ds, batch_size=4, layout="NHWC")
    assert it.batches_per_epoch == 4
    seen = [next(it)["labels"].tolist() for _ in range(5)]
    assert seen[0] == [0, 1, 2, 3]
    assert seen[1] == [4, 5, 6, 7]
    assert seen[2] == [10, 11, 12, 13]  # shard 1
    assert seen[3] == [14, 15, 16, 17]
    assert seen[4] == [0, 1, 2, 3]  # wrapped; epoch advanced
    assert it.cursor.epoch == 1


def test_iterator_layout_conversion(shard_dir):
    ds = make_dataset(shard_dir)
    nhwc = next(ShardIterator(ds, batch_size=4, layout="NHWC"))["images"]
    nchw = next(ShardIterator(ds, batch_size=4, layout="NCHW"))["images"]
    assert nhwc.shape == (4, 4, 4, 3)
    assert nchw.shape == (4, 3, 4, 4)
    np.testing.assert_array_equal(nhwc, nchw.transpose(0, 2, 3, 1))


def test_iterator_resume_from_cursor(shard_dir):
    """Restoring the cursor resumes the exact batch sequence
    (overwrite_trainer_hyperparams semantics, resnet.cu:2796-2813)."""
    ds = make_dataset(shard_dir)
    it = ShardIterator(ds, batch_size=4)
    next(it), next(it), next(it)
    saved = ShardCursor(it.cursor.shard, it.cursor.batch_in_shard, it.cursor.epoch)
    expected = next(it)["labels"].tolist()

    it2 = ShardIterator(make_dataset(shard_dir), batch_size=4, cursor=saved)
    assert next(it2)["labels"].tolist() == expected


def test_synthetic_dataset():
    ds = SyntheticDataset(4, image_dim=8, num_classes=10, layout="NHWC")
    b = next(ds)
    assert b["images"].shape == (4, 8, 8, 3)
    assert b["images"].dtype == np.float32
    assert b["labels"].shape == (4,)
    assert b["labels"].min() >= 0 and b["labels"].max() < 10


def test_prefetcher(shard_dir):
    ds = make_dataset(shard_dir)
    it = ShardIterator(ds, batch_size=4)
    pre = DevicePrefetcher(iter([next(it) for _ in range(3)]), depth=2)
    batches = list(pre)
    assert len(batches) == 3
    assert batches[0]["labels"].tolist() == [0, 1, 2, 3]


def test_class_metadata(tmp_path):
    d = tmp_path
    (d / "id_to_label_mapping.txt").write_text("cat\ndog\n")
    (d / "id_to_synset_mapping.txt").write_text("n123\nn456\n")
    (d / "id_to_img_count_mapping.txt").write_text("100\n200\n")
    meta = load_class_metadata(str(d))
    assert meta.num_classes == 2
    assert meta.total_images == 300
    assert meta.labels == ["cat", "dog"]


def test_random_flip(shard_dir):
    ds = make_dataset(shard_dir)
    plain = next(ShardIterator(ds, batch_size=8, layout="NHWC"))["images"]
    flipped = next(
        ShardIterator(ds, batch_size=8, layout="NHWC", random_flip=True, seed=7)
    )["images"]
    # every image is either identical or exactly mirrored
    n_flipped = 0
    for i in range(8):
        same = np.array_equal(flipped[i], plain[i])
        mirror = np.array_equal(flipped[i], plain[i][:, ::-1])
        assert same or mirror
        n_flipped += int(mirror and not same)
    assert 0 < n_flipped < 8  # ~Bernoulli(0.5) over 8 images


def test_jpeg_pipeline(tmp_path, rng):
    from PIL import Image

    from resnet_tpu.data import JpegDataset
    from resnet_tpu.data.jpeg import IMAGENET_MEANS, decode_and_augment

    root = tmp_path / "imgs"
    for cls in ("n01", "n02"):
        (root / cls).mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 256, (40, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / cls / f"{i}.JPEG")

    ds = JpegDataset(str(root), batch_size=4, out_dim=16, train=True, seed=3)
    assert ds.classes == ["n01", "n02"]
    b = next(ds)
    assert b["images"].shape == (4, 16, 16, 3)
    assert b["images"].dtype == np.float32
    assert set(b["labels"].tolist()) <= {0, 1}
    # mean-subtracted: values roughly centered
    assert -200 < b["images"].mean() < 100

    # eval path: deterministic center crop
    ev = JpegDataset(str(root), batch_size=2, out_dim=16, train=False)
    a1 = next(ev)["images"]
    ev2 = JpegDataset(str(root), batch_size=2, out_dim=16, train=False)
    a2 = next(ev2)["images"]
    np.testing.assert_array_equal(a1, a2)


def test_prefetcher_stop(shard_dir):
    """stop() joins the worker cleanly even when it's blocked on a full
    queue (a daemon thread mid-device_put at exit aborts the process)."""
    ds = make_dataset(shard_dir)
    it = ShardIterator(ds, batch_size=4)  # infinite (wraps epochs)
    pre = DevicePrefetcher(it, depth=2)
    next(pre)
    pre.stop()
    assert not pre._thread.is_alive()


def test_native_jpeg_decoder_matches_pil(tmp_path):
    """csrc/jpeg_decode.cc vs the PIL path: same crop-box RNG protocol,
    same geometry, resample differences bounded; flip is an exact mirror;
    non-JPEG files fall back to PIL in the worker."""
    import random

    import numpy as np
    from PIL import Image

    from resnet_tpu.data import _jpeg_worker as W
    from resnet_tpu.data import native_jpeg as N

    if not N.available():
        pytest.skip("libresnet_jpeg.so not built")

    # smooth content: the tolerance then checks crop-box GEOMETRY
    # alignment, not resample-kernel equality on noise
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    arr = np.stack([
        127 + 120 * np.sin(xx / 17.0),
        127 + 120 * np.sin(yy / 23.0),
        127 + 120 * np.sin((xx + yy) / 31.0),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    jpg = str(tmp_path / "a.jpg")
    Image.fromarray(arr).save(jpg, quality=92)

    for train in (True, False):
        nat = N.decode_and_augment_native(
            jpg, out_dim=96, train=train, rng=random.Random(3)
        )
        pil = W.decode_and_augment(
            jpg, out_dim=96, train=train, rng=random.Random(3),
            subtract_means=False, dtype=np.uint8,
        )
        assert nat.shape == pil.shape == (96, 96, 3)
        d = np.abs(nat.astype(np.int16) - pil.astype(np.int16))
        # different resample kernels (PIL area-adaptive vs box+bilinear):
        # bounded, not bitwise
        assert d.mean() < 8, (train, d.mean())

    # flip correctness: same box, flip toggled -> exact mirror. The box
    # draw consumes the same RNG stream; force flip by monkeypatching the
    # final coin via two seeds that share the box draw is fragile, so call
    # the C layer directly.
    import ctypes

    lib = N._load()
    data = open(jpg, "rb").read()
    a = np.empty((96, 96, 3), np.uint8)
    b = np.empty((96, 96, 3), np.uint8)
    for flip, buf in ((0, a), (1, b)):
        rc = lib.rtpu_decode_crop(
            data, len(data), 96, 10, 20, 200, 180, flip,
            buf.ctypes.data_as(ctypes.c_void_p),
        )
        assert rc == 0
    np.testing.assert_array_equal(a, b[:, ::-1])

    # worker fallback: PNG goes through PIL transparently
    png = str(tmp_path / "b.png")
    Image.fromarray(arr).save(png)
    out = W._decode_worker((png, 96, True, 5))
    assert out.shape == (96, 96, 3) and out.dtype == np.uint8

    # determinism: same seed -> same bytes
    x1 = N.decode_and_augment_native(jpg, out_dim=96, train=True,
                                     rng=random.Random(9))
    x2 = N.decode_and_augment_native(jpg, out_dim=96, train=True,
                                     rng=random.Random(9))
    np.testing.assert_array_equal(x1, x2)


def test_native_jpeg_corrupt_input_errors_cleanly(tmp_path):
    """Truncated/corrupt JPEGs must take the libjpeg longjmp error path
    (csrc error handler frees the decode buffers) and report failure —
    repeatedly, without crashing the worker process."""
    import random

    import numpy as np
    from PIL import Image

    from resnet_tpu.data import native_jpeg as N

    if not N.available():
        pytest.skip("libresnet_jpeg.so not built")

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (200, 300, 3), np.uint8)
    good = str(tmp_path / "good.jpg")
    Image.fromarray(arr).save(good, quality=90)
    data = open(good, "rb").read()

    # truncated mid-entropy-stream: libjpeg treats this as a WARNING
    # (pads the missing rows) — it must decode without crashing, not
    # error. Hard errors come from header corruption below.
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(data[: len(data) // 2])
    out = N.decode_and_augment_native(bad, out_dim=64, train=True,
                                      rng=random.Random(1))
    assert out.shape == (64, 64, 3)

    # garbage after a JPEG magic: jpeg_read_header calls error_exit ->
    # longjmp; hammer it through both the dims entry point and the
    # decode entry point (leak/crash regression for the error handler)
    import ctypes

    junk = str(tmp_path / "junk.jpg")
    junk_bytes = b"\xff\xd8\xff" + bytes(rng.integers(0, 255, 512))
    with open(junk, "wb") as f:
        f.write(junk_bytes)
    with pytest.raises(ValueError):
        N.decode_and_augment_native(junk, out_dim=64, train=True,
                                    rng=random.Random(1))
    lib = N._load()
    buf = np.empty((64, 64, 3), np.uint8)
    for _ in range(50):
        rc = lib.rtpu_decode_crop(
            junk_bytes, len(junk_bytes), 64, 0, 0, 100, 100, 0,
            buf.ctypes.data_as(ctypes.c_void_p),
        )
        assert rc != 0

    # decoder still healthy afterwards
    ok = N.decode_and_augment_native(good, out_dim=64, train=False,
                                     rng=random.Random(1))
    assert ok.shape == (64, 64, 3)
