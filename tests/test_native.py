"""Native C++ data-layer tests: loader parity with the Python iterator,
cursor/resume, layout repack, and the shard-builder binary end-to-end."""

import os
import subprocess

import numpy as np
import pytest

from resnet_tpu.data import ShardCursor, ShardDataset, ShardIterator, write_shard
from resnet_tpu.data.native import NativeShardIterator, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader not built (make -C csrc)"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def shard_dir(tmp_path, rng):
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


def test_native_matches_python(shard_dir):
    ds = make_dataset(shard_dir)
    py = ShardIterator(ds, batch_size=4, layout="NHWC")
    nat = NativeShardIterator(ds, batch_size=4, layout="NHWC")
    for _ in range(5):  # crosses shard and epoch boundaries
        pb, nb = next(py), next(nat)
        np.testing.assert_array_equal(pb["labels"], nb["labels"])
        np.testing.assert_array_equal(pb["images"], nb["images"])
    nat.close()


def test_native_nchw_passthrough(shard_dir):
    ds = make_dataset(shard_dir)
    nat = NativeShardIterator(ds, batch_size=4, layout="NCHW")
    b = next(nat)
    assert b["images"].shape == (4, 3, 4, 4)
    imgs, _ = ds.open_shard(0)
    np.testing.assert_array_equal(b["images"], np.asarray(imgs[:4]))
    nat.close()


def test_native_resume_cursor(shard_dir):
    ds = make_dataset(shard_dir)
    nat = NativeShardIterator(ds, batch_size=4)
    next(nat), next(nat), next(nat)
    saved = ShardCursor(nat.cursor.shard, nat.cursor.batch_in_shard, nat.cursor.epoch)
    expected = next(nat)["labels"].tolist()
    nat.close()

    nat2 = NativeShardIterator(make_dataset(shard_dir), batch_size=4, cursor=saved)
    assert next(nat2)["labels"].tolist() == expected
    nat2.close()


def test_build_shards_binary(tmp_path, rng):
    """End-to-end: class blobs + partition CSVs -> shards, checked against
    a numpy re-implementation of the reference transform
    (build_training_shards.c:85-160)."""
    binary = os.path.join(REPO, "csrc", "build", "build_shards")
    blob_dir = tmp_path / "blobs"
    part_dir = tmp_path / "parts"
    out_dir = tmp_path / "out"
    for d in (blob_dir, part_dir, out_dir):
        d.mkdir()

    src_dim, dim, n_cls, imgs_per_cls = 8, 4, 3, 2
    blobs = {}
    for cls in range(n_cls):
        blob = rng.integers(0, 256, (imgs_per_cls, src_dim, src_dim, 3)).astype(np.uint8)
        blobs[cls] = blob
        blob.tofile(blob_dir / f"{cls}.images")

    rows = [(0, 0, 1, 2), (1, 1, 0, 0), (2, 0, 3, 3), (1, 0, 2, 1)]
    with open(part_dir / "000.csv", "w") as f:
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")

    subprocess.run(
        [binary, str(part_dir), str(blob_dir), str(out_dir), "1",
         "--dim", str(dim), "--src-dim", str(src_dim)],
        check=True, capture_output=True,
    )

    means = np.array([123.68, 116.78, 103.94], np.float32)
    images = np.fromfile(out_dir / "000.images", np.float32).reshape(
        len(rows), 3, dim, dim
    )
    labels = np.fromfile(out_dir / "000.labels", np.int32)
    assert labels.tolist() == [r[0] for r in rows]
    for i, (cls, img, ro, co) in enumerate(rows):
        crop = blobs[cls][img][ro:ro + dim, co:co + dim].astype(np.float32)
        expected = crop[..., ::-1] - means  # BGR->RGB then mean-subtract
        np.testing.assert_allclose(
            images[i], expected.transpose(2, 0, 1), atol=1e-5
        )


def test_cpp_unit_tests():
    """The native assert-based unit test binary (csrc/test_shard_loader.cc)."""
    r = subprocess.run(
        ["make", "-C", os.path.join(REPO, "csrc"), "test"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL OK" in r.stdout
