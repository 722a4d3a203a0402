"""Fidelity checks against the reference's real data fixtures
(read-only at /root/reference): the three class-mapping files and the
32-sample labels.buffer batch fixture (SURVEY.md section 2.5)."""

import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


def test_class_metadata_loads():
    from resnet_tpu.data import load_class_metadata

    meta = load_class_metadata(REF)
    assert meta.num_classes == 1000
    # total ImageNet-1k train images (train_image_metadata.pkl)
    assert meta.total_images == 1_281_167
    assert all(s.startswith("n") for s in meta.synsets)


def test_labels_buffer_fixture():
    """The dumped 32-sample batch fixture (resnet.cu:1301-1311): int32
    class ids in [0, 1000)."""
    labels = np.fromfile(os.path.join(REF, "labels.buffer"), dtype=np.int32)
    assert labels.shape == (32,)
    assert labels.min() >= 0 and labels.max() < 1000


def test_reference_dims_match_config():
    """Our default ModelConfig reproduces the Dims constants the reference
    hard-codes in main (resnet.cu:3245-3258)."""
    from resnet_tpu.config import model_config

    m = model_config("resnet50")
    assert m.input_dim == 224
    assert m.init_kernel == 7 and m.init_filters == 64 and m.init_stride == 2
    assert m.maxpool_kernel == 3 and m.maxpool_stride == 2
    assert m.num_blocks == 16
    # spatial reductions at blocks 3/7/13 (IS_BLOCK_SPATIAL_REDUCTION)
    reductions = [i for i in range(16) if m.is_reduction_block(i)]
    assert reductions == [3, 7, 13]
    projections = [i for i in range(16) if m.is_projection_block(i)]
    assert projections == [0, 3, 7, 13]
    assert m.final_depth == 2048
    assert m.num_classes == 1000


def test_param_count_matches_registry():
    """The reference's flat registry has 16 + 9*n_blocks = 160 tensors
    (resnet.cu:819). Ours counts the same tensors: stem conv + stem BN(2)
    + FC + per-block [3 convs + 3 BN pairs] + per-projection [conv + BN
    pair]."""
    import jax

    from resnet_tpu.config import model_config
    from resnet_tpu.models import init_params
    from resnet_tpu.train.checkpoint import flat_registry

    m = model_config("resnet50")
    params = init_params(jax.random.PRNGKey(0), m)
    reg = flat_registry(params)
    # 16 blocks * 9 (3 conv w + 3 gamma + 3 beta) + 4 projections * 3
    # + stem (w, gamma, beta) + fc w = 144 + 12 + 3 + 1 = 160
    assert len(reg) == 160
