"""Pallas-kernel parity tests vs jnp references — the analogue of the
reference's in-binary GPU-vs-CPU harness (testMatMul resnet.cu:3033,
testConvolution resnet.cu:3109). Run in interpret mode on CPU; the same
kernels compile for TPU unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.kernels import (
    add_relu,
    batch_norm_act,
    bn_act_reference,
    fused_adam_flat,
    matmul,
)
from resnet_tpu.optim import adam_init, adam_update

I = True  # interpret mode


class TestMatmul:
    @pytest.mark.parametrize("shape", [(128, 128, 128), (256, 384, 128),
                                       (100, 130, 70), (8, 1000, 2048)])
    def test_forward(self, rng, shape):
        m, n, k = shape
        a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
        got = matmul(a, b, I)
        want = a @ b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)

    def test_grad(self, rng):
        a = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32))

        def f_pallas(a, b):
            return jnp.sum(matmul(a, b, I) ** 2)

        def f_ref(a, b):
            return jnp.sum((a @ b) ** 2)

        ga_p, gb_p = jax.grad(f_pallas, argnums=(0, 1))(a, b)
        ga_r, gb_r = jax.grad(f_ref, argnums=(0, 1))(a, b)
        np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_r), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), rtol=1e-4, atol=1e-3)


class TestBatchNormAct:
    @pytest.mark.parametrize("relu", [True, False])
    @pytest.mark.parametrize("shape", [(256, 64), (1000, 130), (64, 8)])
    def test_forward(self, rng, shape, relu):
        m, c = shape
        x = jnp.asarray(rng.normal(2.0, 3.0, size=(m, c)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(1.0, 0.1, size=(c,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(0.0, 0.1, size=(c,)).astype(np.float32))
        y, mean, var = batch_norm_act(x, gamma, beta, 1e-7, relu, I)
        y_r, mean_r, var_r = bn_act_reference(x, gamma, beta, 1e-7, relu)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_r), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_r), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_r), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("relu", [True, False])
    def test_backward(self, rng, relu):
        m, c = 512, 96
        x = jnp.asarray(rng.normal(1.0, 2.0, size=(m, c)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(1.0, 0.1, size=(c,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(0.0, 0.1, size=(c,)).astype(np.float32))

        def f_pallas(x, gamma, beta):
            y, _, _ = batch_norm_act(x, gamma, beta, 1e-7, relu, I)
            return jnp.sum(y * jnp.cos(y))  # nontrivial downstream

        def f_ref(x, gamma, beta):
            y, _, _ = bn_act_reference(x, gamma, beta, 1e-7, relu)
            return jnp.sum(y * jnp.cos(y))

        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, gamma, beta)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b, name in zip(gp, gr, ("dx", "dgamma", "dbeta")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3, err_msg=name
            )


class TestAddRelu:
    def test_forward_and_grad(self, rng):
        shape = (4, 7, 7, 130)
        a = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        got = add_relu(a, b, I)
        np.testing.assert_allclose(
            np.asarray(got), np.maximum(np.asarray(a) + np.asarray(b), 0), atol=1e-6
        )

        def f(a, b):
            return jnp.sum(add_relu(a, b, I) ** 2)

        def f_ref(a, b):
            return jnp.sum(jnp.maximum(a + b, 0) ** 2)

        ga, gb = jax.grad(f, argnums=(0, 1))(a, b)
        ga_r, gb_r = jax.grad(f_ref, argnums=(0, 1))(a, b)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_r), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r), rtol=1e-5, atol=1e-5)


class TestFusedAdam:
    def test_matches_optim_adam(self, rng):
        n = 1000
        p = rng.normal(size=(n,)).astype(np.float32)
        g = rng.normal(size=(n,)).astype(np.float32)
        g[3] = np.nan
        g[7] = np.inf
        m = rng.normal(0, 0.01, size=(n,)).astype(np.float32)
        v = np.abs(rng.normal(0, 0.01, size=(n,))).astype(np.float32)

        kw = dict(learning_rate=1e-3, weight_decay=1e-4, beta1=0.9,
                  beta2=0.999, eps=1e-7)
        # pytree path
        from resnet_tpu.optim.adam import GuardedAdamState
        state = GuardedAdamState(
            means={"w": jnp.asarray(m)}, vars={"w": jnp.asarray(v)},
            mean_decay_prod=jnp.float32(0.9), var_decay_prod=jnp.float32(0.99),
            step=jnp.int32(5),
        )
        ref_p, ref_state = adam_update(
            {"w": jnp.asarray(g)}, state, {"w": jnp.asarray(p)}, **kw
        )
        # fused kernel path (decay products advanced the same way)
        new_p, new_m, new_v = fused_adam_flat(
            jnp.asarray(p), jnp.asarray(g), jnp.asarray(m), jnp.asarray(v),
            cur_mean_decay=0.9 * 0.9, cur_var_decay=0.99 * 0.999,
            interpret=True, **kw,
        )
        np.testing.assert_allclose(np.asarray(new_p), np.asarray(ref_p["w"]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_m), np.asarray(ref_state.means["w"]), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(new_v), np.asarray(ref_state.vars["w"]), rtol=1e-5, atol=1e-7)


class TestPallasEngineEndToEnd:
    """ExecutionConfig(kernels='pallas') must match the XLA engine through
    the full model and train step (interpret mode on CPU)."""

    def _cfgs(self):
        from resnet_tpu.config import (
            DataConfig, ExecutionConfig, OptimizerConfig, TrainConfig,
            tiny_model_config,
        )
        common = dict(
            model=tiny_model_config(),
            optimizer=OptimizerConfig(learning_rate=1e-3),
            data=DataConfig(batch_size=8, synthetic=True),
        )
        xla = TrainConfig(execution=ExecutionConfig(kernels="xla"), **common)
        pallas = TrainConfig(
            execution=ExecutionConfig(kernels="pallas", pallas_interpret=True),
            **common,
        )
        return xla, pallas

    def test_forward_parity(self, rng):
        from resnet_tpu.models import forward, init_params

        xla, pallas = self._cfgs()
        params = init_params(jax.random.PRNGKey(0), xla.model)
        x = jnp.asarray(rng.normal(0, 50, (4, 16, 16, 3)).astype(np.float32))
        lx, ax = forward(params, x, xla.model, xla.execution)
        lp, ap = forward(params, x, pallas.model, pallas.execution)
        np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), rtol=1e-4, atol=1e-5)
        # bn stats match too
        mx = ax["bn_stats"]["init_bn"][0]
        mp = ap["bn_stats"]["init_bn"][0]
        np.testing.assert_allclose(np.asarray(mx), np.asarray(mp), rtol=1e-5, atol=1e-5)

    def test_train_step_parity(self, rng):
        """Loss + gradients match between engines. (Params after an Adam
        step are NOT compared: Adam's first step is ~ sign(g)*lr, which
        amplifies engine-epsilon on near-zero gradients to 2*lr.)"""
        from resnet_tpu.train import init_train_state, make_train_step
        from resnet_tpu.train.step import _loss_fn

        xla, pallas = self._cfgs()
        batch = {
            "images": jnp.asarray(rng.normal(0, 50, (8, 16, 16, 3)).astype(np.float32)),
            "labels": jnp.asarray(rng.integers(0, 8, (8,)).astype(np.int32)),
        }
        state = init_train_state(xla)
        gx = jax.grad(lambda p: _loss_fn(p, batch, state.bn_state, xla)[0])(state.params)
        gp = jax.grad(lambda p: _loss_fn(p, batch, state.bn_state, pallas)[0])(state.params)
        for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
            scale = max(1e-3, float(np.max(np.abs(np.asarray(a)))))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, rtol=1e-3, atol=2e-4
            )

        sx, mx = make_train_step(xla, donate=False)(init_train_state(xla), batch)
        sp, mp = make_train_step(pallas, donate=False)(init_train_state(pallas), batch)
        assert float(mx["loss"]) == pytest.approx(float(mp["loss"]), rel=1e-4)
        assert np.isfinite(float(mp["loss"]))

    def test_fused_adam_train_step(self, rng):
        from resnet_tpu.config import (
            DataConfig, ExecutionConfig, OptimizerConfig, TrainConfig,
            tiny_model_config,
        )
        from resnet_tpu.train import init_train_state, make_train_step

        common = dict(
            model=tiny_model_config(),
            execution=ExecutionConfig(pallas_interpret=True),
            data=DataConfig(batch_size=8, synthetic=True),
        )
        ref = TrainConfig(optimizer=OptimizerConfig(learning_rate=1e-3), **common)
        fused = TrainConfig(
            optimizer=OptimizerConfig(learning_rate=1e-3, fused=True), **common
        )
        batch = {
            "images": jnp.asarray(rng.normal(0, 50, (8, 16, 16, 3)).astype(np.float32)),
            "labels": jnp.asarray(rng.integers(0, 8, (8,)).astype(np.int32)),
        }
        sr, mr = make_train_step(ref, donate=False)(init_train_state(ref), batch)
        sf, mf = make_train_step(fused, donate=False)(init_train_state(fused), batch)
        assert float(mr["loss"]) == pytest.approx(float(mf["loss"]), rel=1e-5)
        for a, b in zip(jax.tree.leaves(sr.params), jax.tree.leaves(sf.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        assert float(sf.opt_state.mean_decay_prod) == pytest.approx(0.9)


class TestPallasConv:
    """Implicit-GEMM Pallas conv vs lax.conv with reference geometry
    (the analogue of testConvolution, resnet.cu:3109-3218)."""

    CASES = [
        # (h, cin, cout, k, stride)  — the shapes ResNet actually uses
        (16, 3, 8, 7, 2),    # stem (scaled down)
        (8, 8, 16, 1, 1),    # 1x1 reduce/expand
        (8, 16, 16, 3, 1),   # 3x3 spatial
        (8, 16, 16, 3, 2),   # 3x3 stride-2 spatial
        (8, 8, 32, 3, 2),    # 3x3/s2 projection
    ]

    @pytest.mark.parametrize("h,cin,cout,k,stride", CASES)
    def test_forward(self, rng, h, cin, cout, k, stride):
        from resnet_tpu.kernels.conv import conv2d_pallas
        from resnet_tpu.ops import conv2d

        x = jnp.asarray(rng.normal(size=(2, h, h, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1)
        got = conv2d_pallas(x, w, stride, None, True)
        want = conv2d(x, w, stride=stride, layout="NHWC")
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("h,cin,cout,k,stride", CASES)
    def test_backward(self, rng, h, cin, cout, k, stride):
        from resnet_tpu.kernels.conv import conv2d_pallas
        from resnet_tpu.ops import conv2d

        x = jnp.asarray(rng.normal(size=(2, h, h, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1)

        def f_pallas(x, w):
            return jnp.sum(conv2d_pallas(x, w, stride, None, True) ** 2)

        def f_ref(x, w):
            return jnp.sum(conv2d(x, w, stride=stride, layout="NHWC") ** 2)

        gx_p, gw_p = jax.grad(f_pallas, argnums=(0, 1))(x, w)
        gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-3, atol=1e-3)
