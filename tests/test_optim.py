"""Optimizer tests: reference Adam semantics (resnet.cu:605-662) checked
against a straight numpy transliteration, plus the non-finite guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.optim import adam_init, adam_update, make_schedule, sgd_init, sgd_update
from resnet_tpu.config import OptimizerConfig


def numpy_reference_adam(theta, g, m, v, t_mean_prod, t_var_prod,
                         lr, wd, b1, b2, eps):
    """Direct transliteration of updateMeans/updateVars/updateParams."""
    cur_mean_decay = t_mean_prod * b1
    cur_var_decay = t_var_prod * b2
    g_wd = g + wd * theta
    m = b1 * m + (1 - b1) * g_wd
    v = b2 * v + (1 - b2) * g_wd**2
    m_adj = m / (1 - cur_mean_decay)
    v_adj = v / (1 - cur_var_decay)
    theta = theta - (lr * (m_adj / (np.sqrt(v_adj) + eps)) + wd * theta)
    return theta, m, v, cur_mean_decay, cur_var_decay


def test_adam_matches_reference_semantics(rng):
    theta = rng.normal(size=(64,)).astype(np.float32)
    params = {"w": jnp.asarray(theta)}
    state = adam_init(params)
    lr, wd, b1, b2, eps = 1e-3, 1e-4, 0.9, 0.999, 1e-7

    np_theta, np_m, np_v = theta.copy(), np.zeros_like(theta), np.zeros_like(theta)
    mp, vp = 1.0, 1.0
    for step in range(5):
        g = rng.normal(size=(64,)).astype(np.float32)
        params, state = adam_update(
            {"w": jnp.asarray(g)}, state, params,
            learning_rate=lr, weight_decay=wd, beta1=b1, beta2=b2, eps=eps,
        )
        np_theta, np_m, np_v, mp, vp = numpy_reference_adam(
            np_theta, g, np_m, np_v, mp, vp, lr, wd, b1, b2, eps
        )
    # fp32 (jax) vs fp64 (numpy) accumulation: agree to ~1e-6
    np.testing.assert_allclose(np.asarray(params["w"]), np_theta, rtol=1e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.means["w"]), np_m, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.vars["w"]), np_v, rtol=1e-5, atol=1e-6)
    assert np.isclose(float(state.mean_decay_prod), mp)
    assert np.isclose(float(state.var_decay_prod), vp)


def test_adam_nonfinite_gradient_guard():
    """NaN/Inf gradient elements must leave m, v untouched (resnet.cu:610-636)
    and the param update then proceeds from the stale moments."""
    params = {"w": jnp.ones((4,), jnp.float32)}
    state = adam_init(params)
    # one clean step to get nonzero moments
    g0 = jnp.full((4,), 0.1, jnp.float32)
    params, state = adam_update({"w": g0}, state, params, learning_rate=1e-2)
    m_before = np.asarray(state.means["w"]).copy()
    v_before = np.asarray(state.vars["w"]).copy()
    g1 = jnp.asarray([0.1, jnp.nan, jnp.inf, -jnp.inf], jnp.float32)
    params2, state2 = adam_update({"w": g1}, state, params, learning_rate=1e-2)
    # guarded elements keep stale moments
    np.testing.assert_allclose(np.asarray(state2.means["w"])[1:], m_before[1:])
    np.testing.assert_allclose(np.asarray(state2.vars["w"])[1:], v_before[1:])
    # clean element moved
    assert np.asarray(state2.means["w"])[0] != m_before[0]
    # all params stay finite
    assert np.all(np.isfinite(np.asarray(params2["w"])))


def test_adam_param_rollback_on_nonfinite():
    """A param that would go non-finite is rolled back (resnet.cu:651-661)."""
    params = {"w": jnp.asarray([1.0, jnp.inf], jnp.float32)}
    state = adam_init(params)
    g = jnp.asarray([0.1, 0.1], jnp.float32)
    new_params, _ = adam_update({"w": g}, state, params, learning_rate=1e-2)
    w = np.asarray(new_params["w"])
    assert np.isfinite(w[0])
    assert np.isinf(w[1])  # rolled back to previous (inf) value, not NaN


def test_sgd_momentum():
    params = {"w": jnp.ones((8,), jnp.float32)}
    state = sgd_init(params)
    g = {"w": jnp.full((8,), 0.5, jnp.float32)}
    p1, state = sgd_update(g, state, params, learning_rate=0.1, momentum=0.9)
    p2, state = sgd_update(g, state, p1, learning_rate=0.1, momentum=0.9)
    # buf1 = 0.5 ; p1 = 1 - 0.05 ; buf2 = 0.95 ; p2 = p1 - 0.095
    np.testing.assert_allclose(np.asarray(p1["w"]), 0.95, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["w"]), 0.855, rtol=1e-6)


def test_schedules():
    const = make_schedule(OptimizerConfig(schedule="constant", learning_rate=1e-3))
    assert float(const(0)) == pytest.approx(1e-3)
    assert float(const(10_000)) == pytest.approx(1e-3)

    cos = make_schedule(OptimizerConfig(
        schedule="cosine", learning_rate=1.0, warmup_steps=10, total_steps=110
    ))
    assert float(cos(0)) == pytest.approx(0.0)
    assert float(cos(5)) == pytest.approx(0.5)
    assert float(cos(10)) == pytest.approx(1.0)
    assert float(cos(60)) == pytest.approx(0.5, abs=1e-6)
    assert float(cos(110)) == pytest.approx(0.0, abs=1e-6)

    step = make_schedule(OptimizerConfig(
        schedule="step", learning_rate=1.0, total_steps=100
    ))
    assert float(step(10)) == pytest.approx(1.0)
    assert float(step(35)) == pytest.approx(0.1)
    assert float(step(65)) == pytest.approx(0.01)
    assert float(step(85)) == pytest.approx(0.001)


def test_adam_inside_jit_with_schedule():
    sched = make_schedule(OptimizerConfig(
        schedule="cosine", learning_rate=1e-2, warmup_steps=2, total_steps=10
    ))
    params = {"w": jnp.ones((16,), jnp.float32)}
    state = adam_init(params)

    @jax.jit
    def step(params, state, g):
        lr = sched(state.step)
        return adam_update({"w": g}, state, params, learning_rate=lr)

    for _ in range(3):
        params, state = step(params, state, jnp.full((16,), 0.1, jnp.float32))
    assert int(state.step) == 3
    assert np.all(np.isfinite(np.asarray(params["w"])))


def test_wd_mask_exempts_bn_params(rng):
    """wd_mask='no_bn' must zero weight decay on gamma/beta but not convs."""
    import jax
    from resnet_tpu.config import DataConfig, OptimizerConfig, TrainConfig, tiny_model_config
    from resnet_tpu.train import init_train_state
    from resnet_tpu.train.step import _wd_mask_tree

    cfg = TrainConfig(
        model=tiny_model_config(),
        optimizer=OptimizerConfig(weight_decay=1e-2, wd_mask="no_bn"),
        data=DataConfig(batch_size=4),
    )
    state = init_train_state(cfg)
    mask = _wd_mask_tree(state.params, "no_bn")
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, leaf in flat:
        keys = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if "gamma" in keys or "beta" in keys:
            assert float(leaf) == 0.0, keys
        elif keys.endswith("/w"):
            assert float(leaf) == 1.0, keys

    # zero-grad step: with decay-masked params, gamma must NOT shrink
    g = jax.tree.map(jnp.zeros_like, state.params)
    new_p, _ = adam_update(
        g, adam_init(state.params), state.params,
        learning_rate=1e-2, weight_decay=1e-2,
        wd_mask=mask,
    )
    np.testing.assert_array_equal(
        np.asarray(new_p["init_bn"]["gamma"]),
        np.asarray(state.params["init_bn"]["gamma"]),
    )
    # conv weights DO shrink
    assert not np.allclose(
        np.asarray(new_p["init_conv"]["w"]), np.asarray(state.params["init_conv"]["w"])
    )


def test_label_smoothing():
    from resnet_tpu.ops import cross_entropy

    logits = jnp.asarray([[2.0, 0.0, -1.0]], jnp.float32)
    labels = jnp.asarray([0])
    plain = float(cross_entropy(logits, labels, reduction="mean"))
    smooth = float(cross_entropy(logits, labels, reduction="mean", label_smoothing=0.1))
    assert smooth > plain  # smoothing adds entropy against confident logits
    # a=1 -> pure uniform target
    uniform = float(cross_entropy(logits, labels, reduction="mean", label_smoothing=1.0))
    import numpy as _np
    logp = np.asarray(jax.nn.log_softmax(logits))[0]
    assert uniform == pytest.approx(float(-logp.mean()), rel=1e-5)
