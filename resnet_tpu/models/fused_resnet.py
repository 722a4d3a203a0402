"""Fully-fused ResNet forward (ExecutionConfig.kernels='fused').

The HBM-roofline execution path: every activation tensor is written once by
the conv that produces it and read once by the op that consumes it. BN
statistics accumulate inside the producing conv's epilogue; BN affines are
applied inside the consuming conv's prologue (kernels/fused_conv.py). The
only standalone elementwise passes left are the stem's BN-apply before
maxpool (pooling cannot host a non-monotone prologue: gamma may be
negative) and the residual joins.

Semantically identical to models/resnet.py's train-mode forward — same
batch-stats BN, same centered-window geometry, same zero-pad handling —
verified by tests/test_fused_model.py. Train-mode, NHWC, bottleneck-only;
other configurations route through the standard path.

Mapping to the reference: this is the logical endpoint of the reference's
own fusion trajectory — doBatchNormAndActivate fused stats+affine+ReLU into
one kernel (resnet.cu:289); here the same math rides the convolutions so
the big tensors never make an extra HBM round-trip.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ExecutionConfig, ModelConfig
from ..kernels.fused import bias_act
from ..kernels.fused_conv import bn_affine_from_sums, fused_conv, fused_join
from ..ops import global_avg_pool, linear, max_pool


def _stats(sums, m):
    mean = sums[0] / m
    var = jnp.maximum(sums[1] / m - mean * mean, 0.0)
    return mean, var


# Per-shape sites where the Pallas fused conv replaces the XLA chain in
# the 'hybrid' engine — the TPU analogue of the reference's per-layer
# cudnnFind algo cache (resnet_cudnn_fast.cu:1275-1303). EMPTY by default:
# round-2 in-step measurement proved microbench winners do not survive the
# step (hybrid fwd 56.7ms vs xla 27.5ms — every in-step pallas_call site
# pays ms-scale layout-fixup cost, docs/perf_ceiling_r2.md), so a site only
# enters this set via an IN-STEP measurement: run
# tools/bench_hybrid_sites.py on the target chip, which enables one
# candidate site at a time inside the full jitted step and keeps only
# measured end-to-end winners; export its output via RESNET_TPU_FUSED_WINS.
# Keys: (hw, cin, cout, k, stride). Scope of any measured entry is the
# exact (chip, batch, dtype) it was measured at.
_FUSED_WINS: set = set()

# in-step-measured site table: RESNET_TPU_FUSED_WINS="56,64,256,1,1;..."
# (produced by tools/bench_hybrid_sites.py)
import os as _os

if _os.environ.get("RESNET_TPU_FUSED_WINS"):
    _FUSED_WINS = {
        tuple(int(v) for v in grp.split(","))
        for grp in _os.environ["RESNET_TPU_FUSED_WINS"].split(";")
        if grp
    }


def _conv_chain_xla(x, w, scale, shift, stride, prologue, relu, cap, prec):
    """XLA realization of the fused_conv contract with the closed-form
    backward (kernels/fused_conv.py::conv_chain_xla — autodiff through the
    sums->affine path costs an extra full pass over y per layer)."""
    from ..kernels.fused_conv import conv_chain_xla

    return conv_chain_xla(x, w, scale, shift, stride, prologue, relu, cap,
                          prec)


def _conv_site(x, w, scale, shift, stride, prologue, relu, interp, cap,
               ecfg: ExecutionConfig):
    """Per-layer engine dispatch: Pallas fused conv where measured faster,
    the XLA chain elsewhere (kernels='hybrid'); kernels='fused' forces the
    Pallas kernel everywhere (parity/testing); kernels='fusedxla' forces
    the XLA chain everywhere (the fused dataflow with zero custom calls —
    the diagnostic control for custom-call layout-fixup cost)."""
    if ecfg.kernels == "fusedxla":
        return _conv_chain_xla(
            x, w, scale, shift, stride, prologue, relu, cap,
            ecfg.matmul_precision,
        )
    if ecfg.kernels == "hybrid":
        key = (x.shape[1], x.shape[3], w.shape[3], w.shape[0], stride)
        if key not in _FUSED_WINS:
            return _conv_chain_xla(
                x, w, scale, shift, stride, prologue, relu, cap,
                ecfg.matmul_precision,
            )
    return fused_conv(x, w, scale, shift, stride, None, prologue, relu,
                      interp, cap)


def fused_forward(
    params,
    x: jax.Array,
    mcfg: ModelConfig,
    ecfg: ExecutionConfig,
) -> Tuple[jax.Array, Dict[str, Any]]:
    assert ecfg.layout == "NHWC", "fused path is NHWC-only"
    eps = mcfg.bn_eps
    interp = ecfg.resolve_interpret()
    cap = ecfg.relu_cap
    x = x.astype(ecfg.cdtype)
    ones = jnp.ones((1,), jnp.float32)
    zeros = jnp.zeros((1,), jnp.float32)
    stats: Dict[str, Any] = {}
    all_xla = ecfg.kernels == "fusedxla"

    def join(e, sc_e, sh_e, r, sc_r, sh_r, *_ignored):
        if all_xla:
            y = (
                e.astype(jnp.float32) * sc_e + sh_e
                + r.astype(jnp.float32) * sc_r + sh_r
            )
            y = jnp.maximum(y, 0.0)
            if cap is not None:
                y = jnp.minimum(y, cap)
            return y.astype(e.dtype)
        return fused_join(e, sc_e, sh_e, r, sc_r, sh_r, interp, cap)

    def affine(sums, bn, m):
        return bn_affine_from_sums(sums, bn["gamma"], bn["beta"], m, eps)

    # stem: XLA conv (cin=3 maps terribly onto the 128-lane dim — Mosaic
    # compile blows up, and the MXU K=3 contraction is the one conv XLA's
    # specialized small-channel path handles better anyway); stats via the
    # one-read Pallas moments kernel, affine+ReLU one standalone pass
    # (maxpool cannot host a non-monotone prologue), then pool
    from ..kernels.bn import moments
    from ..ops import conv2d

    y0 = conv2d(x, params["init_conv"]["w"], stride=mcfg.init_stride,
                layout="NHWC", precision=ecfg.matmul_precision)
    m0 = y0.shape[0] * y0.shape[1] * y0.shape[2]
    if all_xla:
        from ..ops.batchnorm import batch_moments

        mean0, var0 = batch_moments(y0, "NHWC")
    else:
        mean0, var0 = moments(y0.reshape(-1, y0.shape[-1]), interp)
    stats["init_bn"] = (mean0, var0)
    inv0 = jax.lax.rsqrt(var0 + jnp.float32(eps))
    sc0 = params["init_bn"]["gamma"].astype(jnp.float32) * inv0
    sh0 = params["init_bn"]["beta"].astype(jnp.float32) - sc0 * mean0
    if all_xla:
        a0 = jnp.maximum(y0.astype(jnp.float32) * sc0 + sh0, 0.0)
        if cap is not None:
            a0 = jnp.minimum(a0, cap)
        act0 = a0.astype(y0.dtype)
    else:
        act0 = bias_act(y0, sc0, sh0, True, interp, cap)
    out = max_pool(act0, kernel=mcfg.maxpool_kernel, stride=mcfg.maxpool_stride,
                   layout="NHWC", vjp=ecfg.maxpool_vjp)

    block_stats = []
    for i, bp in enumerate(params["blocks"]):
        stride = 2 if mcfg.is_reduction_block(i) else 1
        bstats: Dict[str, Any] = {}

        if not mcfg.bottleneck:
            # basic block (resnet18/34): conv1 -> BN+ReLU -> conv2 -> BN,
            # join with (projected) residual
            c1, sums_1 = _conv_site(out, bp["conv1"]["w"], ones, zeros,
                                    stride, False, False, interp, None, ecfg)
            m_1 = c1.shape[0] * c1.shape[1] * c1.shape[2]
            bstats["bn1"] = _stats(sums_1, m_1)
            sc_1, sh_1 = affine(sums_1, bp["bn1"], m_1)

            c2, sums_2 = _conv_site(c1, bp["conv2"]["w"], sc_1, sh_1,
                                    1, True, True, interp, cap, ecfg)
            m_2 = c2.shape[0] * c2.shape[1] * c2.shape[2]
            bstats["bn2"] = _stats(sums_2, m_2)
            sc_2, sh_2 = affine(sums_2, bp["bn2"], m_2)

            if "proj" in bp:
                p, sums_p = _conv_site(out, bp["proj"]["w"], ones, zeros,
                                       stride, False, False, interp, None, ecfg)
                m_p = p.shape[0] * p.shape[1] * p.shape[2]
                bstats["bn_proj"] = _stats(sums_p, m_p)
                sc_p, sh_p = affine(sums_p, bp["bn_proj"], m_p)
                out = join(c2, sc_2, sh_2, p, sc_p, sh_p, interp, cap)
            else:
                c = out.shape[-1]
                out = join(
                    c2, sc_2, sh_2, out,
                    jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
                    interp, cap,
                )
            block_stats.append(bstats)
            continue

        r, sums_r = _conv_site(out, bp["reduce"]["w"], ones, zeros,
                               1, False, False, interp, None, ecfg)
        m_r = r.shape[0] * r.shape[1] * r.shape[2]
        bstats["bn_reduce"] = _stats(sums_r, m_r)
        sc_r, sh_r = affine(sums_r, bp["bn_reduce"], m_r)

        s_, sums_s = _conv_site(r, bp["spatial"]["w"], sc_r, sh_r,
                                stride, True, True, interp, cap, ecfg)
        m_s = s_.shape[0] * s_.shape[1] * s_.shape[2]
        bstats["bn_spatial"] = _stats(sums_s, m_s)
        sc_s, sh_s = affine(sums_s, bp["bn_spatial"], m_s)

        e, sums_e = _conv_site(s_, bp["expand"]["w"], sc_s, sh_s,
                               1, True, True, interp, cap, ecfg)
        m_e = e.shape[0] * e.shape[1] * e.shape[2]
        bstats["bn_expand"] = _stats(sums_e, m_e)
        sc_e, sh_e = affine(sums_e, bp["bn_expand"], m_e)

        if "proj" in bp:
            p, sums_p = _conv_site(out, bp["proj"]["w"], ones, zeros,
                                   stride, False, False, interp, None, ecfg)
            m_p = p.shape[0] * p.shape[1] * p.shape[2]
            bstats["bn_proj"] = _stats(sums_p, m_p)
            sc_p, sh_p = affine(sums_p, bp["bn_proj"], m_p)
            out = join(e, sc_e, sh_e, p, sc_p, sh_p, interp, cap)
        else:
            c = out.shape[-1]
            out = join(
                e, sc_e, sh_e, out,
                jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
                interp, cap,
            )
        block_stats.append(bstats)
    stats["blocks"] = block_stats

    pooled = global_avg_pool(out, layout="NHWC")
    logits = linear(
        pooled, params["fc"]["w"], params["fc"].get("b"),
        precision=ecfg.matmul_precision,
    ).astype(jnp.float32)
    return logits, {"bn_stats": stats}
