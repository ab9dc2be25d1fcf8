"""Post-training int8 quantization for ConvBN-based detectors.

Converts a trained f32 variables tree into the int8 inference tree consumed
by ``ConvBN(quantized=True)``:
  * BatchNorm is folded into the conv: w' = w * gamma / sqrt(var + eps),
    b' = beta - mean * gamma / sqrt(var + eps)
  * folded weights quantize per-output-channel: kernel_q int8, wscale f32
  * activations quantize dynamically inside the layer (per-tensor max), so
    no calibration pass is needed.

Measured on v5e-1: isolated 128-channel int8 convs run ~1.5x the bf16 conv
throughput (~1.25x net of quantize/dequantize epilogues), BUT end-to-end
yolov5s-face@640 is SLOWER quantized (761 vs 2060 fps at batch 128): the
width-0.35 face detectors are dominated by <128-channel layers where int8
MXU packing cannot help while the per-layer dynamic activation quantization
adds a full extra pass over every activation tensor. Recommendation on v5e:
run these detectors in bf16; reserve int8 for wide-channel models or
static-scale (calibrated) deployments.
Accuracy: weights round to ~0.4% per-channel error; detection thresholds are
robust to it (test_quantize checks decoded-map agreement).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

BN_EPS = 1e-3  # ConvBN's BatchNorm epsilon


def _fold_convbn(conv_params: Dict, bn_params: Dict, bn_stats: Dict):
    """Fold BN affine+stats into conv weights; returns (w_folded, bias)."""
    w = np.asarray(conv_params["kernel"], np.float32)  # [kh,kw,in/g,out]
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    factor = gamma / np.sqrt(var + BN_EPS)             # [out]
    w_f = w * factor                                    # broadcast over out
    b_f = beta - mean * factor
    if "bias" in conv_params:
        b_f = b_f + np.asarray(conv_params["bias"], np.float32) * factor
    return w_f, b_f


def _quantize_weights(w_f: np.ndarray):
    """Per-output-channel symmetric int8: returns (kernel_q, wscale)."""
    amax = np.abs(w_f).reshape(-1, w_f.shape[-1]).max(axis=0)
    wscale = np.maximum(amax, 1e-12) / 127.0
    kernel_q = np.clip(np.round(w_f / wscale), -127, 127).astype(np.int8)
    return kernel_q, wscale.astype(np.float32)


def quantize_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Walk an f32 variables tree ({'params', 'batch_stats'}) and produce the
    quantized-params tree for the same architecture built with
    quantized=True. ConvBN subtrees ({'Conv_0', 'BatchNorm_0'}) become
    {'kernel_q', 'wscale', 'bias'}; everything else passes through."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: Any, s: Any) -> Any:
        if isinstance(p, dict):
            if "Conv_0" in p and "BatchNorm_0" in p and set(p) <= {
                "Conv_0", "BatchNorm_0"
            }:
                w_f, b_f = _fold_convbn(
                    p["Conv_0"], p["BatchNorm_0"],
                    (s or {}).get("BatchNorm_0", {"mean": 0.0, "var": 1.0}),
                )
                kernel_q, wscale = _quantize_weights(w_f)
                return {"kernel_q": kernel_q, "wscale": wscale, "bias": b_f}
            return {
                k: walk(v, (s or {}).get(k) if isinstance(s, dict) else None)
                for k, v in p.items()
            }
        return p

    return {"params": walk(params, stats)}


# ---------------------------------------------------------------------------
# static activation calibration
# ---------------------------------------------------------------------------

def calibrate_activation_scales(net, variables, batches) -> Dict[tuple, float]:
    """Per-ConvBN input absmax over calibration batches -> static int8
    activation scales (absmax / 127), keyed by module path.

    Runs the F32 net with a method interceptor — no quantized graph needed;
    the paths align with the quantized tree because quantization preserves
    module structure."""
    import flax.linen as nn
    import jax.numpy as jnp

    maxima: Dict[tuple, float] = {}

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        if type(m).__name__ == "ConvBN" and args and hasattr(args[0], "shape"):
            key = tuple(m.path)
            val = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            maxima[key] = max(maxima.get(key, 0.0), val)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        for b in batches:
            net.apply(variables, b)
    return {k: max(v, 1e-6) / 127.0 for k, v in maxima.items()}


def pour_activation_scales(qvariables: Dict[str, Any],
                           scales: Dict[tuple, float]) -> Dict[str, Any]:
    """Insert calibrated ``ascale`` leaves into a quantized params tree (for
    nets built with quantized="static"). Quantized ConvBN slots missing a
    calibration record keep scale 1.0 (and a warning would be deserved)."""
    def walk(p: Any, path: tuple) -> Any:
        if isinstance(p, dict):
            if "kernel_q" in p:
                s = scales.get(path, 1.0)
                return {**p, "ascale": np.float32(s)}
            return {k: walk(v, path + (k,)) for k, v in p.items()}
        return p

    return {"params": walk(qvariables["params"], ())}
