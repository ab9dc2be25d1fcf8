"""Weight conversion: torch checkpoints -> flax NHWC params.

The reference distributes weights as torch ``.pth`` state dicts (blazeface,
yolov5-face, mobile_facenet), caffemodels, TF graphs and OpenVINO IR. This
module maps the torch family into our flax trees so users of the reference
models can carry their weights over; it is also the test oracle that proves
our NHWC re-architectures are numerically identical to the reference graphs.

Conventions:
  torch conv weight [out, in/groups, kh, kw]  -> flax kernel [kh, kw, in/g, out]
  torch linear weight [out, in]               -> flax kernel [in, out]
  torch BN {weight,bias,running_mean,running_var} ->
      params {scale, bias} + batch_stats {mean, var}
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def t2f_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def t2f_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _np(t) -> np.ndarray:
    """torch tensor -> numpy without importing torch at module scope."""
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def conv_entry(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": t2f_conv(_np(sd[f"{prefix}.weight"]))}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def bn_entries(sd: Mapping, prefix: str):
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_blazeface(sd: Mapping, back_model: bool = False) -> Dict:
    """Map the reference BlazeFace state dict (blazeface.py:115-190) onto
    our ``BlazeFaceNet`` tree. Returns {"params": ...} (no BN in this net)."""
    params: Dict = {}

    def blaze_block(torch_prefix: str) -> Dict:
        return {
            "Conv_0": conv_entry(sd, f"{torch_prefix}.convs.0"),
            "Conv_1": conv_entry(sd, f"{torch_prefix}.convs.1"),
        }

    if back_model:
        params["conv0"] = conv_entry(sd, "backbone.0")
        for i in range(31):
            params[f"BlazeBlock_{i}"] = blaze_block(f"backbone.{i + 2}")
        params["FinalBlazeBlock_0"] = blaze_block("final")
    else:
        params["conv0"] = conv_entry(sd, "backbone1.0")
        for i in range(11):
            params[f"BlazeBlock_{i}"] = blaze_block(f"backbone1.{i + 2}")
        for i in range(5):
            params[f"BlazeBlock_{11 + i}"] = blaze_block(f"backbone2.{i}")
    for head in ("classifier_8", "classifier_16", "regressor_8", "regressor_16"):
        params[head] = conv_entry(sd, head)
    return {"params": params}


def convert_mobile_facenet(sd: Mapping) -> Dict:
    """Map the reference MobileFaceNet state dict
    (mobile_facenet.py:104-154) onto our ``MobileFaceNet`` tree."""

    def conv_block(tp: str):
        p, s = bn_entries(sd, f"{tp}.bn")
        return (
            {
                "Conv_0": conv_entry(sd, f"{tp}.conv", bias=False),
                "BatchNorm_0": p,
                "PReLU_0": {"alpha": _np(sd[f"{tp}.prelu.weight"])},
            },
            {"BatchNorm_0": s},
        )

    def linear_block(tp: str):
        p, s = bn_entries(sd, f"{tp}.bn")
        return (
            {"Conv_0": conv_entry(sd, f"{tp}.conv", bias=False), "BatchNorm_0": p},
            {"BatchNorm_0": s},
        )

    def depthwise(tp: str):
        c0p, c0s = conv_block(f"{tp}.conv")
        c1p, c1s = conv_block(f"{tp}.conv_dw")
        c2p, c2s = linear_block(f"{tp}.project")
        return (
            {"MFConvBlock_0": c0p, "MFConvBlock_1": c1p, "MFLinearBlock_0": c2p},
            {"MFConvBlock_0": c0s, "MFConvBlock_1": c1s, "MFLinearBlock_0": c2s},
        )

    params: Dict = {}
    stats: Dict = {}

    def put(name, pair):
        params[name], stats[name] = pair

    put("conv1", conv_block("conv1"))
    put("conv2_dw", conv_block("conv2_dw"))
    put("conv_23", depthwise("conv_23"))
    for blk, nb in (("conv_3", 4), ("conv_4", 6), ("conv_5", 2)):
        bp: Dict = {}
        bs: Dict = {}
        for i in range(nb):
            bp[f"MFDepthWise_{i}"], bs[f"MFDepthWise_{i}"] = depthwise(
                f"{blk}.model.{i}"
            )
        params[blk], stats[blk] = bp, bs
    put("conv_34", depthwise("conv_34"))
    put("conv_45", depthwise("conv_45"))
    put("conv_6_sep", conv_block("conv_6_sep"))
    put("conv_6_dw", linear_block("conv_6_dw"))
    params["linear"] = {"kernel": t2f_linear(_np(sd["linear.weight"]))}
    bn1p = {"scale": _np(sd["bn.weight"]), "bias": _np(sd["bn.bias"])}
    bn1s = {"mean": _np(sd["bn.running_mean"]), "var": _np(sd["bn.running_var"])}
    params["bn"], stats["bn"] = bn1p, bn1s
    return {"params": params, "batch_stats": stats}
