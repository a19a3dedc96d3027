"""Port reference PyTorch checkpoints into the flax model.

Converts a torch ``state_dict`` of the reference `Net`
(Birds_Eye_View_Loss/Networks/LSQ_layer.py:231 /
Backprojection_Loss/Networks/LSQ_layer.py:210) — or of a bare ERFNet
(Networks/ERFNet.py:145) — into `{params, batch_stats}` variables for
`LaneNetModule`, so reference-trained checkpoints keep working here.

Layout conversions (all verified numerically in
tests/test_reference_parity.py::test_weight_port_full_net_forward):

- Conv2d weight (O, I, kH, kW)        -> flax kernel (kH, kW, I, O)
- ConvTranspose2d weight (I, O, kH, kW) -> SPATIAL FLIP then (kH, kW, I, O)
  (flax `nn.ConvTranspose` scatters the un-flipped kernel; torch scatters
  it directly, which is the flipped correlation)
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
- Linear weight (O, I) -> kernel (I, O)
- Linear after a FLATTEN: torch flattens NCHW (C-major), flax NHWC —
  the input dimension is permuted (C, H, W) -> (H, W, C)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor | ndarray -> float32 ndarray (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv(sd: Mapping, p: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{p}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{p}.bias"])}


def _convT(sd: Mapping, p: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{p}.weight"]).transpose(2, 3, 0, 1)  # (kH, kW, I, O)
    return {"kernel": np.ascontiguousarray(w[::-1, ::-1]),
            "bias": _np(sd[f"{p}.bias"])}


def _bn(sd: Mapping, p: str):
    params = {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}
    stats = {"mean": _np(sd[f"{p}.running_mean"]),
             "var": _np(sd[f"{p}.running_var"])}
    return params, stats


def _dense(sd: Mapping, p: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{p}.weight"]).T, "bias": _np(sd[f"{p}.bias"])}


def _dense_after_flatten(sd: Mapping, p: str, c: int, h: int,
                         w: int) -> Dict[str, np.ndarray]:
    """Linear whose input is a torch NCHW flatten of a (c, h, w) map."""
    wt = _np(sd[f"{p}.weight"])  # (O, c*h*w)
    out = wt.shape[0]
    wt = wt.reshape(out, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, out)
    return {"kernel": wt, "bias": _np(sd[f"{p}.bias"])}


def _nb1d(sd: Mapping, p: str):
    params: Dict = {}
    stats: Dict = {}
    for name in ("conv3x1_1", "conv1x3_1", "conv3x1_2", "conv1x3_2"):
        params[name] = _conv(sd, f"{p}.{name}")
    for name in ("bn1", "bn2"):
        params[name], stats[name] = _bn(sd, f"{p}.{name}")
    return params, stats


def _down(sd: Mapping, p: str):
    params = {"conv": _conv(sd, f"{p}.conv")}
    params["bn"], bn_stats = _bn(sd, f"{p}.bn")
    return params, {"bn": bn_stats}


def _up(sd: Mapping, p: str):
    params = {"conv": _convT(sd, f"{p}.conv")}
    params["bn"], bn_stats = _bn(sd, f"{p}.bn")
    return params, {"bn": bn_stats}


def _erfnet(sd: Mapping, prefix: str = ""):
    """Encoder + decoder subtree -> (params, batch_stats) under 'erfnet'."""
    g = lambda p: prefix + p  # noqa: E731
    enc_p: Dict = {}
    enc_s: Dict = {}
    enc_p["initial_block"], enc_s["initial_block"] = _down(
        sd, g("encoder.initial_block"))
    # encoder.layers: 0=down1, 1-5=nb64_*, 6=down2, 7-14=nb128_{j}_d{d}
    # (ERFNet.py:66-81)
    enc_p["down1"], enc_s["down1"] = _down(sd, g("encoder.layers.0"))
    for i in range(5):
        enc_p[f"nb64_{i}"], enc_s[f"nb64_{i}"] = _nb1d(
            sd, g(f"encoder.layers.{1 + i}"))
    enc_p["down2"], enc_s["down2"] = _down(sd, g("encoder.layers.6"))
    idx = 7
    for j in range(2):
        for d in (2, 4, 8, 16):
            key = f"nb128_{j}_d{d}"
            enc_p[key], enc_s[key] = _nb1d(sd, g(f"encoder.layers.{idx}"))
            idx += 1
    if g("encoder.output_conv.weight") in sd:
        enc_p["output_conv"] = _conv(sd, g("encoder.output_conv"))

    dec_p: Dict = {}
    dec_s: Dict = {}
    # decoder.layers: 0=up1, 1-2=nb64_*, 3=up2, 4-5=nb16_* (ERFNet.py:116-124)
    dec_p["up1"], dec_s["up1"] = _up(sd, g("decoder.layers.0"))
    dec_p["nb64_0"], dec_s["nb64_0"] = _nb1d(sd, g("decoder.layers.1"))
    dec_p["nb64_1"], dec_s["nb64_1"] = _nb1d(sd, g("decoder.layers.2"))
    dec_p["up2"], dec_s["up2"] = _up(sd, g("decoder.layers.3"))
    dec_p["nb16_0"], dec_s["nb16_0"] = _nb1d(sd, g("decoder.layers.4"))
    dec_p["nb16_1"], dec_s["nb16_1"] = _nb1d(sd, g("decoder.layers.5"))
    dec_p["output_conv"] = _convT(sd, g("decoder.output_conv"))
    if g("decoder.output_conv2.weight") in sd:
        dec_p["output_conv2"] = _convT(sd, g("decoder.output_conv2"))
    return ({"encoder": enc_p, "decoder": dec_p},
            {"encoder": enc_s, "decoder": dec_s})


def _classification(sd: Mapping, prefix: str, variant: str, resize: int):
    """Classification head subtree (LSQ_layer.py Classification)."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(1, 5):
        params[f"conv{i}"] = _conv(sd, f"{prefix}.conv{i}")
        params[f"conv{i}_bn"], stats[f"conv{i}_bn"] = _bn(
            sd, f"{prefix}.conv{i}_bn")
    rows, cols = resize // 8, 2 * resize // 8  # encoder feature plane
    if f"{prefix}.fully_connected1.weight" in sd:  # line head
        params["fc1"] = _dense_after_flatten(
            sd, f"{prefix}.fully_connected1", 64, rows // 2, cols // 2)
        if variant == "bev":
            for k in range(1, 5):
                params[f"fc_line{k}"] = _dense(
                    sd, f"{prefix}.fully_connected_line{k}")
        else:
            params["fc_line1"] = _dense(sd,
                                        f"{prefix}.fully_connected_line1")
    else:  # horizon head
        params["fc_horizon"] = _dense_after_flatten(
            sd, f"{prefix}.fully_connected_horizon", 64, rows, 1)
    return params, stats


def port_torch_state_dict(state_dict: Mapping, *, profile: str = "bp",
                          resize: int = 256) -> Dict:
    """Reference torch state_dict -> flax `{params, batch_stats}`.

    Accepts either a full `Net` state_dict (keys `net.encoder...`,
    `line_classification...`) or a bare ERFNet one (keys `encoder...`).
    Tensors may be torch tensors or numpy arrays.
    """
    keys = list(state_dict.keys())
    full_net = any(k.startswith("net.") for k in keys)
    prefix = "net." if full_net else ""
    erf_p, erf_s = _erfnet(state_dict, prefix)
    params: Dict = {"erfnet": erf_p}
    stats: Dict = {"erfnet": erf_s}
    if any(k.startswith("line_classification") for k in keys):
        variant = "bev" if profile == "bev" else "bp"
        params["line_classification"], stats["line_classification"] = \
            _classification(state_dict, "line_classification", variant,
                            resize)
        params["horizon_estimation"], stats["horizon_estimation"] = \
            _classification(state_dict, "horizon_estimation", variant,
                            resize)
    return {"params": params, "batch_stats": stats}


def load_into_variables(variables: Dict, ported: Dict) -> Dict:
    """Overlay ported leaves onto freshly-initialized variables, checking
    shapes; leaves absent from the port (e.g. heads the checkpoint lacks)
    keep their initialization."""
    import jax

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"ported key {path + k} not in model")
            if isinstance(v, Mapping):
                out[k] = overlay(dst[k], v, path + k + "/")
            else:
                have = tuple(np.shape(dst[k]))
                want = tuple(np.shape(v))
                if have != want:
                    raise ValueError(
                        f"shape mismatch at {path + k}: model {have} "
                        f"vs checkpoint {want}")
                out[k] = jax.numpy.asarray(v, dst[k].dtype)
        return out

    return {col: (overlay(variables[col], ported[col])
                  if col in ported else variables[col])
            for col in variables}
