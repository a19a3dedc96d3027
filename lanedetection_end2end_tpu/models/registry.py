"""Backbone registry, mirroring `model_dict`/`define_model`
(Birds_Eye_View_Loss/Networks/__init__.py:9-20)."""

from __future__ import annotations

import jax.numpy as jnp

from lanedetection_end2end_tpu.models.erfnet import ERFNet


def _build_erfnet(layers=18, in_channels=3, out_channels=2, pretrained=False,
                  pool=True, dtype=jnp.float32):
    return ERFNet(in_channels=in_channels, out_channels=out_channels,
                  pretrained=pretrained, dtype=dtype)


MODEL_REGISTRY = {"erfnet": _build_erfnet}


def define_model(mod="erfnet", layers=18, in_channels=3, out_channels=2,
                 pretrained=False, pool=True, dtype=jnp.float32):
    if mod not in MODEL_REGISTRY:
        raise KeyError(f"unknown model '{mod}'; available: {list(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[mod](layers=layers, in_channels=in_channels,
                               out_channels=out_channels,
                               pretrained=pretrained, pool=pool, dtype=dtype)
