"""Fused inference engine: the serving-path forward pass.

Production twin of `LaneNet.apply(phase='e2e', train=False)`: identical math
on the same checkpoint variables, but every non_bottleneck_1d block runs as
the fused lane-packed Pallas kernel (ops/pallas_nb1d.py) with BatchNorm
statistics folded in, instead of XLA's layout-thrashing small-channel convs.
Downsampler/upsampler/head layers stay on XLA (they are a minority of the
time; candidates for later fusion).

Usage:
    engine = FusedLaneNetEngine(cfg)
    packed = engine.prepare(variables)      # once per checkpoint (host)
    beta, line, horizon = jax.jit(engine)(packed, variables, images)

Training keeps the differentiable flax graph — this engine is inference-only
(running BN statistics, no dropout), mirroring how the reference's test.py
path runs under torch.no_grad()+model.eval() (Backprojection_Loss/test.py:38).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.config import LaneConfig
from lanedetection_end2end_tpu.models.erfnet import (
    DownsamplerBlock, UpsamplerBlock)
from lanedetection_end2end_tpu.models.heads import Classification
from lanedetection_end2end_tpu.models.lanenet import LaneNet
from lanedetection_end2end_tpu.ops.activations import activation_fn
from lanedetection_end2end_tpu.ops.pallas_nb1d import (
    nb1d_chain, pack_nb1d, wino_hint)

# (name, dilation) of every NB1D block, per ERFNet.py:66-81 / :116-124
_ENC_NB64 = [(f"nb64_{i}", 1) for i in range(5)]
_ENC_NB128 = [(f"nb128_{j}_d{d}", d) for j in range(2) for d in (2, 4, 8, 16)]
_DEC_NB64 = [("nb64_0", 1), ("nb64_1", 1)]
_DEC_NB16 = [("nb16_0", 1), ("nb16_1", 1)]


class FusedLaneNetEngine:
    """mode='full': whole encoder / whole decoder as single Pallas kernels
    (models/fused_graph.py) — decoder activations never touch HBM.
    mode='blocks': per-stage NB1D chain kernels with XLA between (fallback,
    also the path for non-separable homographies)."""

    def __init__(self, cfg: LaneConfig, dtype: Any = jnp.bfloat16,
                 interpret: bool = False, mode: str = "full"):
        self.cfg = cfg
        self.dtype = dtype
        self.interpret = interpret
        # full fusion needs the separable WLS path + mask folded into rows
        self._lanenet = LaneNet(cfg, dtype=dtype)
        self.fitter = self._lanenet.fitter
        if mode == "full" and not self.fitter.separable:
            mode = "blocks"
        self.mode = mode
        self._mask = self._lanenet._mask
        self._act = activation_fn(cfg.activation_layer)
        self._enc_struct = self._dec_struct = None

    # ------------------------------------------------------------------
    def prepare(self, variables) -> Dict:
        """Fold BN stats + build lane-packed constants (host, once)."""
        if self.mode == "full":
            from lanedetection_end2end_tpu.models.fused_graph import (
                pack_decoder, pack_encoder)
            enc_arrays, self._enc_struct = pack_encoder(variables, self.cfg)
            dec_arrays, self._dec_struct = pack_decoder(variables, self.cfg,
                                                        self.fitter)
            return {"enc": enc_arrays, "dec": dec_arrays}
        v = jax.device_get(variables)
        enc_p = v["params"]["erfnet"]["encoder"]
        enc_s = v["batch_stats"]["erfnet"]["encoder"]
        dec_p = v["params"]["erfnet"]["decoder"]
        dec_s = v["batch_stats"]["erfnet"]["decoder"]
        packed = {}
        H = self.cfg.image_height
        for name, d in _ENC_NB64:
            packed["enc_" + name] = pack_nb1d(enc_p[name], enc_s[name], d,
                                              h_hint=wino_hint(H // 4))
        for name, d in _ENC_NB128:
            packed["enc_" + name] = pack_nb1d(enc_p[name], enc_s[name], d,
                                              h_hint=wino_hint(H // 8))
        for name, d in _DEC_NB64:
            packed["dec_" + name] = pack_nb1d(dec_p[name], dec_s[name], d,
                                              h_hint=wino_hint(H // 4))
        for name, d in _DEC_NB16:
            packed["dec_" + name] = pack_nb1d(dec_p[name], dec_s[name], d,
                                              h_hint=wino_hint(H // 2))
        # static ints must not cross jit boundaries as dict leaves
        for entry in packed.values():
            entry.pop("C", None)
            entry.pop("dilation", None)
        return packed

    # ------------------------------------------------------------------
    def _call_full(self, packed: Dict, variables, images):
        from lanedetection_end2end_tpu.models.fused_graph import (
            decoder_fused, encoder_fused)
        cfg = self.cfg
        enc = encoder_fused(images.astype(self.dtype), packed["enc"],
                            self._enc_struct, cfg, interpret=self.interpret)
        S = decoder_fused(enc, packed["dec"], self._dec_struct, cfg,
                          interpret=self.interpret)  # (B, H, 2C)
        C = cfg.nclasses if cfg.pretrained else cfg.seg_out_channels
        S0 = jnp.transpose(S[:, :, :C], (0, 2, 1))
        S1 = jnp.transpose(S[:, :, C:], (0, 2, 1))
        beta = self.fitter.beta_from_rowsums(S0, S1)
        line = horizon = None
        if cfg.clas:
            variant = "bev" if cfg.profile == "bev" else "bp"
            line = Classification("line", resize=cfg.resize, variant=variant,
                                  dtype=self.dtype).apply(
                self._sub(variables, "line_classification"), enc,
                train=False)
            horizon = Classification("horizon", resize=cfg.resize,
                                     variant=variant, dtype=self.dtype).apply(
                self._sub(variables, "horizon_estimation"), enc, train=False)
        return beta, line, horizon

    # ------------------------------------------------------------------
    def _sub(self, variables, *path):
        p = variables["params"]
        s = variables["batch_stats"]
        for k in path:
            p = p[k]
            s = s.get(k, {}) if isinstance(s, dict) else {}
        return {"params": p, "batch_stats": s}

    def sharded_call(self, mesh):
        """Jitted data-parallel serving step over a device mesh.

        Pallas kernels are not auto-partitioned by GSPMD, so the engine is
        wrapped in shard_map: batch split P('data'), constants/params
        replicated, every chip running the fused kernels on its shard.
        """
        from jax.sharding import PartitionSpec as P
        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:  # newer jax
            from jax import shard_map

        def fn(p, v, x):
            beta, line, hor = self(p, v, x)
            out = {"beta": beta}
            if self.cfg.clas:
                out["line"] = line
                out["horizon"] = hor
            return out

        out_specs = {"beta": P("data")}
        if self.cfg.clas:
            out_specs.update(line=P("data"), horizon=P("data"))
        mapped = shard_map(fn, mesh=mesh, in_specs=(P(), P(), P("data")),
                           out_specs=out_specs, check_rep=False)
        return jax.jit(mapped)

    def __call__(self, packed: Dict, variables, images) -> tuple:
        """images (B, H, W, 3) -> (beta, line_logits, horizon_logits)."""
        if self.mode == "full":
            return self._call_full(packed, variables, images)
        cfg = self.cfg
        x = images.astype(self.dtype)
        sub = lambda *path: self._sub(variables, "erfnet", *path)
        kw = dict(train=False)
        chain = lambda t, prefix, blocks: nb1d_chain(
            t, [packed[prefix + n] for n, _ in blocks],
            [d for _, d in blocks], interpret=self.interpret)

        x = DownsamplerBlock(16, dtype=self.dtype).apply(
            sub("encoder", "initial_block"), x, **kw)
        x = DownsamplerBlock(64, dtype=self.dtype).apply(
            sub("encoder", "down1"), x, **kw)
        x = chain(x, "enc_", _ENC_NB64)
        x = DownsamplerBlock(128, dtype=self.dtype).apply(
            sub("encoder", "down2"), x, **kw)
        x = chain(x, "enc_", _ENC_NB128)
        enc = x

        y = UpsamplerBlock(64, dtype=self.dtype).apply(
            sub("decoder", "up1"), enc, **kw)
        y = chain(y, "dec_", _DEC_NB64)
        y = UpsamplerBlock(16, dtype=self.dtype).apply(
            sub("decoder", "up2"), y, **kw)
        y = chain(y, "dec_", _DEC_NB16)
        # output head: flax ConvTranspose inside Decoder; apply directly
        import flax.linen as nn
        out_ch = cfg.nclasses if cfg.pretrained else cfg.seg_out_channels
        head = nn.ConvTranspose(out_ch, (2, 2), strides=(2, 2),
                                padding="VALID", dtype=self.dtype)
        dec = head.apply(
            {"params": variables["params"]["erfnet"]["decoder"]["output_conv"]},
            y)

        line = horizon = None
        if cfg.clas:
            variant = "bev" if cfg.profile == "bev" else "bp"
            line = Classification("line", resize=cfg.resize, variant=variant,
                                  dtype=self.dtype).apply(
                self._sub(variables, "line_classification"), enc, train=False)
            horizon = Classification("horizon", resize=cfg.resize,
                                     variant=variant, dtype=self.dtype).apply(
                self._sub(variables, "horizon_estimation"), enc, train=False)

        dec = dec.astype(jnp.float32)
        activated = self._act(dec)
        masked = activated * self._mask.astype(activated.dtype)
        beta = self.fitter(masked, layout="nhwc")
        return beta, line, horizon
