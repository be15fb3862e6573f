"""Reference-checkpoint importer: torch ``.pth`` state_dict -> flax params.

The reference ships checkpoints as ``{model: state_dict, global_step, epoch}``
(scripts/run_demo.py:123-125). This module maps those NCHW torch tensors onto
our channel-last param tree:

* Conv2d/3d weight  (O, I, *k)  -> (*k, I, O)
* ConvTransposeNd   (I, O, *k)  -> (*k, I, O)   (our ConvTranspose flips
  spatially at call time, so no flip here)
* Linear            (O, I)      -> (I, O)
* BatchNorm         weight/bias -> scale/bias; running stats -> batch_stats

The name map covers the trainable core (cost filtering, context net, GRU
update, upsampling heads) and the DINOv2/DPT backbone, whose vendored source
defines exact names. The EdgeNeXt trunk uses timm's naming, which cannot be
verified in this environment (no timm, no checkpoints) — those entries are
best-effort and flagged by ``report['uncertain']``.

Usage:
    sd = load_torch_state_dict("model_best_bp2.pth")
    variables, report = import_reference_checkpoint(sd, variables, cfg)
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


# -- tensor transforms -------------------------------------------------------


def conv_w(x):      # (O, I, *k) -> (*k, I, O)
    n = x.ndim - 2
    return np.transpose(x, tuple(range(2, 2 + n)) + (1, 0))


def deconv_w(x):    # (I, O, *k) -> (*k, I, O)
    n = x.ndim - 2
    return np.transpose(x, tuple(range(2, 2 + n)) + (0, 1))


def linear_w(x):
    return x.T


def ident(x):
    return x


class NameMap:
    """Accumulates (flax_path -> (torch_key, transform)) rules."""

    def __init__(self):
        self.rules: dict[str, tuple[str, Callable]] = {}
        self.uncertain: set[str] = set()

    def add(self, flax_path: str, torch_key: str, tf: Callable = ident,
            uncertain: bool = False):
        self.rules[flax_path] = (torch_key, tf)
        if uncertain:
            self.uncertain.add(flax_path)

    # convenience emitters -------------------------------------------------

    def conv(self, fp: str, tk: str, bias: bool = True, uncertain=False):
        self.add(f"{fp}/Conv_0/kernel", f"{tk}.weight", conv_w, uncertain)
        if bias:
            self.add(f"{fp}/Conv_0/bias", f"{tk}.bias", ident, uncertain)

    def bn(self, fp: str, tk: str, uncertain=False):
        self.add(f"{fp}/BatchNorm_0/scale", f"{tk}.weight", ident, uncertain)
        self.add(f"{fp}/BatchNorm_0/bias", f"{tk}.bias", ident, uncertain)
        self.add(f"batch_stats::{fp}/BatchNorm_0/mean", f"{tk}.running_mean", ident, uncertain)
        self.add(f"batch_stats::{fp}/BatchNorm_0/var", f"{tk}.running_var", ident, uncertain)


def _basic_conv(m: NameMap, fp: str, tk: str, bn: bool = True, deconv: bool = False):
    """BasicConv / BasicConv_IN: conv (bias=False) + optional BN."""
    kernel_tf = deconv_w if deconv else conv_w
    sub = "ConvTranspose_0" if deconv else "Conv_0"
    m.add(f"{fp}/{sub}/kernel", f"{tk}.conv.weight", kernel_tf)
    if bn:
        m.bn(f"{fp}", f"{tk}.bn")


def _resnet_block(m: NameMap, fp: str, tk: str, norm_batch: bool = True):
    """ResnetBasicBlock (bias=False convs + norm)."""
    m.add(f"{fp}/Conv_0/kernel", f"{tk}.conv1.weight", conv_w)
    m.add(f"{fp}/Conv_1/kernel", f"{tk}.conv2.weight", conv_w)
    if norm_batch:
        m.add(f"{fp}/BatchNorm_0/scale", f"{tk}.bn1.weight")
        m.add(f"{fp}/BatchNorm_0/bias", f"{tk}.bn1.bias")
        m.add(f"batch_stats::{fp}/BatchNorm_0/mean", f"{tk}.bn1.running_mean")
        m.add(f"batch_stats::{fp}/BatchNorm_0/var", f"{tk}.bn1.running_var")
        m.add(f"{fp}/BatchNorm_1/scale", f"{tk}.bn2.weight")
        m.add(f"{fp}/BatchNorm_1/bias", f"{tk}.bn2.bias")
        m.add(f"batch_stats::{fp}/BatchNorm_1/mean", f"{tk}.bn2.running_mean")
        m.add(f"batch_stats::{fp}/BatchNorm_1/var", f"{tk}.bn2.running_var")


def _residual_block(m: NameMap, fp: str, tk: str, norm: str,
                    downsample: bool = False):
    """extractor.ResidualBlock (biased convs, group/instance/batch norm)."""
    m.add(f"{fp}/Conv_0/kernel", f"{tk}.conv1.weight", conv_w)
    m.add(f"{fp}/Conv_0/bias", f"{tk}.conv1.bias")
    m.add(f"{fp}/Conv_1/kernel", f"{tk}.conv2.weight", conv_w)
    m.add(f"{fp}/Conv_1/bias", f"{tk}.conv2.bias")
    if norm == "group":
        for i, nm in ((0, "norm1"), (1, "norm2")):
            m.add(f"{fp}/GroupNorm_{i}/GroupNorm_0/scale", f"{tk}.{nm}.weight")
            m.add(f"{fp}/GroupNorm_{i}/GroupNorm_0/bias", f"{tk}.{nm}.bias")
    elif norm == "batch":
        m.bn(f"{fp}", f"{tk}.norm1")  # BatchNorm_0
        m.add(f"{fp}/BatchNorm_1/scale", f"{tk}.norm2.weight")
        m.add(f"{fp}/BatchNorm_1/bias", f"{tk}.norm2.bias")
        m.add(f"batch_stats::{fp}/BatchNorm_1/mean", f"{tk}.norm2.running_mean")
        m.add(f"batch_stats::{fp}/BatchNorm_1/var", f"{tk}.norm2.running_var")
    if downsample:
        m.add(f"{fp}/Conv_2/kernel", f"{tk}.downsample.0.weight", conv_w)
        m.add(f"{fp}/Conv_2/bias", f"{tk}.downsample.0.bias")
        if norm == "batch":
            m.add(f"{fp}/BatchNorm_2/scale", f"{tk}.downsample.1.weight")
            m.add(f"{fp}/BatchNorm_2/bias", f"{tk}.downsample.1.bias")
            m.add(f"batch_stats::{fp}/BatchNorm_2/mean", f"{tk}.downsample.1.running_mean")
            m.add(f"batch_stats::{fp}/BatchNorm_2/var", f"{tk}.downsample.1.running_var")
        elif norm == "group":
            m.add(f"{fp}/GroupNorm_2/GroupNorm_0/scale", f"{tk}.downsample.1.weight")
            m.add(f"{fp}/GroupNorm_2/GroupNorm_0/bias", f"{tk}.downsample.1.bias")


def _apc(m: NameMap, fp: str, tk: str):
    """Conv3dNormActReduced: conv1.{0 conv,1 bn} conv2.{0 conv,1 bn}."""
    m.add(f"{fp}/Conv_0/kernel", f"{tk}.conv1.0.weight", conv_w)
    m.add(f"{fp}/Conv_0/bias", f"{tk}.conv1.0.bias")
    m.bn(f"{fp}", f"{tk}.conv1.1")
    m.add(f"{fp}/Conv_1/kernel", f"{tk}.conv2.0.weight", conv_w)
    m.add(f"{fp}/Conv_1/bias", f"{tk}.conv2.0.bias")
    m.add(f"{fp}/BatchNorm_1/scale", f"{tk}.conv2.1.weight")
    m.add(f"{fp}/BatchNorm_1/bias", f"{tk}.conv2.1.bias")
    m.add(f"batch_stats::{fp}/BatchNorm_1/mean", f"{tk}.conv2.1.running_mean")
    m.add(f"batch_stats::{fp}/BatchNorm_1/var", f"{tk}.conv2.1.running_var")


def _mha(m: NameMap, fp: str, tk: str):
    for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                         ("v_proj", "v_proj"), ("out_proj", "out_proj")):
        m.add(f"{fp}/{ours}/kernel", f"{tk}.{theirs}.weight", linear_w)
        m.add(f"{fp}/{ours}/bias", f"{tk}.{theirs}.bias")


def _transformer_layer(m: NameMap, fp: str, tk: str):
    _mha(m, f"{fp}/MultiheadAttention_0", f"{tk}.self_attn")
    m.add(f"{fp}/Dense_0/kernel", f"{tk}.linear1.weight", linear_w)
    m.add(f"{fp}/Dense_0/bias", f"{tk}.linear1.bias")
    m.add(f"{fp}/Dense_1/kernel", f"{tk}.linear2.weight", linear_w)
    m.add(f"{fp}/Dense_1/bias", f"{tk}.linear2.bias")
    m.add(f"{fp}/LayerNorm_0/scale", f"{tk}.norm1.weight")
    m.add(f"{fp}/LayerNorm_0/bias", f"{tk}.norm1.bias")
    m.add(f"{fp}/LayerNorm_1/scale", f"{tk}.norm2.weight")
    m.add(f"{fp}/LayerNorm_1/bias", f"{tk}.norm2.bias")


def build_name_map(cfg) -> NameMap:
    """Full flax<->torch map for a given ModelConfig."""
    from foundationstereo_tpu.config import VIT_CONFIGS

    m = NameMap()
    vd = cfg.volume_dim  # noqa: F841

    # --- proj_cmb / stems / spx heads (core/foundation_stereo.py:144-161) --
    m.add("proj_cmb/Conv_0/kernel", "proj_cmb.weight", conv_w)
    m.add("proj_cmb/Conv_0/bias", "proj_cmb.bias")
    _basic_conv(m, "stem_2/BasicConvIN_0", "stem_2.0", bn=False)
    m.add("stem_2/Conv_0/kernel", "stem_2.1.weight", conv_w)
    m.add("spx_2_gru/BasicConv_0/ConvTranspose_0/kernel", "spx_2_gru.conv1.conv.weight", deconv_w)
    m.add("spx_2_gru/BasicConv_1/Conv_0/kernel", "spx_2_gru.conv2.conv.weight", conv_w)
    m.add("spx_gru/kernel", "spx_gru.0.weight", deconv_w)
    m.add("spx_gru/bias", "spx_gru.0.bias")

    # --- corr_stem (:164-169) ---------------------------------------------
    m.add("corr_stem/proj/Conv_0/kernel", "corr_stem.0.weight", conv_w)
    m.add("corr_stem/proj/Conv_0/bias", "corr_stem.0.bias")
    _basic_conv(m, "corr_stem/conv", "corr_stem.1")
    _resnet_block(m, "corr_stem/res0", "corr_stem.2")
    _resnet_block(m, "corr_stem/res1", "corr_stem.3")

    # --- corr_feature_att (:170) ------------------------------------------
    _basic_conv(m, "corr_feature_att/BasicConv_0", "corr_feature_att.feat_att.0")
    m.add("corr_feature_att/Conv_0/kernel", "corr_feature_att.feat_att.1.weight", conv_w)
    m.add("corr_feature_att/Conv_0/bias", "corr_feature_att.feat_att.1.bias")

    # --- classifier (:172-176) --------------------------------------------
    _basic_conv(m, "classifier/conv", "classifier.0")
    _resnet_block(m, "classifier/res", "classifier.1")
    m.add("classifier/out/Conv_0/kernel", "classifier.2.weight", conv_w)
    m.add("classifier/out/Conv_0/bias", "classifier.2.bias")

    # --- hourglass / cost_agg (:45-123) -----------------------------------
    hg = "cost_agg"
    for i, (ours, theirs) in enumerate((("conv1", "conv1"), ("conv2", "conv2"),
                                        ("conv3", "conv3"))):
        _basic_conv(m, f"{hg}/{ours}_conv", f"cost_agg.{theirs}.0")
        _apc(m, f"{hg}/{ours}_apc", f"cost_agg.{theirs}.1")
    for ours, theirs in (("conv3_up", "conv3_up"), ("conv2_up", "conv2_up"),
                         ("conv1_up", "conv1_up")):
        _basic_conv(m, f"{hg}/{ours}", f"cost_agg.{theirs}", deconv=True)
    for agg in ("agg_0", "agg_1"):
        _basic_conv(m, f"{hg}/{agg}_proj", f"cost_agg.{agg}.0")
        _apc(m, f"{hg}/{agg}_apc0", f"cost_agg.{agg}.1")
        _apc(m, f"{hg}/{agg}_apc1", f"cost_agg.{agg}.2")
    for ours, theirs in (("feature_att_8", "feature_att_8"),
                         ("feature_att_16", "feature_att_16"),
                         ("feature_att_32", "feature_att_32"),
                         ("feature_att_up_16", "feature_att_up_16"),
                         ("feature_att_up_8", "feature_att_up_8")):
        _basic_conv(m, f"{hg}/{ours}/BasicConv_0", f"cost_agg.{theirs}.feat_att.0")
        m.add(f"{hg}/{ours}/Conv_0/kernel", f"cost_agg.{theirs}.feat_att.1.weight", conv_w)
        m.add(f"{hg}/{ours}/Conv_0/bias", f"cost_agg.{theirs}.feat_att.1.bias")
    m.add(f"{hg}/conv_patch/Conv_0/kernel", "cost_agg.conv_patch.0.weight", conv_w)
    m.add(f"{hg}/conv_patch/Conv_0/bias", "cost_agg.conv_patch.0.bias")
    m.bn(f"{hg}/conv_patch_bn", "cost_agg.conv_patch.1")
    for t in range(4):
        _transformer_layer(m, f"{hg}/dt/TransformerEncoderLayer_{t}",
                           f"cost_agg.atts.4.sa.{t}")
    _apc(m, f"{hg}/conv_out_apc0", "cost_agg.conv_out.0")
    _apc(m, f"{hg}/conv_out_apc1", "cost_agg.conv_out.1")

    # --- cam / sam (core/submodule.py:532-561) -----------------------------
    m.add("cam/Conv_0/kernel", "cam.fc.0.weight", conv_w)
    m.add("cam/Conv_1/kernel", "cam.fc.2.weight", conv_w)
    m.add("sam/Conv_0/kernel", "sam.samconv.weight", conv_w)

    # --- update block (core/update.py; ours lives under refine/) -----------
    ub, tub = "refine/update_block", "update_block"
    for g, tg in (("gru04", "gru04"), ("gru08", "gru08"), ("gru16", "gru16")):
        m.add(f"{ub}/{g}/conv0/kernel", f"{tub}.{tg}.conv0.0.weight", conv_w)
        m.add(f"{ub}/{g}/conv0/bias", f"{tub}.{tg}.conv0.0.bias")
        m.add(f"{ub}/{g}/conv1/kernel", f"{tub}.{tg}.conv1.0.weight", conv_w)
        m.add(f"{ub}/{g}/conv1/bias", f"{tub}.{tg}.conv1.0.bias")
        for sz in ("small", "large"):
            for cz in ("convz", "convr", "convq"):
                m.add(f"{ub}/{g}/{sz}_gru/{cz}/Conv_0/kernel",
                      f"{tub}.{tg}.{sz}_gru.{cz}.weight", conv_w)
                m.add(f"{ub}/{g}/{sz}_gru/{cz}/Conv_0/bias",
                      f"{tub}.{tg}.{sz}_gru.{cz}.bias")
    for c in ("convc1", "convc2", "convd1", "convd2", "conv"):
        m.add(f"{ub}/encoder/{c}/Conv_0/kernel", f"{tub}.encoder.{c}.weight", conv_w)
        m.add(f"{ub}/encoder/{c}/Conv_0/bias", f"{tub}.encoder.{c}.bias")
    # disp_head: conv(3x3) + 2 EdgeNext encoders + out conv
    m.add(f"{ub}/disp_head/Conv_0/kernel", f"{tub}.disp_head.conv.0.weight", conv_w)
    m.add(f"{ub}/disp_head/Conv_0/bias", f"{tub}.disp_head.conv.0.bias")
    for i, ti in ((0, 2), (1, 3)):
        e = f"{ub}/disp_head/EdgeNextConvEncoder_{i}"
        te = f"{tub}.disp_head.conv.{ti}"
        m.add(f"{e}/Conv_0/kernel", f"{te}.dwconv.weight", conv_w)
        m.add(f"{e}/Conv_0/bias", f"{te}.dwconv.bias")
        m.add(f"{e}/Dense_0/kernel", f"{te}.pwconv1.weight", linear_w)
        m.add(f"{e}/Dense_0/bias", f"{te}.pwconv1.bias")
        m.add(f"{e}/Dense_1/kernel", f"{te}.pwconv2.weight", linear_w)
        m.add(f"{e}/Dense_1/bias", f"{te}.pwconv2.bias")
        m.add(f"{e}/gamma", f"{te}.gamma")
    m.add(f"{ub}/disp_head/Conv_1/kernel", f"{tub}.disp_head.conv.4.weight", conv_w)
    m.add(f"{ub}/disp_head/Conv_1/bias", f"{tub}.disp_head.conv.4.bias")
    m.add(f"{ub}/mask0/Conv_0/kernel", f"{tub}.mask.0.weight", conv_w)
    m.add(f"{ub}/mask0/Conv_0/bias", f"{tub}.mask.0.bias")
    m.add(f"{ub}/mask1/Conv_0/kernel", f"{tub}.mask.2.weight", conv_w)
    m.add(f"{ub}/mask1/Conv_0/bias", f"{tub}.mask.2.bias")

    # --- context net (core/extractor.py:192-283) ---------------------------
    cn = "cnet"
    m.add(f"{cn}/conv1/Conv_0/kernel", "cnet.conv1.weight", conv_w)
    m.add(f"{cn}/conv1/Conv_0/bias", "cnet.conv1.bias")
    m.bn(f"{cn}/norm1", "cnet.norm1")
    for li, (a, b) in enumerate((("layer1a", "layer1.0"), ("layer1b", "layer1.1"),
                                 ("layer2a", "layer2.0"), ("layer2b", "layer2.1"),
                                 ("layer3a", "layer3.0"), ("layer3b", "layer3.1"),
                                 ("layer4a", "layer4.0"), ("layer4b", "layer4.1"),
                                 ("layer5a", "layer5.0"), ("layer5b", "layer5.1"))):
        stride_block = a in ("layer2a", "layer3a", "layer4a", "layer5a")
        # layer1a changes channels 64->64 (no downsample); layer2a.. have
        # downsample due to stride/channel change
        _residual_block(m, f"{cn}/{a}", f"cnet.{b}", "batch", downsample=stride_block)
    _basic_conv(m, f"{cn}/conv2", "cnet.conv2")
    for lvl, tlvl in (("heads04", "outputs04"), ("heads08", "outputs08")):
        for j in range(2):
            _residual_block(m, f"{cn}/{lvl}/res{j}", f"cnet.{tlvl}.{j}.0", "batch")
            m.add(f"{cn}/{lvl}/out{j}/Conv_0/kernel", f"cnet.{tlvl}.{j}.1.weight", conv_w)
            m.add(f"{cn}/{lvl}/out{j}/Conv_0/bias", f"cnet.{tlvl}.{j}.1.bias")
    for j in range(2):
        m.add(f"{cn}/heads16/out{j}/Conv_0/kernel", f"cnet.outputs16.{j}.weight", conv_w)
        m.add(f"{cn}/heads16/out{j}/Conv_0/bias", f"cnet.outputs16.{j}.bias")

    # --- STA feature pyramid (core/extractor.py:323-369) --------------------
    ft = "feature"
    for ours, theirs in (("deconv32_16", "feature.deconv32_16"),
                         ("deconv16_8", "feature.deconv16_8"),
                         ("deconv8_4", "feature.deconv8_4")):
        m.add(f"{ft}/{ours}/BasicConvIN_0/ConvTranspose_0/kernel",
              f"{theirs}.conv1.conv.weight", deconv_w)
        _resnet_block(m, f"{ft}/{ours}/ResnetBasicBlock_0", f"{theirs}.conv2",
                      norm_batch=False)
    _basic_conv(m, f"{ft}/conv4_0", "feature.conv4.0", bn=False)
    _residual_block(m, f"{ft}/conv4_1", "feature.conv4.1", "instance")
    _residual_block(m, f"{ft}/conv4_2", "feature.conv4.2", "instance")

    # --- DINOv2 ViT (dinov2/models/vision_transformer.py) -------------------
    vit_cfg = VIT_CONFIGS[cfg.vit_size]
    dp = f"{ft}/dino/pretrained"
    tdp = "feature.dino.depth_anything.pretrained"
    m.add(f"{dp}/cls_token", f"{tdp}.cls_token")
    m.add(f"{dp}/pos_embed", f"{tdp}.pos_embed")
    m.add(f"{dp}/patch_embed/kernel", f"{tdp}.patch_embed.proj.weight", conv_w)
    m.add(f"{dp}/patch_embed/bias", f"{tdp}.patch_embed.proj.bias")
    m.add(f"{dp}/norm/scale", f"{tdp}.norm.weight")
    m.add(f"{dp}/norm/bias", f"{tdp}.norm.bias")
    for i in range(vit_cfg["depth"]):
        b, tb = f"{dp}/block{i}", f"{tdp}.blocks.{i}"
        m.add(f"{b}/norm1/scale", f"{tb}.norm1.weight")
        m.add(f"{b}/norm1/bias", f"{tb}.norm1.bias")
        m.add(f"{b}/norm2/scale", f"{tb}.norm2.weight")
        m.add(f"{b}/norm2/bias", f"{tb}.norm2.bias")
        m.add(f"{b}/attn/qkv/kernel", f"{tb}.attn.qkv.weight", linear_w)
        m.add(f"{b}/attn/qkv/bias", f"{tb}.attn.qkv.bias")
        m.add(f"{b}/attn/proj/kernel", f"{tb}.attn.proj.weight", linear_w)
        m.add(f"{b}/attn/proj/bias", f"{tb}.attn.proj.bias")
        m.add(f"{b}/mlp_fc1/kernel", f"{tb}.mlp.fc1.weight", linear_w)
        m.add(f"{b}/mlp_fc1/bias", f"{tb}.mlp.fc1.bias")
        m.add(f"{b}/mlp_fc2/kernel", f"{tb}.mlp.fc2.weight", linear_w)
        m.add(f"{b}/mlp_fc2/bias", f"{tb}.mlp.fc2.bias")
        m.add(f"{b}/ls1_gamma", f"{tb}.ls1.gamma")
        m.add(f"{b}/ls2_gamma", f"{tb}.ls2.gamma")

    # --- DPT head (depth_anything/dpt.py, blocks.py) ------------------------
    hd = f"{ft}/dino/depth_head"
    thd = "feature.dino.depth_anything.depth_head"
    for i in range(4):
        m.add(f"{hd}/project{i}/Conv_0/kernel", f"{thd}.projects.{i}.weight", conv_w)
        m.add(f"{hd}/project{i}/Conv_0/bias", f"{thd}.projects.{i}.bias")
    m.add(f"{hd}/resize0/kernel", f"{thd}.resize_layers.0.weight", deconv_w)
    m.add(f"{hd}/resize0/bias", f"{thd}.resize_layers.0.bias")
    m.add(f"{hd}/resize1/kernel", f"{thd}.resize_layers.1.weight", deconv_w)
    m.add(f"{hd}/resize1/bias", f"{thd}.resize_layers.1.bias")
    m.add(f"{hd}/resize3/Conv_0/kernel", f"{thd}.resize_layers.3.weight", conv_w)
    m.add(f"{hd}/resize3/Conv_0/bias", f"{thd}.resize_layers.3.bias")
    for i in range(4):
        m.add(f"{hd}/layer{i+1}_rn/Conv_0/kernel", f"{thd}.scratch.layer{i+1}_rn.weight", conv_w)
    for i in (1, 2, 3, 4):
        rb, trb = f"{hd}/refinenet{i}", f"{thd}.scratch.refinenet{i}"
        for j, tj in ((0, "resConfUnit1"), (1, "resConfUnit2")):
            # refinenet4 has no skip -> only RCU2 (ResidualConvUnit_0)
            pass
        # RCU order in our FeatureFusionBlock: RCU(skip) first when present,
        # then RCU2. refinenet4 (no skip) instantiates only one RCU.
        if i == 4:
            _rcu(m, f"{rb}/ResidualConvUnit_0", f"{trb}.resConfUnit2")
        else:
            _rcu(m, f"{rb}/ResidualConvUnit_0", f"{trb}.resConfUnit1")
            _rcu(m, f"{rb}/ResidualConvUnit_1", f"{trb}.resConfUnit2")
        m.add(f"{rb}/Conv_0/kernel", f"{trb}.out_conv.weight", conv_w)
        m.add(f"{rb}/Conv_0/bias", f"{trb}.out_conv.bias")
    m.add(f"{hd}/output_conv1/Conv_0/kernel", f"{thd}.scratch.output_conv1.weight", conv_w)
    m.add(f"{hd}/output_conv1/Conv_0/bias", f"{thd}.scratch.output_conv1.bias")
    m.add(f"{hd}/output_conv2_0/Conv_0/kernel", f"{thd}.scratch.output_conv2.0.weight", conv_w)
    m.add(f"{hd}/output_conv2_0/Conv_0/bias", f"{thd}.scratch.output_conv2.0.bias")
    m.add(f"{hd}/output_conv2_2/Conv_0/kernel", f"{thd}.scratch.output_conv2.2.weight", conv_w)
    m.add(f"{hd}/output_conv2_2/Conv_0/bias", f"{thd}.scratch.output_conv2.2.bias")

    # --- EdgeNeXt trunk (timm naming; UNVERIFIED in this environment — no
    # timm/checkpoints available; flagged `uncertain`) ----------------------
    from foundationstereo_tpu.models import edgenext as EN

    conv1x1_to_dense = lambda x: x[:, :, 0, 0].T  # noqa: E731

    en, ten = f"{ft}/edgenext", "feature"
    m.add(f"{en}/stem_conv/kernel", f"{ten}.stem.0.weight", conv_w, True)
    m.add(f"{en}/stem_conv/bias", f"{ten}.stem.0.bias", ident, True)
    m.add(f"{en}/stem_norm/LayerNorm_0/scale", f"{ten}.stem.1.weight", ident, True)
    m.add(f"{en}/stem_norm/LayerNorm_0/bias", f"{ten}.stem.1.bias", ident, True)
    for s in range(4):
        ts = f"{ten}.stages.{s}"
        if s > 0:
            m.add(f"{en}/down{s}_norm/LayerNorm_0/scale", f"{ts}.downsample.0.weight", ident, True)
            m.add(f"{en}/down{s}_norm/LayerNorm_0/bias", f"{ts}.downsample.0.bias", ident, True)
            m.add(f"{en}/down{s}_conv/kernel", f"{ts}.downsample.1.weight", conv_w, True)
            m.add(f"{en}/down{s}_conv/bias", f"{ts}.downsample.1.bias", ident, True)
        n_global = EN.GLOBAL_BLOCKS[s]
        n_local = EN.DEPTHS[s] - n_global
        for b in range(n_local):
            fb, tb = f"{en}/stage{s}_block{b}", f"{ts}.blocks.{b}"
            m.add(f"{fb}/Conv_0/kernel", f"{tb}.conv_dw.weight", conv_w, True)
            m.add(f"{fb}/Conv_0/bias", f"{tb}.conv_dw.bias", ident, True)
            m.add(f"{fb}/LayerNorm2d_0/LayerNorm_0/scale", f"{tb}.norm.weight", ident, True)
            m.add(f"{fb}/LayerNorm2d_0/LayerNorm_0/bias", f"{tb}.norm.bias", ident, True)
            m.add(f"{fb}/Dense_0/kernel", f"{tb}.mlp.fc1.weight", linear_w, True)
            m.add(f"{fb}/Dense_0/bias", f"{tb}.mlp.fc1.bias", ident, True)
            m.add(f"{fb}/Dense_1/kernel", f"{tb}.mlp.fc2.weight", linear_w, True)
            m.add(f"{fb}/Dense_1/bias", f"{tb}.mlp.fc2.bias", ident, True)
            m.add(f"{fb}/gamma", f"{tb}.gamma", ident, True)
        for g in range(n_global):
            fb = f"{en}/stage{s}_sdta{g}"
            tb = f"{ts}.blocks.{n_local + g}"
            n_dw = 1 if EN.D2_SCALES[s] == 1 else EN.D2_SCALES[s] - 1
            for j in range(n_dw):
                m.add(f"{fb}/dwconv{j}/kernel", f"{tb}.convs.{j}.weight", conv_w, True)
                m.add(f"{fb}/dwconv{j}/bias", f"{tb}.convs.{j}.bias", ident, True)
            if EN.USE_POS_EMB[s] and g == 0:
                m.add(f"{fb}/pos_proj/kernel",
                      f"{tb}.pos_embd.token_projection.weight", conv1x1_to_dense, True)
                m.add(f"{fb}/pos_proj/bias", f"{tb}.pos_embd.token_projection.bias",
                      ident, True)
            m.add(f"{fb}/norm_xca/scale", f"{tb}.norm_xca.weight", ident, True)
            m.add(f"{fb}/norm_xca/bias", f"{tb}.norm_xca.bias", ident, True)
            m.add(f"{fb}/gamma_xca", f"{tb}.gamma_xca", ident, True)
            m.add(f"{fb}/xca/qkv/kernel", f"{tb}.xca.qkv.weight", linear_w, True)
            m.add(f"{fb}/xca/qkv/bias", f"{tb}.xca.qkv.bias", ident, True)
            m.add(f"{fb}/xca/proj/kernel", f"{tb}.xca.proj.weight", linear_w, True)
            m.add(f"{fb}/xca/proj/bias", f"{tb}.xca.proj.bias", ident, True)
            m.add(f"{fb}/xca/temperature", f"{tb}.xca.temperature", ident, True)
            m.add(f"{fb}/norm/LayerNorm_0/scale", f"{tb}.norm.weight", ident, True)
            m.add(f"{fb}/norm/LayerNorm_0/bias", f"{tb}.norm.bias", ident, True)
            m.add(f"{fb}/Dense_0/kernel", f"{tb}.mlp.fc1.weight", linear_w, True)
            m.add(f"{fb}/Dense_0/bias", f"{tb}.mlp.fc1.bias", ident, True)
            m.add(f"{fb}/Dense_1/kernel", f"{tb}.mlp.fc2.weight", linear_w, True)
            m.add(f"{fb}/Dense_1/bias", f"{tb}.mlp.fc2.bias", ident, True)
            m.add(f"{fb}/gamma", f"{tb}.gamma", ident, True)

    return m


def _rcu(m: NameMap, fp: str, tk: str):
    m.add(f"{fp}/Conv_0/kernel", f"{tk}.conv1.weight", conv_w)
    m.add(f"{fp}/Conv_0/bias", f"{tk}.conv1.bias")
    m.add(f"{fp}/Conv_1/kernel", f"{tk}.conv2.weight", conv_w)
    m.add(f"{fp}/Conv_1/bias", f"{tk}.conv2.bias")


# -- application -------------------------------------------------------------


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


_COLLAPSIBLE = {"Conv_0", "BatchNorm_0", "GroupNorm_0"}


def canonical_path(path: str) -> str:
    """Collapse our wrapper modules' inner auto-names.

    The Conv/BatchNorm/GroupNorm wrappers in models/layers.py contain exactly
    one inner flax module, so the parameter's direct parent segment is always
    ``Conv_0``/``BatchNorm_0``/``GroupNorm_0`` — drop it. (LayerNorms are NOT
    collapsed: bare nn.LayerNorm is used directly in transformer blocks, so
    rules spell the wrapped LayerNorm2d path explicitly.)
    """
    parts = path.split("/")
    if len(parts) >= 2 and parts[-2] in _COLLAPSIBLE:
        parts = parts[:-2] + parts[-1:]
    return "/".join(parts)


def _unflatten(flat: dict):
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def submodule_rules(cfg, flax_prefix: str, torch_prefix: str) -> dict:
    """Slice the full name map down to one module, stripping both prefixes.

    Lets a standalone flax module (params rooted at itself) import the
    state_dict of the matching standalone torch module — used by the
    activation-parity tests (tests/test_parity_torch.py).
    """
    full = build_name_map(cfg)
    rules = {}
    for fp, (tk, tf) in full.rules.items():
        stats = fp.startswith("batch_stats::")
        fp2 = fp[len("batch_stats::"):] if stats else fp
        if not (fp2 == flax_prefix or fp2.startswith(flax_prefix + "/")):
            continue
        fp2 = fp2[len(flax_prefix) + 1:]
        assert tk == torch_prefix or tk.startswith(torch_prefix + "."), (fp, tk)
        tk2 = tk[len(torch_prefix) + 1:] if tk != torch_prefix else ""
        rules[("batch_stats::" if stats else "") + fp2] = (tk2, tf)
    return rules


def apply_rules(rules: dict, state_dict: dict[str, np.ndarray], variables,
                uncertain: set | None = None) -> tuple[Any, dict]:
    """Overlay torch weights onto `variables` via (flax_path -> (torch_key,
    transform)) rules. Returns (new_variables, report)."""
    import jax.numpy as jnp

    flat_params = _flatten(variables["params"])
    flat_stats = _flatten(variables.get("batch_stats", {}))

    report = {"mapped": [], "missing_torch": [], "shape_mismatch": [],
              "unmapped_flax": [], "uncertain": sorted(uncertain or ())}

    def apply_to(flat, key_prefix=""):
        updated = {}
        for fpath, leaf in flat.items():
            rule_key = None
            for cand in (key_prefix + fpath, key_prefix + canonical_path(fpath)):
                if cand in rules:
                    rule_key = cand
                    break
            if rule_key is None:
                report["unmapped_flax"].append(key_prefix + fpath)
                updated[fpath] = leaf
                continue
            tk, tf = rules[rule_key]
            if tk not in state_dict:
                report["missing_torch"].append(tk)
                updated[fpath] = leaf
                continue
            w = tf(state_dict[tk])
            if tuple(w.shape) != tuple(leaf.shape):
                report["shape_mismatch"].append((rule_key, tk, w.shape, tuple(leaf.shape)))
                updated[fpath] = leaf
                continue
            updated[fpath] = jnp.asarray(w, dtype=leaf.dtype)
            report["mapped"].append(rule_key)
        return updated

    new_params = _unflatten(apply_to(flat_params))
    new_stats = _unflatten(apply_to(flat_stats, key_prefix="batch_stats::"))
    used = {rules[k][0] for k in report["mapped"] if k in rules}
    report["unused_torch"] = sorted(set(state_dict) - used)
    out = dict(variables)
    out["params"] = new_params
    if flat_stats:
        out["batch_stats"] = new_stats
    return out, report


def import_reference_checkpoint(state_dict: dict[str, np.ndarray], variables,
                                cfg) -> tuple[Any, dict]:
    """Overlay reference weights onto `variables` ({'params', 'batch_stats'}).

    Returns (new_variables, report) where report lists mapped / missing /
    shape-mismatched / unused keys.
    """
    name_map = build_name_map(cfg)
    return apply_rules(name_map.rules, state_dict, variables,
                       uncertain=name_map.uncertain)
