"""Minimal detectron2/fvcore/timm shims to import and run the REFERENCE
torch modules on CPU for activation-parity tests.

The reference (/root/reference) depends on detectron2, fvcore, timm and
its compiled MSDeformAttn CUDA extension — none of which exist in this
image.  The reference modules we need
(``VideoMultiScaleMaskedTransformerDecoderUniVS``,
``MSDeformAttnPixelDecoder``, ``CLIPLangEncoder``) only touch a tiny
surface of those packages, so we install stub modules into
``sys.modules`` and load the reference files as proper packages WITHOUT
executing the heavyweight ``univs/__init__``/``mask2former/__init__``
chains (we pre-register package stubs whose ``__path__`` points at the
reference directories, so relative imports resolve against the real
sibling files).

The fake ``MultiScaleDeformableAttention`` extension implements the op's
documented semantics (per-level bilinear grid_sample at 2*loc-1, weighted
sum over levels×points — the spec in
reference ops/functions/ms_deform_attn_func.py:52-72) in plain torch so
``MSDeformAttnFunction.apply`` works on CPU.

Everything here is test-only scaffolding; nothing is imported by
``univs_tpu``.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"


def _mod(name: str) -> types.ModuleType:
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


def _pkg(name: str, path: str) -> types.ModuleType:
    """Register `name` as a package whose submodules load from `path`
    without executing the real __init__.py."""
    m = _mod(name)
    m.__path__ = [path]
    m.__package__ = name
    return m


def _install_shims() -> None:
    if getattr(sys.modules.get("detectron2"), "_univs_tpu_shim", False):
        return

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # ---------------- fvcore.nn.weight_init -------------------------
    wi = _mod("fvcore.nn.weight_init")

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, 0)

    wi.c2_xavier_fill = c2_xavier_fill
    wi.c2_msra_fill = c2_msra_fill
    fvnn = _mod("fvcore.nn")
    fvnn.weight_init = wi
    _mod("fvcore").nn = fvnn

    # ---------------- ftfy (ASCII-identity) --------------------------
    # the reference tokenizer runs ftfy.fix_text before html.unescape;
    # for the ASCII test corpora fix_text is the identity.
    ftfy = _mod("ftfy")
    if not hasattr(ftfy, "fix_text"):
        ftfy.fix_text = lambda text: text

    # ---------------- timm.models.layers ----------------------------
    tml = _mod("timm.models.layers")

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    import collections.abc

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return (x, x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval / p=0 -> identity
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    tml.trunc_normal_ = trunc_normal_
    tml.to_2tuple = to_2tuple
    tml.DropPath = DropPath
    tm = _mod("timm.models")
    tm.layers = tml
    _mod("timm").models = tm

    # ---------------- detectron2 -------------------------------------
    d2 = _mod("detectron2")
    d2._univs_tpu_shim = True

    cfgm = _mod("detectron2.config")

    def configurable(init_func=None, *, from_config=None):
        # Direct-kwargs construction only (parity tests never pass a cfg).
        if init_func is not None:
            return init_func

        def deco(f):
            return f

        return deco

    cfgm.configurable = configurable
    d2.config = cfgm

    layers = _mod("detectron2.layers")

    class ShapeSpec:
        def __init__(self, channels=None, height=None, width=None, stride=None):
            self.channels = channels
            self.height = height
            self.width = width
            self.stride = stride

    class Conv2d(nn.Conv2d):
        """d2's Conv2d: optional fused .norm / .activation."""

        def __init__(self, *args, **kwargs):
            norm = kwargs.pop("norm", None)
            activation = kwargs.pop("activation", None)
            super().__init__(*args, **kwargs)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = F.conv2d(
                x, self.weight, self.bias, self.stride, self.padding, self.dilation, self.groups
            )
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    def get_norm(norm, out_channels):
        if norm is None or norm == "":
            return None
        if norm == "GN":
            return nn.GroupNorm(32, out_channels)
        if norm == "LN":
            return nn.GroupNorm(1, out_channels)
        raise ValueError(f"unsupported norm {norm!r} in shim")

    def cat(tensors, dim=0):
        if len(tensors) == 1:
            return tensors[0]
        return torch.cat(tensors, dim)

    layers.Conv2d = Conv2d
    layers.ShapeSpec = ShapeSpec
    layers.get_norm = get_norm
    layers.cat = cat
    d2.layers = layers

    class Registry:
        def __init__(self, name):
            self._name = name
            self._obj_map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._obj_map[cls.__name__] = cls
                    return cls

                return deco
            self._obj_map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._obj_map[name]

    reg = _mod("detectron2.utils.registry")
    reg.Registry = Registry
    utils = _mod("detectron2.utils")
    utils.registry = reg
    d2.utils = utils

    modeling = _mod("detectron2.modeling")
    modeling.SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
    modeling.META_ARCH_REGISTRY = Registry("META_ARCH")
    modeling.BACKBONE_REGISTRY = Registry("BACKBONE")
    d2.modeling = modeling

    pf = _mod("detectron2.projects.point_rend.point_features")

    def point_sample(input, point_coords, **kwargs):
        add_dim = False
        if point_coords.dim() == 3:
            add_dim = True
            point_coords = point_coords.unsqueeze(2)
        output = F.grid_sample(input, 2.0 * point_coords - 1.0, **kwargs)
        if add_dim:
            output = output.squeeze(3)
        return output

    pf.point_sample = point_sample
    pr = _mod("detectron2.projects.point_rend")
    pr.point_features = pf
    _mod("detectron2.projects").point_rend = pr

    # ------------- fake MultiScaleDeformableAttention extension ------
    msda = _mod("MultiScaleDeformableAttention")

    def ms_deform_attn_forward(value, spatial_shapes, level_start_index, loc, weights, step):
        """CPU implementation of the CUDA op's contract.

        value: [N, S, M, D]; spatial_shapes: [L, 2]; loc: [N, Q, M, L, P, 2]
        in [0,1]; weights: [N, Q, M, L, P].  Returns [N, Q, M*D].
        Semantics: bilinear grid_sample per level at grid 2*loc-1
        (align_corners=False, zeros padding), weighted sum over L*P.
        """
        N, S, M, D = value.shape
        _, Q, _, L, P, _ = loc.shape
        splits = [int(h) * int(w) for h, w in spatial_shapes]
        per_level = value.split(splits, dim=1)
        grids = 2 * loc - 1
        acc = value.new_zeros(N * M, D, Q, L, P)
        for li, (h, w) in enumerate(spatial_shapes):
            v = per_level[li].flatten(2).transpose(1, 2).reshape(N * M, D, int(h), int(w))
            g = grids[:, :, :, li].transpose(1, 2).flatten(0, 1)  # [N*M, Q, P, 2]
            acc[..., li, :] = F.grid_sample(
                v, g, mode="bilinear", padding_mode="zeros", align_corners=False
            )
        w_ = weights.transpose(1, 2).reshape(N * M, 1, Q, L * P)
        out = (acc.flatten(-2) * w_).sum(-1)  # [N*M, D, Q]
        return out.view(N, M * D, Q).transpose(1, 2).contiguous()

    def ms_deform_attn_backward(*a, **kw):
        raise NotImplementedError("forward-only shim")

    msda.ms_deform_attn_forward = ms_deform_attn_forward
    msda.ms_deform_attn_backward = ms_deform_attn_backward


def install() -> None:
    """Install dependency shims + reference package stubs; idempotent."""
    _install_shims()

    # reference packages, loaded without their real __init__ side effects
    _pkg("univs", f"{REF}/univs")
    _pkg("univs.modeling", f"{REF}/univs/modeling")
    _pkg("univs.modeling.transformer_decoder", f"{REF}/univs/modeling/transformer_decoder")
    _pkg("univs.modeling.language", f"{REF}/univs/modeling/language")
    _pkg("univs.modeling.prompt_encoder", f"{REF}/univs/modeling/prompt_encoder")
    _pkg("univs.utils", f"{REF}/univs/utils")
    _pkg("univs.modeling.pixel_decoder", f"{REF}/univs/modeling/pixel_decoder")
    _pkg("mask2former", f"{REF}/mask2former")
    _pkg("mask2former.modeling", f"{REF}/mask2former/modeling")
    _pkg(
        "mask2former.modeling.transformer_decoder",
        f"{REF}/mask2former/modeling/transformer_decoder",
    )
    _pkg("mask2former.modeling.pixel_decoder", f"{REF}/mask2former/modeling/pixel_decoder")
    _pkg("mask2former.modeling.pixel_decoder.ops", f"{REF}/mask2former/modeling/pixel_decoder/ops")
    _pkg("datasets", f"{REF}/datasets")
    _pkg("datasets.concept_emb", f"{REF}/datasets/concept_emb")

    # The reference decoder imports VisualPromptEncoder/VisualPromptSampler
    # at module scope; its prompt_encoder module pulls the full language
    # stack + scipy.cluster.  Detection-path parity never instantiates
    # them, so substitute inert placeholders (tests exercising visual
    # prompts import the real module explicitly).
    pe = sys.modules["univs.modeling.prompt_encoder"]
    if not hasattr(pe, "VisualPromptEncoder"):
        class _Unavailable:
            def __init__(self, *a, **kw):
                raise RuntimeError("real prompt_encoder not loaded by shim")

        pe.VisualPromptEncoder = _Unavailable
        pe.VisualPromptSampler = _Unavailable


def load_reference_decoder_module():
    install()
    import importlib

    return importlib.import_module(
        "univs.modeling.transformer_decoder.video_mask2former_transformer_decoder_univs"
    )


def load_reference_pixel_decoder_module():
    install()
    import importlib

    return importlib.import_module("mask2former.modeling.pixel_decoder.msdeformattn")


def load_reference_text_encoder_module():
    install()
    import importlib

    return importlib.import_module("univs.modeling.language.TextEncoder")


def load_reference_tokenizer_module():
    """The runtime tokenizer variant (univs/modeling/language/
    clip_prompt_utils.py) used by pre_tokenize_expression."""
    install()
    import importlib

    return importlib.import_module("univs.modeling.language.clip_prompt_utils")
