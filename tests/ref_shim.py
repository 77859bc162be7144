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

    class Backbone(nn.Module):
        """d2 Backbone base: the reference D2SwinTransformer only needs
        an nn.Module MRO anchor + size_divisibility/output_shape."""

        @property
        def size_divisibility(self):
            return 0

        def output_shape(self):
            return {}

    modeling.Backbone = Backbone
    modeling.ShapeSpec = ShapeSpec
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

    def get_uncertain_point_coords_with_randomness(
        coarse_logits, uncertainty_func, num_points, oversample_ratio, importance_sample_ratio
    ):
        """d2 PointRend importance sampling (parity tests patch this
        with a deterministic grid; this is the faithful fallback)."""
        num_boxes = coarse_logits.shape[0]
        num_sampled = int(num_points * oversample_ratio)
        point_coords = torch.rand(num_boxes, num_sampled, 2, device=coarse_logits.device)
        point_logits = point_sample(coarse_logits, point_coords, align_corners=False)
        point_uncertainties = uncertainty_func(point_logits)
        num_uncertain_points = int(importance_sample_ratio * num_points)
        num_random_points = num_points - num_uncertain_points
        idx = torch.topk(point_uncertainties[:, 0, :], k=num_uncertain_points, dim=1)[1]
        shift = num_sampled * torch.arange(num_boxes, dtype=torch.long, device=coarse_logits.device)
        idx += shift[:, None]
        point_coords = point_coords.view(-1, 2)[idx.view(-1), :].view(
            num_boxes, num_uncertain_points, 2
        )
        if num_random_points > 0:
            point_coords = torch.cat(
                [point_coords, torch.rand(num_boxes, num_random_points, 2, device=coarse_logits.device)],
                dim=1,
            )
        return point_coords

    pf.point_sample = point_sample
    pf.get_uncertain_point_coords_with_randomness = get_uncertain_point_coords_with_randomness
    pr = _mod("detectron2.projects.point_rend")
    pr.point_features = pf
    _mod("detectron2.projects").point_rend = pr

    comm = _mod("detectron2.utils.comm")
    comm.get_world_size = lambda: 1
    utils_pkg = _mod("detectron2.utils")
    utils_pkg.comm = comm

    mem = _mod("detectron2.utils.memory")
    mem.retry_if_cuda_oom = lambda fn: fn
    utils_pkg.memory = mem

    structures = _mod("detectron2.structures")

    class Instances:
        def __init__(self, image_size, **kwargs):
            self._image_size = image_size
            self._fields = {}
            for k, v in kwargs.items():
                self.set(k, v)

        def set(self, name, value):
            self._fields[name] = value

        def get(self, name):
            return self._fields[name]

        def __getattr__(self, name):
            if name.startswith("_"):
                raise AttributeError(name)
            fields = self.__dict__.get("_fields", {})
            if name in fields:
                return fields[name]
            raise AttributeError(name)

        def __setattr__(self, name, value):
            if name.startswith("_"):
                super().__setattr__(name, value)
            else:
                self._fields[name] = value

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

    class Boxes:
        def __init__(self, tensor):
            self.tensor = tensor

    class BitMasks:
        def __init__(self, tensor):
            self.tensor = tensor

    structures.Instances = Instances
    structures.Boxes = Boxes
    structures.BitMasks = BitMasks
    structures.ImageList = None
    d2.structures = structures

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

    # ---------------- torchvision (bare stub) ------------------------
    # univs.utils.comm does `import torchvision` at module scope; the
    # symbols the parity tests reach (convert_box_to_mask/_to_box) never
    # touch it.
    _mod("torchvision")


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
    _pkg("mask2former_video", f"{REF}/mask2former_video")
    _pkg("mask2former_video.utils", f"{REF}/mask2former_video/utils")
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


def load_reference_prompt_encoder_module():
    """The REAL VisualPromptEncoder/VisualPromptSampler module
    (univs/modeling/prompt_encoder/prompt_encoder.py).  Replaces the
    inert placeholders installed by :func:`install` so sot-path parity
    tests can instantiate the actual sampler."""
    install()
    import importlib

    lang = sys.modules["univs.modeling.language"]
    if not hasattr(lang, "pre_tokenize_expression"):
        def _no_lang(*a, **kw):
            raise RuntimeError("language stack not loaded by prompt-encoder shim")

        lang.pre_tokenize_expression = _no_lang

    mod = importlib.import_module("univs.modeling.prompt_encoder.prompt_encoder")
    pe_pkg = sys.modules["univs.modeling.prompt_encoder"]
    pe_pkg.VisualPromptEncoder = mod.VisualPromptEncoder
    pe_pkg.VisualPromptSampler = mod.VisualPromptSampler
    return mod


def load_reference_criterion_modules():
    """The real VideoSetCriterionUni / VideoSetCriterion /
    VideoSetCriterionPrompt / VideoHungarianMatcherUni modules
    (univs/modeling/video_criterion*.py, video_matcher.py)."""
    install()
    import importlib

    matcher = importlib.import_module("univs.modeling.video_matcher")
    crit = importlib.import_module("univs.modeling.video_criterion")
    crit_p = importlib.import_module("univs.modeling.video_criterion_prompt")
    crit_uni = importlib.import_module("univs.modeling.video_criterion_uni")
    return crit_uni, crit, crit_p, matcher


def load_reference_mdqe_module():
    """The real MDQE_OverTrackerEfficient module
    (univs/modeling/tracking/mdqe_overtracker_efficient.py)."""
    install()
    import importlib

    _pkg("univs.modeling.tracking", f"{REF}/univs/modeling/tracking")
    return importlib.import_module("univs.modeling.tracking.mdqe_overtracker_efficient")


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


def load_reference_pixel_decoder_vl_module():
    """The real MSDeformAttnPixelDecoderVL + VLFuse bi-attention stack
    (univs/modeling/pixel_decoder/msdeformattn_vl.py,
    vision_lang_biattn_layers.py)."""
    install()
    import importlib

    return importlib.import_module("univs.modeling.pixel_decoder.msdeformattn_vl")


def load_reference_pvt_module():
    """The real PVTv2 backbone (mask2former/modeling/backbone/pvt_v2.py)."""
    install()
    import importlib

    _pkg("mask2former.modeling.backbone", f"{REF}/mask2former/modeling/backbone")
    return importlib.import_module("mask2former.modeling.backbone.pvt_v2")


def load_reference_davis_metrics():
    """The vendored davis2017-evaluation metrics kernel
    (univs/evaluation/davis2017_evaluation/davis2017/metrics.py) —
    pure numpy+cv2.  Its ``f_measure`` lazily imports
    ``skimage.morphology.disk``; skimage isn't in this image, so shim
    the one function with its canonical definition (a circular
    structuring element, x^2 + y^2 <= r^2)."""
    import importlib.util

    import numpy as np

    if "skimage.morphology" not in sys.modules:
        sk = _mod("skimage")
        morph = _mod("skimage.morphology")

        def disk(radius, dtype=np.uint8):
            L = np.arange(-int(radius), int(radius) + 1)
            X, Y = np.meshgrid(L, L)
            return ((X ** 2 + Y ** 2) <= radius ** 2).astype(dtype)

        morph.disk = disk
        sk.morphology = morph

    name = "ref_davis2017_metrics"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f"{REF}/univs/evaluation/davis2017_evaluation/davis2017/metrics.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def install_pycocotools_shim():
    """pycocotools.mask backed by univs_tpu.utils.rle (COCO-spec RLE).

    Covers exactly what the vendored ytvis_api touches: area, merge
    (intersection/union — returned as an opaque carrier whose area()
    is the set size), toBbox, decode.  Polygon inputs (frPyObjects)
    are out of scope — golden tests feed RLE dicts."""
    import numpy as np

    from univs_tpu.utils import rle as _rle

    if getattr(sys.modules.get("pycocotools"), "_univs_tpu_shim", False):
        return sys.modules["pycocotools.mask"]

    pc = _mod("pycocotools")
    pc._univs_tpu_shim = True
    mk = _mod("pycocotools.mask")

    class _Merged(dict):
        """Carrier for merge() results; area() reads ._area."""

    def area(r):
        if isinstance(r, _Merged):
            return r["_area"]
        return _rle.area(r)

    def merge(rles, intersect=False):
        a, b = rles
        inter = _rle.intersection(a, b)
        if intersect:
            return _Merged(_area=inter)
        return _Merged(_area=_rle.area(a) + _rle.area(b) - inter)

    def decode(r):
        return _rle.decode(r)

    def toBbox(r):
        m = _rle.decode(r)
        ys, xs = np.nonzero(m)
        if ys.size == 0:
            return np.zeros(4, np.float64)
        x0, y0 = xs.min(), ys.min()
        return np.array(
            [x0, y0, xs.max() - x0 + 1, ys.max() - y0 + 1], np.float64)

    def frPyObjects(objs, h, w):
        raise NotImplementedError("shim covers RLE inputs only")

    mk.area = area
    mk.merge = merge
    mk.decode = decode
    mk.toBbox = toBbox
    mk.frPyObjects = frPyObjects
    pc.mask = mk
    return mk


def load_reference_ytvos_api():
    """The vendored ytvis_api (YTVOS + YTVOSeval,
    univs/data/datasets/ytvis_api/) — pure numpy on top of
    pycocotools.mask, which is shimmed onto univs_tpu.utils.rle."""
    install()
    install_pycocotools_shim()
    import importlib

    _pkg("ytvis_api", f"{REF}/univs/data/datasets/ytvis_api")
    ytvos = importlib.import_module("ytvis_api.ytvos")
    ytvoseval = importlib.import_module("ytvis_api.ytvoseval")
    return ytvos, ytvoseval


def load_reference_swin_module():
    """The reference Swin backbone (mask2former/modeling/backbone/swin.py;
    D2SwinTransformer :687 wraps SwinTransformer :498 with cfg plumbing —
    the plain class takes the same args directly)."""
    install()
    import importlib

    return importlib.import_module("mask2former.modeling.backbone.swin")


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
