"""Weight converter tests: torch BN/conv semantics match frozen-BN flax."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from univs_tpu.models.backbones.resnet import ResNet
from univs_tpu.utils.convert import convert_resnet, flatten_torch, report_unconverted


def _torch_bottleneck_stack():
    """Build a torch R50 state dict (torchvision naming) with random weights."""
    sd = {}
    g = torch.Generator().manual_seed(0)

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = torch.randn(cout, cin, k, k, generator=g) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[name + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd[name + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[name + ".running_var"] = torch.rand(c, generator=g) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    cins = (64, 256, 512, 1024)
    for s, nb in enumerate(blocks):
        cout = 256 * (2 ** s)
        mid = cout // 4
        for b in range(nb):
            cin = cins[s] if b == 0 else cout
            pre = f"layer{s + 1}.{b}"
            conv(f"{pre}.conv1", mid, cin, 1)
            bn(f"{pre}.bn1", mid)
            conv(f"{pre}.conv2", mid, mid, 3)
            bn(f"{pre}.bn2", mid)
            conv(f"{pre}.conv3", cout, mid, 1)
            bn(f"{pre}.bn3", cout)
            if b == 0:
                conv(f"{pre}.downsample.0", cout, cin, 1)
                bn(f"{pre}.downsample.1", cout)
    return sd


def test_resnet_conversion_structure_and_numerics():
    sd = _torch_bottleneck_stack()
    converted = convert_resnet(flatten_torch(sd), depth=50)

    model = ResNet(depth=50)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    ref_params = model.init(jax.random.PRNGKey(0), x)["params"]
    missing = report_unconverted(ref_params, converted)
    assert missing == [], missing[:10]

    # numeric check of the stem: conv+frozenBN+relu vs torch eval-mode
    out = model.apply({"params": converted}, x)
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    conv = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
    conv.weight.data = sd["conv1.weight"]
    bn = tnn.BatchNorm2d(64).eval()
    bn.weight.data = sd["bn1.weight"]
    bn.bias.data = sd["bn1.bias"]
    bn.running_mean.data = sd["bn1.running_mean"]
    bn.running_var.data = sd["bn1.running_var"]
    with torch.no_grad():
        stem_t = torch.relu(bn(conv(xt)))
        stem_t = tnn.functional.max_pool2d(stem_t, 3, 2, 1)

    # recompute flax stem only
    import flax.linen as fnn

    stem_out = fnn.max_pool(
        fnn.relu(
            (jax.lax.conv_general_dilated(
                x, jnp.asarray(converted["stem_conv"]["kernel"]),
                (2, 2), [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
             - converted["stem_bn"]["mean"]) / np.sqrt(converted["stem_bn"]["var"] + 1e-5)
            * converted["stem_bn"]["scale"] + converted["stem_bn"]["bias"]
        ),
        (3, 3), (2, 2), [(1, 1), (1, 1)],
    )
    np.testing.assert_allclose(
        np.asarray(stem_out), stem_t.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(out))


def test_clip_text_conversion_structure():
    from univs_tpu.models.clip_text import ClipTextEncoder
    from univs_tpu.utils.convert import convert_clip_text

    width, layers, vocab = 32, 2, 100
    g = torch.Generator().manual_seed(1)
    sd = {
        "token_embedding.weight": torch.randn(vocab, width, generator=g),
        "positional_embedding": torch.randn(77, width, generator=g),
        "text_projection": torch.randn(width, 16, generator=g),
        "ln_final.weight": torch.ones(width),
        "ln_final.bias": torch.zeros(width),
    }
    for i in range(layers):
        pre = f"transformer.resblocks.{i}"
        sd[f"{pre}.attn.in_proj_weight"] = torch.randn(3 * width, width, generator=g)
        sd[f"{pre}.attn.in_proj_bias"] = torch.randn(3 * width, generator=g)
        sd[f"{pre}.attn.out_proj.weight"] = torch.randn(width, width, generator=g)
        sd[f"{pre}.attn.out_proj.bias"] = torch.randn(width, generator=g)
        sd[f"{pre}.ln_1.weight"] = torch.ones(width)
        sd[f"{pre}.ln_1.bias"] = torch.zeros(width)
        sd[f"{pre}.ln_2.weight"] = torch.ones(width)
        sd[f"{pre}.ln_2.bias"] = torch.zeros(width)
        sd[f"{pre}.mlp.c_fc.weight"] = torch.randn(4 * width, width, generator=g)
        sd[f"{pre}.mlp.c_fc.bias"] = torch.randn(4 * width, generator=g)
        sd[f"{pre}.mlp.c_proj.weight"] = torch.randn(width, 4 * width, generator=g)
        sd[f"{pre}.mlp.c_proj.bias"] = torch.randn(width, generator=g)

    converted = convert_clip_text(flatten_torch(sd), num_layers=layers, width=width)
    enc = ClipTextEncoder(embed_dim=16, width=width, heads=4, num_layers=layers, vocab_size=vocab)
    tokens = jnp.array([[99, 5, 3, 98]])
    ref = enc.init(jax.random.PRNGKey(0), tokens)["params"]
    missing = report_unconverted(ref, converted)
    assert missing == [], missing
    word, eot = enc.apply({"params": converted}, tokens)
    assert bool(jnp.isfinite(word).all())


def test_swin_conversion_structure():
    from univs_tpu.models.backbones.swin import SwinTransformer
    from univs_tpu.utils.convert import convert_swin

    depths = (1, 1)
    dims = (16, 32)
    heads = (2, 4)
    g = torch.Generator().manual_seed(2)
    sd = {
        "patch_embed.proj.weight": torch.randn(16, 3, 4, 4, generator=g),
        "patch_embed.proj.bias": torch.randn(16, generator=g),
        "patch_embed.norm.weight": torch.ones(16),
        "patch_embed.norm.bias": torch.zeros(16),
    }
    for s, depth in enumerate(depths):
        dim = dims[s]
        for b in range(depth):
            q = f"layers.{s}.blocks.{b}."
            sd[q + "norm1.weight"] = torch.ones(dim)
            sd[q + "norm1.bias"] = torch.zeros(dim)
            sd[q + "norm2.weight"] = torch.ones(dim)
            sd[q + "norm2.bias"] = torch.zeros(dim)
            sd[q + "attn.qkv.weight"] = torch.randn(3 * dim, dim, generator=g)
            sd[q + "attn.qkv.bias"] = torch.randn(3 * dim, generator=g)
            sd[q + "attn.proj.weight"] = torch.randn(dim, dim, generator=g)
            sd[q + "attn.proj.bias"] = torch.randn(dim, generator=g)
            sd[q + "attn.relative_position_bias_table"] = torch.randn(13 * 13, heads[s], generator=g)
            sd[q + "mlp.fc1.weight"] = torch.randn(4 * dim, dim, generator=g)
            sd[q + "mlp.fc1.bias"] = torch.randn(4 * dim, generator=g)
            sd[q + "mlp.fc2.weight"] = torch.randn(dim, 4 * dim, generator=g)
            sd[q + "mlp.fc2.bias"] = torch.randn(dim, generator=g)
        if s == 0:
            sd[f"layers.{s}.downsample.norm.weight"] = torch.ones(4 * dim)
            sd[f"layers.{s}.downsample.norm.bias"] = torch.zeros(4 * dim)
            sd[f"layers.{s}.downsample.reduction.weight"] = torch.randn(2 * dim, 4 * dim, generator=g)
        sd[f"norm{s}.weight"] = torch.ones(dims[min(s, 1)])
        sd[f"norm{s}.bias"] = torch.zeros(dims[min(s, 1)])

    converted = convert_swin(flatten_torch(sd), depths=depths)
    model = SwinTransformer(embed_dim=16, depths=depths, num_heads=heads, window=7,
                            out_features=("res2", "res3"))
    x = jnp.ones((1, 32, 32, 3))
    ref = model.init(jax.random.PRNGKey(0), x)["params"]
    from univs_tpu.utils.convert import report_unconverted

    missing = report_unconverted(ref, converted)
    assert missing == [], missing[:8]
    out = model.apply({"params": converted}, x)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(out))


def test_resnet_full_activation_parity():
    """ALL FOUR output scales vs a functional-torch R50 built from the
    same state dict — d2 STRIDE_IN_1X1=False IS torchvision geometry
    (reference configs/univs/Base.yaml:12), so the oracle puts the
    stage stride on the 3x3 conv.  Closes the round-3 gap where only
    the stem had numeric parity."""
    import torch.nn.functional as F

    sd = _torch_bottleneck_stack()
    converted = convert_resnet(flatten_torch(sd), depth=50)
    model = ResNet(depth=50)
    x = np.random.RandomState(1).rand(1, 64, 96, 3).astype(np.float32)
    outs = model.apply({"params": converted}, jnp.asarray(x))

    def bn(t, p):
        return F.batch_norm(
            t, sd[p + ".running_mean"], sd[p + ".running_var"],
            sd[p + ".weight"], sd[p + ".bias"], training=False, eps=1e-5)

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = F.conv2d(t, sd["conv1.weight"], stride=2, padding=3)
        t = F.max_pool2d(F.relu(bn(t, "bn1")), 3, 2, 1)
        for s, nb in enumerate((3, 4, 6, 3)):
            for b in range(nb):
                pre = f"layer{s + 1}.{b}"
                stride = 2 if (b == 0 and s > 0) else 1
                idn = t
                y = F.relu(bn(F.conv2d(t, sd[pre + ".conv1.weight"]), pre + ".bn1"))
                y = F.relu(bn(F.conv2d(y, sd[pre + ".conv2.weight"],
                                       stride=stride, padding=1), pre + ".bn2"))
                y = bn(F.conv2d(y, sd[pre + ".conv3.weight"]), pre + ".bn3")
                if pre + ".downsample.0.weight" in sd:
                    idn = bn(F.conv2d(t, sd[pre + ".downsample.0.weight"],
                                      stride=stride), pre + ".downsample.1")
                t = F.relu(y + idn)
            ref = t.numpy().transpose(0, 2, 3, 1)
            got = np.asarray(outs[f"res{s + 2}"])
            tol = 1e-4 * max(float(np.abs(ref).max()), 1e-3)
            np.testing.assert_allclose(got, ref, atol=tol,
                                       err_msg=f"res{s + 2}")


def test_swin_full_activation_parity():
    """Converted Swin vs the REAL reference SwinTransformer
    (mask2former/modeling/backbone/swin.py:498; D2SwinTransformer :687
    is a cfg wrapper over the same forward) — all four scales, random
    weights, non-window-multiple input (exercises padding, cyclic
    shift, relative position bias, patch merging)."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    import ref_shim
    from univs_tpu.models.backbones.swin import SwinTransformer
    from univs_tpu.utils.convert import convert_swin, report_unconverted

    mod = ref_shim.load_reference_swin_module()
    depths, heads, dim, window = (2, 2, 2, 2), (2, 4, 8, 16), 32, 7
    ref = mod.SwinTransformer(
        pretrain_img_size=224, patch_size=4, in_chans=3, embed_dim=dim,
        depths=list(depths), num_heads=list(heads), window_size=window,
        mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0, ape=False, patch_norm=True,
        out_indices=(0, 1, 2, 3), frozen_stages=-1, use_checkpoint=False,
    )
    # NOTE: the reference overrides train() without returning self
    # (swin.py:680-683), so .eval() returns None — call it separately.
    ref.eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p_ in ref.parameters():
            p_.copy_(torch.randn(p_.shape, generator=g) * 0.05)

    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    converted = convert_swin(flatten_torch(sd), depths=depths)
    model = SwinTransformer(embed_dim=dim, depths=depths, num_heads=heads,
                            window=window)
    x = np.random.RandomState(2).rand(1, 64, 96, 3).astype(np.float32)
    params0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    assert report_unconverted(params0, converted) == []
    outs = model.apply({"params": converted}, jnp.asarray(x))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for i in range(4):
        name = f"res{i + 2}"
        r = ref_out[name].numpy().transpose(0, 2, 3, 1)
        got = np.asarray(outs[name])
        tol = 1e-4 * max(float(np.abs(r).max()), 1e-3)
        np.testing.assert_allclose(got, r, atol=tol, err_msg=name)
