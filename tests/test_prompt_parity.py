"""Activation parity for the VISUAL-PROMPT (sot/VOS) path vs the
REFERENCE torch modules — the round-2 verdict's top item.

Three levels:

A. sampler-level: the reference ``VisualPromptSampler.
   process_per_batch_inference`` (mask prompts, first clip) vs our
   ``sample_visual_prompts`` — exact R-point set equality including the
   cyclic-repeat multiplicity law (prompt_encoder.py:478-479).
B. decoder-level (clip 1): the reference decoder constructed WITH the
   real sampler, task='sot', memory-pool extraction inside
   (decoder_univs.py:631-656, 795-822) vs our pool pipeline
   (_reencode_prompts -> read_prompt_kv/read_clip_queries ->
   UniVSDecoder) through the real weight converter, <=1e-4.
C. decoder-level (clip 2): prompts read from a 2-clip memory pool —
   zero_pad + committed-frame update cascade + first/prev extraction.

Fixtures keep every mask's 1/8-grid pixel count in [1, R-1] so the
reference's dense selection is its deterministic cyclic branch (n<R;
n>R randomizes via randperm and cannot be activation-matched).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import ref_shim
from univs_tpu.utils.convert_univs import convert_decoder

TOL = 1e-4

C = 64
DT = 48
QL = 16
K = 7
T = 2
LAYERS = 3
R = 8  # num_dense_points
N = 3  # instances
SIZES = [(4, 6), (8, 12), (16, 24)]  # 1/32, 1/16, 1/8
H8, W8 = SIZES[-1]
HM, WM = 32, 48  # 1/4 mask-features res
HF, WF = H8 * 8, W8 * 8  # full res


def _sd_numpy(module, prefix):
    return {prefix + k: v.detach().numpy() for k, v in module.state_dict().items()}


def _make_masks(seed, counts):
    """Per-instance 1/8-grid masks with given pixel counts -> full-res
    (x8 nearest-consistent) and 1/4-res (x2) versions + boxes."""
    rng = np.random.RandomState(seed)
    m8 = np.zeros((N, H8, W8), np.float32)
    for i, n in enumerate(counts):
        flat = rng.choice(H8 * W8, size=n, replace=False)
        m8[i].reshape(-1)[flat] = 1.0
    full = np.kron(m8, np.ones((8, 8), np.float32))
    quarter = np.kron(m8, np.ones((2, 2), np.float32))
    boxes = np.zeros((N, 4), np.float32)
    for i in range(N):
        ys, xs = np.nonzero(full[i])
        boxes[i] = [xs.min() / WF, ys.min() / HF, (xs.max() + 1) / WF, (ys.max() + 1) / HF]
    return m8, full, quarter, boxes


@pytest.fixture(scope="module")
def sampler_mod():
    return ref_shim.load_reference_prompt_encoder_module()


# ---------------------------------------------------------------------------
# A. sampler-level parity
# ---------------------------------------------------------------------------


def test_sampler_mask_prompt_parity(sampler_mod):
    from univs_tpu.prompts.visual_prompt import sample_visual_prompts

    torch.manual_seed(0)
    sampler = sampler_mod.VisualPromptSampler(
        hidden_dim=C, num_heads=8, num_frames=T, num_prev_frames_memory=T,
        num_dense_points=R, position_embedding_sin3d_type="ArbitraryT",
        clip_stride=1,
    )
    rng = np.random.RandomState(1)
    src = [rng.randn(h * w, T, C).astype(np.float32) for h, w in SIZES]
    pos = [rng.randn(h * w, T, C).astype(np.float32) for h, w in SIZES]
    m8, full, _, boxes = _make_masks(2, counts=[1, 3, R - 1])

    targets = [{
        "task": "sot",
        "prompt_type": "visual",
        "first_frame_idx": 0,
        "frame_indices": torch.arange(T),
        "ids": torch.arange(N),
        "first_appear_frame_idxs": torch.zeros(N, dtype=torch.long),
        "masks": torch.from_numpy(np.repeat(full[:, None], T, axis=1)),
        "boxes": torch.from_numpy(np.repeat(boxes[:, None], T, axis=1)),
    }]
    with torch.no_grad():
        pe_ref, feats_ref, _ = sampler.process_per_batch(
            [torch.from_numpy(s) for s in src],
            [torch.from_numpy(p) for p in pos],
            SIZES, targets, training=False, prompt_type="masks",
        )
    # [N, R, T, C]: first clip -> key-frame-0 sample repeated over T
    assert feats_ref.shape == (N, R, T, C)
    np.testing.assert_allclose(feats_ref[:, :, 0], feats_ref[:, :, 1], atol=0)

    ours = sample_visual_prompts(
        jnp.asarray(src[-1][:, 0].reshape(H8, W8, C)),
        jnp.asarray(pos[-1][:, 0].reshape(H8, W8, C)),
        jnp.asarray(full), jnp.asarray(boxes),
        jnp.ones((N,), bool), jnp.full((N,), 2, jnp.int32),
        R, rng=None, train=False,
    )
    assert bool(ours.valid.all())
    d_f = np.abs(np.asarray(ours.kv) - feats_ref[:, :, 0].numpy()).max()
    d_p = np.abs(np.asarray(ours.kv_pe) - pe_ref[:, :, 0].numpy()).max()
    assert d_f < TOL, f"dense feats diff {d_f}"
    assert d_p < TOL, f"dense pe diff {d_p}"
    # the memory written by the sampler equals the returned dense sets
    np.testing.assert_allclose(
        targets[0]["prompt_feats"].numpy(), feats_ref.numpy(), atol=0
    )


# ---------------------------------------------------------------------------
# B/C. decoder-level sot parity through the memory pool
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_sot_decoder(sampler_mod, tmp_path_factory):
    mod = ref_shim.load_reference_decoder_module()
    torch.manual_seed(2)
    bank = torch.randn(K, DT)
    pth = tmp_path_factory.mktemp("bank") / "cls_emb.pth"
    torch.save(bank, pth)
    mod.combined_datasets_category_info["parity_test"] = (K, 0)
    sampler = sampler_mod.VisualPromptSampler(
        hidden_dim=C, num_heads=8, num_frames=T, num_prev_frames_memory=T,
        num_dense_points=R, position_embedding_sin3d_type="ArbitraryT",
        clip_stride=1,
    )
    ref = mod.VideoMultiScaleMaskedTransformerDecoderUniVS(
        in_channels=C, mask_classification=True, num_classes=K, hidden_dim=C,
        num_queries=QL, nheads=8, dim_feedforward=128, dec_layers=LAYERS,
        pre_norm=False, mask_dim=C, enforce_input_project=False, num_frames=T,
        clip_class_embed_path=str(pth), visual_prompt_sampler=sampler,
        num_dense_points=R, text_prompt_enable=True, prompt_as_queries=True,
        text_prompt_to_image_enable=True, maskdec_self_attn_mask_type="sep",
        position_embedding_sin3d_type="ArbitraryT",
        num_prev_frames_memory=T,
    )
    ref.eval()
    return ref, bank


def _ours_decoder():
    from univs_tpu.models.decoder import UniVSDecoder

    return UniVSDecoder(
        hidden_dim=C, num_queries=QL, num_layers=LAYERS, num_heads=8,
        ffn_dim=128, pre_norm=False, mask_dim=C, text_emb_dim=DT,
        self_attn_mask_type="sep",
    )


def _clip_inputs(seed):
    torch.manual_seed(seed)
    x = [torch.randn(T, C, h, w) for h, w in SIZES]
    mask_features = torch.randn(T, C, HM, WM)
    return x, mask_features


def _to_jax(x, mask_features):
    x_j = [jnp.asarray(xi.numpy().transpose(0, 2, 3, 1)) for xi in x]
    mf_j = jnp.asarray(mask_features.numpy().transpose(0, 2, 3, 1))
    return x_j, mf_j


def _run_ours(params, x_j, mf_j, fi, pool, cls_emb, cc):
    from univs_tpu.inference import memory_pool as mp
    from univs_tpu.inference.entity import _reencode_prompts
    from univs_tpu.structures import VisualPrompts

    ours = _ours_decoder()
    grid_feats, grid_pos = ours.apply(
        {"params": params}, x_j[-1], fi, method="prompt_feature_grid"
    )
    first = fi[0, 0] == 0
    n_update = jnp.where(first, 1, T - cc.clip_stride)
    # clip_offset: in this fixture the window origin is frame 0
    pool = _reencode_prompts(
        pool, grid_feats[0], grid_pos[0], fi[0, 0], n_update, T, cc,
        first_frame=fi[0, 0],
    )
    kv, kv_pe, kv_valid = mp.read_prompt_kv(pool, cc.num_prev_frames_memory)
    L = kv.shape[1]
    queries, query_pos = mp.read_clip_queries(pool, T)
    vp = VisualPrompts(
        queries=queries[None], query_pos=query_pos[None],
        kv=jnp.broadcast_to(kv[None, :, :, None], (1, N, L, T, C)),
        kv_pe=jnp.broadcast_to(kv_pe[None, :, :, None], (1, N, L, T, C)),
        kv_valid=jnp.broadcast_to(kv_valid[None, :, :, None], (1, N, L, T)),
        valid=pool.valid[None],
    )
    out = ours.apply(
        {"params": params}, x_j, mf_j, fi, task="sot",
        visual_prompts=vp, cls_emb=cls_emb,
    )
    return out, pool


def _diff_outputs(out, out_ref, label):
    d_log = float(np.abs(np.asarray(out["pred_logits"]) - out_ref["pred_logits"].numpy()).max())
    d_msk = float(np.abs(np.asarray(out["pred_masks"]) - out_ref["pred_masks"].numpy()).max())
    d_emb = float(np.abs(np.asarray(out["pred_embds"]) - out_ref["pred_embds"].numpy()).max())
    assert d_log < TOL, f"{label} pred_logits diff {d_log}"
    assert d_msk < 10 * TOL, f"{label} pred_masks diff {d_msk}"
    assert d_emb < TOL, f"{label} pred_embds diff {d_emb}"


def test_decoder_sot_memory_pool_parity(ref_sot_decoder):
    from univs_tpu.inference import memory_pool as mp
    from univs_tpu.inference.entity import EntityClipConfig

    ref, bank = ref_sot_decoder
    sd = _sd_numpy(ref, "sem_seg_head.predictor.")
    params = convert_decoder(sd, num_layers=LAYERS)
    bank_j = jnp.asarray(bank.numpy())

    m8, full, quarter, boxes = _make_masks(5, counts=[2, 4, R - 1])
    cc = EntityClipConfig(
        num_queries=QL, num_prev_frames_memory=T, num_dense_points=R,
        clip_stride=1, num_frames=T,
    )

    # ---------------- clip 1 (frames 0..T-1) --------------------------
    x1, mf1 = _clip_inputs(7)
    masks_t = torch.zeros(N, T, HF, WF)
    masks_t[:, 0] = torch.from_numpy(full)  # only frame 0 committed (GT)
    boxes_t = torch.from_numpy(np.repeat(boxes[:, None], T, axis=1))
    targets = [{
        "task": "sot", "dataset_name": "parity_test", "prompt_type": "visual",
        "first_frame_idx": 0, "frame_indices": torch.arange(T),
        "ids": torch.arange(N),
        "first_appear_frame_idxs": torch.zeros(N, dtype=torch.long),
        "masks": masks_t.clone(), "boxes": boxes_t.clone(),
    }]
    with torch.no_grad():
        out_ref1 = ref(
            [xi.clone() for xi in x1], mf1.clone(),
            mask_features_bfe_conv=mf1.clone(), mask=None, targets=targets,
        )

    x_j, mf_j = _to_jax(x1, mf1)
    fi = jnp.arange(T)[None]
    # pool with the same committed window: GT at frame 0 as logits
    pool = mp.create_entity_memory(
        N, K, C, (HM, WM), window=T + 2, num_prompt_points=R,
        embd_history=4, prompt_history=T + 1,
    )
    pool = pool.replace(
        valid=jnp.ones((N,), bool), first_appear=jnp.zeros((N,), jnp.int32),
        mask_logits=pool.mask_logits.at[:, 0].set(jnp.asarray(quarter * 20.0 - 10.0)),
    )
    out1, pool = _run_ours(params, x_j, mf_j, fi, pool, bank_j, cc)
    _diff_outputs(out1, out_ref1, "sot clip1")

    # ---------------- clip 2 (frames 1..T) — 2-clip memory ------------
    _, full2, quarter2, boxes2 = _make_masks(11, counts=[3, 2, 5])
    x2, mf2 = _clip_inputs(13)
    # reference: annotations grown to frames 0..T; frame 1 now committed
    masks_grown = torch.zeros(N, T + 1, HF, WF)
    masks_grown[:, 0] = torch.from_numpy(full)
    masks_grown[:, 1] = torch.from_numpy(full2)
    boxes_grown = torch.zeros(N, T + 1, 4)
    boxes_grown[:, 0] = torch.from_numpy(boxes)
    boxes_grown[:, 1] = torch.from_numpy(boxes2)
    targets[0].update({
        "first_frame_idx": 1, "frame_indices": torch.arange(1, T + 1),
        "masks": masks_grown, "boxes": boxes_grown,
    })
    with torch.no_grad():
        out_ref2 = ref(
            [xi.clone() for xi in x2], mf2.clone(),
            mask_features_bfe_conv=mf2.clone(), mask=None, targets=targets,
        )

    x_j2, mf_j2 = _to_jax(x2, mf2)
    fi2 = jnp.arange(1, T + 1)[None]
    # our window holds committed frames 0..1 (frame 1 from "predictions"
    # == the forced masks), frame 2 uncommitted; no eviction yet, so the
    # clip offset equals the absolute first frame
    pool = pool.replace(
        mask_logits=pool.mask_logits.at[:, 1].set(jnp.asarray(quarter2 * 20.0 - 10.0)),
    )
    pool = mp.shift_clip(pool, 1)
    out2, pool = _run_ours(params, x_j2, mf_j2, fi2, pool, bank_j, cc)
    _diff_outputs(out2, out_ref2, "sot clip2")

    # memory content parity: ring last slots vs reference prompt tensors
    mem_ref = targets[0]["prompt_feats"].numpy()  # [N, R, T+1, C]
    Fp = pool.prompt_feats.shape[2]
    ours_mem = np.asarray(pool.prompt_feats[:, :, Fp - (T + 1):])
    np.testing.assert_allclose(ours_mem, mem_ref, atol=TOL)
