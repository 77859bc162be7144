"""Stage-3 inter-clip ReID parity vs the REFERENCE method.

Runs the literal source of ``UniVS_Prompt_LongVideo.interclip_reid_loss``
(reference univs/univs_prompt_longvideo.py:469-526, extracted by ast —
the module itself pulls kornia/torchvision which aren't in this image)
with the reference's own contrastive losses
(univs/modeling/video_criterion.py:166-223), against
``parallel/long_video._interclip_layer_loss``.

Fixtures are built so every stochastic choice collapses:
- embeddings of the same object id are IDENTICAL, so the randperm
  anchor choice (reference :492-498) / our gumbel-max pick is
  irrelevant;
- 3 anchors x 6 kept tokens keeps the contrastive column subsample
  caps (min(20, 3N) -> 9; 0.75 -> 6 active) at or above the available
  columns, so the random subset is the full set.

Also pins the write-only-pool law: prepare_prompt_memory_pool's concat
branch is DEAD during training (early return :556-558 once
"prompt_feats" exists), so no pooled-feature replay is tested — the
rebuild intentionally has none.
"""

import ast
import math
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax
import jax.numpy as jnp

import ref_shim

REF_SRC = "/root/reference/univs/univs_prompt_longvideo.py"


def _load_reference_interclip():
    ref_shim.install()
    import importlib

    vc = importlib.import_module("univs.modeling.video_criterion")
    src = open(REF_SRC).read()
    tree = ast.parse(src)
    cls = next(n for n in tree.body if isinstance(n, ast.ClassDef)
               and n.name == "UniVS_Prompt_LongVideo")
    fn = next(n for n in cls.body if isinstance(n, ast.FunctionDef)
              and n.name == "interclip_reid_loss")
    code = ast.get_source_segment(src, fn)
    ns = {"torch": torch, "math": math, "F": F,
          "contrastive_loss": vc.contrastive_loss,
          "contrastive_aux_loss": vc.contrastive_aux_loss}
    exec("import textwrap\nexec(textwrap.dedent('''" + code.replace("\\", "\\\\").replace("'", "\\'") + "'''))", ns)
    return ns["interclip_reid_loss"]


def test_interclip_reid_matches_reference():
    from univs_tpu.parallel.long_video import _interclip_layer_loss

    interclip = _load_reference_interclip()
    rng = np.random.RandomState(0)
    C = 16
    N = 3          # objects / unique ids
    n_clips = 2
    T = 2          # kept occurrences per object per clip... see below
    L = 3          # criterion layers (reference skips l == 0)

    # per (layer, object): ONE embedding vector, reused at every kept
    # occurrence -> anchor choice can't matter
    obj_emb = rng.randn(L, N, C).astype(np.float32)

    # per clip: each object occurs in exactly 1 of the 2 frames
    # (6 kept tokens total across clips = the 0.75*cap column budget)
    occur = np.zeros((n_clips, N, T), bool)
    for c in range(n_clips):
        for n in range(N):
            occur[c, n, rng.randint(T)] = True

    # ---- reference: per-clip targets with per-layer stashes ----------
    targets_entire_video = [{
        "src_embds": [[] for _ in range(L)],
        "tgt_ids": [[] for _ in range(L)],
    }]
    torch.manual_seed(0)
    for c in range(n_clips):
        tpc = {"src_embds": [[] for _ in range(L)],
               "tgt_ids": [[] for _ in range(L)]}
        for l in range(L):
            embs, ids = [], []
            for n in range(N):
                for t in range(T):
                    if occur[c, n, t]:
                        embs.append(obj_emb[l, n])
                        ids.append(n)
            tpc["src_embds"][l].append(torch.tensor(np.stack(embs)))
            tpc["tgt_ids"][l].append(torch.tensor(ids))
        is_last = c == n_clips - 1
        out = interclip(None, is_last, [tpc], targets_entire_video)
    assert out is not None and "loss_reid_interclip" in out

    # ---- ours: fixed-slot stash [B, N, Tall, C] ----------------------
    for l in range(1, L):
        Tall = n_clips * T
        emb = np.zeros((1, N, Tall, C), np.float32)
        ids = np.full((1, N, Tall), -1, np.int64)
        for c in range(n_clips):
            for n in range(N):
                for t in range(T):
                    if occur[c, n, t]:
                        emb[0, n, c * T + t] = obj_emb[l, n]
                        ids[0, n, c * T + t] = n
        ctt, aux = _interclip_layer_loss(
            jnp.asarray(emb), jnp.asarray(ids), jnp.ones((1, N), bool),
            jax.random.PRNGKey(3),
        )
        if l == L - 1:
            ctt_ref = float(out["loss_reid_interclip"])
            aux_ref = float(out["loss_reid_interclip_aux"])
        else:
            ctt_ref = float(out[f"loss_reid_interclip_{l}"])
            aux_ref = float(out[f"loss_reid_interclip_aux_{l}"])
        assert abs(float(ctt) - ctt_ref) < 1e-5, (l, float(ctt), ctt_ref)
        assert abs(float(aux) - aux_ref) < 1e-5, (l, float(aux), aux_ref)


def test_pool_is_write_only_in_training():
    """Document-level pin: the reference's prepare_prompt_memory_pool
    early-returns once targets_entire_video carries prompt_feats, so
    its own concat branch is unreachable and later training clips never
    receive pooled features (the only decoder read is inference-gated,
    decoder_univs.py:652).  Assert the source still says so — if a
    future reference version changes this, the rebuild must too."""
    src = open(REF_SRC).read()
    body = src.split("def prepare_prompt_memory_pool", 1)[1]
    head = body.split("def ", 1)[0]
    early = head.index('if "prompt_feats" in targets_entire_video[0]:')
    concat = head.index('torch.cat')
    assert early < concat, "early return must precede the concat branch"
