"""Standalone inter-clip trackers (host-side, numpy).

Rebuilds of the reference's tracker zoo
(reference: univs/modeling/tracking/inter_clip_combiner.py:13-499
``FastOverTracker_DET``/``InterClipCombiner_SOT`` and
mdqe_overtracker_efficient.py:12-408 ``MDQE_OverTrackerEfficient``):
a memory of per-track masks/embeddings/logits matched to each new
clip's instances by cosine (+bisoftmax) similarity with spatial-IoU
gating, expanding the memory with unmatched instances.

The unified path (inference/entity.py) keeps this state on-device; the
standalone trackers here serve the non-unified drivers (fast VIS /
MDQE-style) and mirror the reference's public API.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
from scipy.optimize import linear_sum_assignment


@dataclass
class Track:
    track_id: int
    embds: List[np.ndarray] = field(default_factory=list)  # [C] per clip
    logits: List[np.ndarray] = field(default_factory=list)  # [K]
    masks: Dict[int, np.ndarray] = field(default_factory=dict)  # frame -> mask logits
    last_frame: int = -1

    def mean_embd(self, last: int = 3) -> np.ndarray:
        e = np.stack(self.embds[-last:])
        e = e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-6)
        return e.mean(0)

    def score(self) -> np.ndarray:
        return np.mean(self.logits, axis=0)


class FastOverTracker:
    """Memory tracker with cosine similarity + spatial-IoU gating
    (reference: inter_clip_combiner.py:13-370 — cosine+ctt similarity
    :352-372, siou gating :173)."""

    def __init__(self, match_threshold: float = 0.3, siou_gate: float = 0.1,
                 new_score_thres: float = 0.25, max_tracks: int = 200):
        self.match_threshold = match_threshold
        self.siou_gate = siou_gate
        self.new_score_thres = new_score_thres
        self.max_tracks = max_tracks
        self.tracks: Dict[int, Track] = {}
        self._next = 0

    def _similarity(self, cand_embds: np.ndarray, cand_masks: np.ndarray,
                    frame_start: int) -> np.ndarray:
        tids = list(self.tracks)
        if not tids:
            return np.zeros((0, len(cand_embds)))
        mem = np.stack([self.tracks[t].mean_embd() for t in tids])
        ce = cand_embds / np.maximum(np.linalg.norm(cand_embds, axis=-1, keepdims=True), 1e-6)
        cos = mem @ ce.T  # [T, N]
        bisoft = (softmax(cos, 0) + softmax(cos, 1)) / 2
        sim = 0.5 * (cos + bisoft)
        # spatial-IoU gate on overlapping frames
        for ti, t in enumerate(tids):
            tr = self.tracks[t]
            for ci in range(len(cand_embds)):
                siou = _mask_overlap(tr, cand_masks[ci], frame_start)
                if siou is not None and siou < self.siou_gate:
                    sim[ti, ci] = -1.0
        return sim

    def update(self, frame_start: int, embds: np.ndarray, logits: np.ndarray,
               masks: np.ndarray):
        """embds [N, C]; logits [N, K] (sigmoid scores); masks [N, T, h, w]
        mask logits for frames [frame_start, frame_start+T)."""
        N = embds.shape[0]
        tids = list(self.tracks)
        sim = self._similarity(embds, masks, frame_start)
        assigned = np.full(N, -1, np.int64)
        if sim.size:
            ri, ci = linear_sum_assignment(-sim)
            for a, b in zip(ri, ci):
                if sim[a, b] >= self.match_threshold:
                    assigned[b] = tids[a]
        for ci in range(N):
            tid = assigned[ci]
            if tid < 0:
                if logits[ci].max() < self.new_score_thres or len(self.tracks) >= self.max_tracks:
                    continue
                tid = self._next
                self._next += 1
                self.tracks[tid] = Track(tid)
            tr = self.tracks[tid]
            tr.embds.append(embds[ci])
            tr.logits.append(logits[ci])
            for t in range(masks.shape[1]):
                f = frame_start + t
                if f in tr.masks:
                    tr.masks[f] = (tr.masks[f] + masks[ci, t]) / 2  # overlap averaging
                else:
                    tr.masks[f] = masks[ci, t]
            tr.last_frame = frame_start + masks.shape[1] - 1

    def results(self, video_len: int, topk: int = 25) -> List[Dict]:
        out = []
        for tr in self.tracks.values():
            score = tr.score()
            out.append({
                "track_id": tr.track_id,
                "score": score,
                "category_id": int(score.argmax()),
                "masks": {f: m for f, m in tr.masks.items() if f < video_len},
            })
        out.sort(key=lambda r: -float(np.max(r["score"])))
        return out[:topk]


class MDQEOverTracker(FastOverTracker):
    """MDQE-style over-tracker: inter-clip matching driven primarily by
    clip-overlap mask IoU with embedding similarity as a tie-breaker,
    plus inactive-track score decay
    (reference: univs/modeling/tracking/mdqe_overtracker_efficient.py:
    12-408, simplified — the reference additionally keeps per-frame
    score memories; here scores decay exponentially while unmatched).
    """

    def __init__(self, match_threshold: float = 0.2, decay: float = 0.9,
                 new_score_thres: float = 0.25, max_tracks: int = 200):
        super().__init__(match_threshold=match_threshold, siou_gate=0.0,
                         new_score_thres=new_score_thres, max_tracks=max_tracks)
        self.decay = decay
        self._activity: Dict[int, float] = {}

    def _similarity(self, cand_embds, cand_masks, frame_start):
        tids = list(self.tracks)
        if not tids:
            return np.zeros((0, len(cand_embds)))
        sim = np.zeros((len(tids), len(cand_embds)))
        mem = np.stack([self.tracks[t].mean_embd() for t in tids])
        ce = cand_embds / np.maximum(np.linalg.norm(cand_embds, axis=-1, keepdims=True), 1e-6)
        cos = mem @ ce.T
        for ti, t in enumerate(tids):
            tr = self.tracks[t]
            act = self._activity.get(t, 1.0)
            for ci in range(len(cand_embds)):
                siou = _mask_overlap(tr, cand_masks[ci], frame_start)
                base = siou if siou is not None else 0.3 * cos[ti, ci]
                sim[ti, ci] = act * (0.7 * base + 0.3 * cos[ti, ci])
        return sim

    def update(self, frame_start, embds, logits, masks):
        before = set(self.tracks)
        super().update(frame_start, embds, logits, masks)
        last = frame_start + masks.shape[1] - 1
        for t, tr in self.tracks.items():
            if tr.last_frame >= last:
                self._activity[t] = 1.0
            else:
                self._activity[t] = self._activity.get(t, 1.0) * self.decay


def softmax(x: np.ndarray, axis: int) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / np.maximum(e.sum(axis=axis, keepdims=True), 1e-9)


def _mask_overlap(track: Track, cand_mask: np.ndarray, frame_start: int) -> Optional[float]:
    """IoU between the track's stored masks and a candidate on shared frames."""
    ious = []
    for t in range(cand_mask.shape[0]):
        f = frame_start + t
        if f in track.masks:
            a = track.masks[f] > 0
            b = cand_mask[t] > 0
            u = np.logical_or(a, b).sum()
            if u > 0:
                ious.append(np.logical_and(a, b).sum() / u)
    return float(np.mean(ious)) if ious else None
