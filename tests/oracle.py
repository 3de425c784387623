"""Numpy oracle: a literal reimplementation of the reference's eviction
bookkeeping (reference easykv/easykv.py decode :242-363, encode :412-499)
over dynamically-compacted arrival-ordered buffers, tracking token positions
so retained sets can be compared against the ring-buffer engine.

The oracle and the engine are driven with identical per-(head, position)
attention weights; any divergence in retained positions, scores, or counters
flags a semantic mismatch.
"""
from __future__ import annotations

import numpy as np

ROCO_GUARD = 10


def normalize(w):
    w = np.asarray(w, dtype=np.float64)
    return w / w.sum()


class DecodeOracle:
    """Reference decode-phase state (easykv.py:242-363). Buffer width
    budget+1; scores cover generated tokens only."""

    def __init__(self, H, budget, prompt_len, policy, recent_ratio=0.3):
        W = budget + 1
        self.H, self.budget, self.P = H, budget, prompt_len
        self.policy = policy
        self.recent_window = int(budget * recent_ratio)  # 0.3 quirk applied by caller
        self.scores = np.zeros((H, W))
        self.sq = np.zeros((H, W))
        # easykv.py:244-245: cumsum(ones).flip()-1 = [budget, ..., 1, 0]
        self.counter = np.tile(np.arange(budget, -1.0, -1.0), (H, 1))
        self.positions = [[] for _ in range(H)]  # generated positions, arrival order

    def step(self, pos, weight_fn):
        """One generated token at `pos`; weight_fn(h, q_pos) -> unnormalized
        attention weight. Returns list of evicted positions per head (or [])."""
        H, P = self.H, self.P
        for h in range(H):
            self.positions[h].append(pos)
        probs_gen = []
        for h in range(H):
            vis = list(range(P)) + self.positions[h]
            p = normalize([weight_fn(h, q) for q in vis])
            probs_gen.append(p[P:])
        for h in range(H):
            pg = probs_gen[h]
            w = len(pg)
            if self.policy in ("h2o_head", "roco"):
                self.scores[h, :w] += pg
                if self.policy == "roco":
                    self.sq[h, :w] += pg**2
            elif self.policy == "tova":
                self.scores[h, :w] = pg
        n_gen = len(self.positions[0])
        if n_gen <= self.budget or self.policy == "full":
            return None
        self.counter += 1.0
        rw = self.recent_window
        evicted = []
        if self.policy == "h2o_head":
            ids = np.argmin(self.scores[:, :-rw], axis=-1)
        elif self.policy == "roco":
            with np.errstate(invalid="ignore", divide="ignore"):
                std = np.sqrt(self.sq / self.counter - (self.scores / self.counter) ** 2)
            std[:, -ROCO_GUARD:] = 1e9
            k = self.budget - rw
            ids = np.empty(self.H, dtype=int)
            for h in range(self.H):
                feas = np.argsort(std[h], kind="stable")[:k]
                avg = self.scores[h, feas] / self.counter[h, feas]
                ids[h] = feas[np.argmin(avg)]
        elif self.policy == "tova":
            ids = np.argmin(self.scores, axis=-1)
        elif self.policy == "recency":
            ids = np.zeros(self.H, dtype=int)  # oldest generated
        else:
            raise ValueError(self.policy)
        for h in range(self.H):
            i = ids[h]
            evicted.append(self.positions[h].pop(i))
            self.scores[h] = np.append(np.delete(self.scores[h], i), 0.0)
            if self.policy == "roco":
                self.sq[h] = np.append(np.delete(self.sq[h], i), 0.0)
                self.counter[h] = np.append(np.delete(self.counter[h], i), 0.0)
        return evicted


class EncodeOracle:
    """Reference strided-encoding state (easykv.py:412-499). Buffer width
    idx+stride; scores cover all cached tokens (sink included)."""

    def __init__(self, H, idx, stride, r_idx, policy, budget, recent_ratio=0.1,
                 sink=4, keep_attention=False):
        W = idx + stride
        self.H, self.idx, self.stride, self.sink = H, idx, stride, sink
        self.policy, self.budget = policy, budget
        self.recent_window = int(budget * recent_ratio)
        self.keep = keep_attention
        self.scores = np.zeros((H, W))
        self.sq = np.zeros((H, W))
        if keep_attention:
            # easykv.py:413-414: cumsum(ones).flip() - stride
            self.counter = np.tile(
                np.arange(W, 0.0, -1.0) - stride, (H, 1)
            )
        else:
            # easykv.py:416: [stride]*idx + [stride..1], minus stride
            tail = np.arange(stride, 0.0, -1.0)
            self.counter = np.tile(
                np.concatenate([np.full(idx, stride), tail]) - stride, (H, 1)
            )
        self.positions = [list(range(r_idx)) for _ in range(H)]

    def bootstrap(self, weight_fn):
        """keep_attention prefix bootstrap (h2o_head_score, easykv.py:173-186):
        per-row causal probs over the prefix, summed (and squared) per slot."""
        for h in range(self.H):
            pref = self.positions[h]
            for r in range(len(pref)):
                p = normalize([weight_fn(h, q) for q in pref[: r + 1]])
                self.scores[h, : r + 1] += p
                self.sq[h, : r + 1] += p**2

    def chunk(self, chunk_positions, weight_fn, rand_rank=None):
        H, stride, idx, sink = self.H, self.stride, self.idx, self.sink
        n_prev = len(self.positions[0])
        for h in range(H):
            self.positions[h].extend(chunk_positions)
        n_after = n_prev + stride
        update = self.keep or n_after > idx
        if update:
            for h in range(H):
                vis = self.positions[h]
                rows = []
                for r in range(stride):
                    p = normalize([weight_fn(h, q) for q in vis[: n_prev + r + 1]])
                    rows.append(np.pad(p, (0, n_after - len(p))))
                rows = np.stack(rows)
                if self.policy in ("h2o_head", "roco"):
                    self.scores[h, :n_after] += rows.sum(0)
                    if self.policy == "roco":
                        self.sq[h, :n_after] += (rows**2).sum(0)
            if self.policy == "tova":
                # head-MEAN of the last row, broadcast (easykv.py:456-457)
                last_rows = []
                for h in range(H):
                    last_rows.append(
                        normalize([weight_fn(h, q) for q in self.positions[h]])
                    )
                mean_row = np.mean(last_rows, axis=0)
                for h in range(H):
                    self.scores[h, :n_after] = mean_row
        if n_after <= idx or self.policy == "full":
            return None
        self.counter += float(stride)
        rw = self.recent_window
        evicted = []
        tail_counter = -np.arange(stride, dtype=float)  # [0,-1,...,1-stride]
        if self.policy in ("h2o_head", "tova"):
            region = self.scores[:, sink:-rw]
            for h in range(H):
                ids = sink + np.argsort(region[h], kind="stable")[:stride]
                evicted.append(self._evict(h, np.sort(ids)[::-1], tail_counter))
        elif self.policy == "roco":
            with np.errstate(invalid="ignore", divide="ignore"):
                std = np.sqrt(self.sq / self.counter - (self.scores / self.counter) ** 2)
            std[:, -ROCO_GUARD:] = 1e9
            std[:, :sink] = 1e9
            k = max(self.budget - rw - sink, stride)
            for h in range(H):
                feas = np.argsort(std[h], kind="stable")[:k]
                avg = self.scores[h, feas] / self.counter[h, feas]
                ids = feas[np.argsort(avg, kind="stable")[:stride]]
                evicted.append(self._evict(h, np.sort(ids)[::-1], tail_counter))
        elif self.policy == "recency":
            for h in range(H):
                ids = np.arange(sink, sink + stride)
                evicted.append(self._evict(h, np.sort(ids)[::-1], tail_counter))
        elif self.policy == "random":
            assert rand_rank is not None
            for h in range(H):
                ids = np.arange(rand_rank, rand_rank + stride)
                evicted.append(self._evict(h, np.sort(ids)[::-1], tail_counter))
        return evicted

    def _evict(self, h, ids_desc, tail_counter):
        out = []
        for i in ids_desc:
            out.append(self.positions[h].pop(i))
            self.scores[h] = np.append(np.delete(self.scores[h], i), np.nan)
            self.sq[h] = np.append(np.delete(self.sq[h], i), np.nan)
            self.counter[h] = np.append(np.delete(self.counter[h], i), np.nan)
        W = self.scores.shape[1]
        k = len(ids_desc)
        self.scores[h, W - k :] = 0.0
        self.sq[h, W - k :] = 0.0
        self.counter[h, W - k :] = tail_counter
        return out


class EncDecDecodeOracle:
    """Reference encoding_decoding decode-phase state (easykv.py:662-748):
    carries the encode buffers trimmed by stride-1 (easykv.py:666-669),
    scores span the whole cache (prompt included), eviction every step."""

    def __init__(self, enc: EncodeOracle, budget, recent_ratio=0.3):
        idx = enc.idx
        self.H, self.sink = enc.H, enc.sink
        self.policy, self.budget = enc.policy, budget
        self.recent_window = int(budget * recent_ratio)
        trim = enc.stride - 1
        self.scores = enc.scores[:, :-trim].copy() if trim else enc.scores.copy()
        self.sq = enc.sq[:, :-trim].copy() if trim else enc.sq.copy()
        self.counter = enc.counter[:, :-trim].copy() if trim else enc.counter.copy()
        self.positions = [list(p) for p in enc.positions]
        assert self.scores.shape[1] == len(self.positions[0]) + 1

    def step(self, pos, weight_fn, rand_rank=None):
        H = self.H
        for h in range(H):
            self.positions[h].append(pos)
        for h in range(H):
            p = normalize([weight_fn(h, q) for q in self.positions[h]])
            w = len(p)
            if self.policy in ("h2o_head", "roco"):
                self.scores[h, :w] += p
                if self.policy == "roco":
                    self.sq[h, :w] += p**2
            elif self.policy == "tova":
                self.scores[h, :w] = p
        self.counter += 1.0
        rw = self.recent_window
        evicted = []
        if self.policy == "h2o_head":
            ids = np.argmin(self.scores[:, :-rw], axis=-1)
        elif self.policy == "roco":
            with np.errstate(invalid="ignore", divide="ignore"):
                std = np.sqrt(self.sq / self.counter - (self.scores / self.counter) ** 2)
            std[:, -ROCO_GUARD:] = 1e9
            k = self.budget - rw
            ids = np.empty(H, dtype=int)
            for h in range(H):
                feas = np.argsort(std[h], kind="stable")[:k]
                avg = self.scores[h, feas] / self.counter[h, feas]
                ids[h] = feas[np.argmin(avg)]
        elif self.policy == "tova":
            ids = np.argmin(self.scores, axis=-1)
        elif self.policy == "recency":
            ids = np.full(H, self.sink)
        elif self.policy == "random":
            assert rand_rank is not None
            ids = np.full(H, self.sink + rand_rank)
        else:
            raise ValueError(self.policy)
        for h in range(H):
            i = ids[h]
            evicted.append(self.positions[h].pop(i))
            self.scores[h] = np.append(np.delete(self.scores[h], i), 0.0)
            self.sq[h] = np.append(np.delete(self.sq[h], i), 0.0)
            self.counter[h] = np.append(np.delete(self.counter[h], i), 0.0)
        return evicted
