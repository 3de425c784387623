"""Independent torch reimplementation of the reference's budgeted teacher-
forced perplexity algorithm (reference easykv/easykv.py:766-901,
keep_attention=False path), operating on an HF LlamaForCausalLM with eager
attention and DynamicCache surgery.

Used by test_cross_impl.py to validate the ENTIRE jax engine (budget
alignment, chunked feeding, GQA score updates, eviction, CE accounting)
against a second implementation running the same weights.
"""
from __future__ import annotations

import math

import torch


def _chunk_causal_mask(past_len, stride):
    """Explicit 4D additive mask: full visibility of the (compacted) cache +
    causal within the chunk. HF>=4.5x builds its default mask from
    cache_position vs kv *indices*, which leaks future intra-chunk attention
    once eviction opens a gap between true positions and cache length; the
    original reference ran HF 4.36 whose mask was index-causal (correct)."""
    m = torch.zeros(stride, past_len + stride)
    tri = torch.triu(torch.ones(stride, stride, dtype=torch.bool), diagonal=1)
    block = torch.zeros(stride, stride)
    block[tri] = torch.finfo(torch.float32).min
    m[:, past_len:] = block
    return m[None, None]


def _gqa_mean(attn, n_kv, rep):
    # (1, Hq, q, k) -> (Hkv, q, k), mean over the rep group (easykv.py:188-196)
    bs, hq, q, kk = attn.shape
    return attn.reshape(n_kv, rep, q, kk).mean(dim=1)


def _evict_liso(pkv, eviction_ids):
    # per-head mask-gather compaction (reference truncate_kv_cache_liso,
    # easykv.py:70-82) on a 4.57 DynamicCache
    for l, layer in enumerate(pkv.layers):
        k, v = layer.keys, layer.values         # (1, Hkv, S, D)
        H, S, D = k.shape[1], k.shape[2], k.shape[3]
        mask = torch.ones(H, S, dtype=torch.bool)
        mask.scatter_(1, eviction_ids[l], False)
        layer.keys = k[0][mask].view(1, H, -1, D)
        layer.values = v[0][mask].view(1, H, -1, D)


def reference_budgeted_ppl(
    model, input_ids, budget=0.5, stride=4, policy="roco",
    recent_ratio=0.1, sink_length=4,
):
    """Returns (ppl, retained_positions) — retained_positions is the per
    (layer, head) set of original token indices left in the cache, tracked
    alongside the reference algorithm for stronger comparison."""
    from transformers import DynamicCache

    cfg = model.config
    L = cfg.num_hidden_layers
    Hkv = cfg.num_key_value_heads
    rep = cfg.num_attention_heads // Hkv
    length = input_ids.shape[-1]

    if isinstance(budget, float):
        budget = int(length * budget) + stride
    else:
        budget = int(budget) + stride
    idx = 0
    for i in range(budget, -1, -1):
        if (length - i) % stride == 0:
            idx = i
            break
    r_idx = idx - 1 if idx >= 1 else 0
    for r in range(1, idx):
        if (idx - r) % stride == 0:
            r_idx = r
            break
    recent_window = int(budget * recent_ratio)

    pkv = DynamicCache()
    with torch.no_grad():
        out = model(input_ids=input_ids[:, :r_idx], use_cache=True,
                    past_key_values=pkv)
    pkv = out.past_key_values

    W = idx + stride
    scores = torch.zeros(L, Hkv, W)
    scores_sq = torch.zeros(L, Hkv, W)
    counter = torch.cat([
        torch.full((idx,), float(stride)),
        torch.arange(stride, 0, -1, dtype=torch.float32),
    ]) - float(stride)
    counter = counter.unsqueeze(0).unsqueeze(0).repeat(L, Hkv, 1).clone()

    # per-(layer, head) original positions currently cached, in buffer order
    positions = [[list(range(r_idx)) for _ in range(Hkv)] for _ in range(L)]

    all_logits, all_ids = [], []
    cur_pos = r_idx
    for token_i in range(r_idx, length, stride):
        chunk = input_ids[:, token_i : token_i + stride]
        pos_ids = torch.arange(cur_pos, cur_pos + stride).unsqueeze(0)
        past_len = pkv.layers[0].keys.shape[2] if pkv.layers else 0
        with torch.no_grad():
            out = model(
                input_ids=chunk, past_key_values=pkv, use_cache=True,
                output_attentions=True, position_ids=pos_ids,
                cache_position=pos_ids[0],
                attention_mask=_chunk_causal_mask(past_len, stride),
            )
        pkv = out.past_key_values
        all_logits.append(out.logits[0])
        all_ids.append(chunk[0])
        for l in range(L):
            for h in range(Hkv):
                positions[l][h].extend(range(token_i, token_i + stride))

        cur_kv = pkv.layers[0].keys.shape[2]
        attn = [_gqa_mean(a.float(), Hkv, rep) for a in out.attentions]
        if cur_kv > idx:
            if policy in ("h2o_head", "roco"):
                for l in range(L):
                    am = attn[l].sum(dim=1)                     # (Hkv, S)
                    scores[l, :, : am.shape[-1]] += am
                    if policy == "roco":
                        scores_sq[l, :, : am.shape[-1]] += (attn[l] ** 2).sum(dim=1)
            elif policy == "tova":
                for l in range(L):
                    am = attn[l][:, -1, :].mean(dim=0).unsqueeze(0).repeat(Hkv, 1)
                    scores[l, :, : am.shape[-1]] = am

            counter += float(stride)
            if policy in ("h2o_head", "tova"):
                ev = torch.topk(scores[:, :, sink_length:-recent_window],
                                dim=-1, k=stride, largest=False)[1] + sink_length
            elif policy == "roco":
                std = torch.sqrt(scores_sq / counter - (scores / counter) ** 2)
                std[:, :, -10:] = 1e9
                std[:, :, :sink_length] = 1e9
                k1 = max(budget - recent_window - sink_length, stride)
                feas = torch.topk(std, largest=False, k=k1, dim=-1)[1]
                avg = scores.gather(-1, feas) / counter.gather(-1, feas)
                inner = torch.topk(avg, dim=-1, largest=False, k=stride)[1]
                ev = feas.gather(-1, inner)
            elif policy == "recency":
                ev = (sink_length + torch.arange(stride)).view(1, 1, -1).repeat(L, Hkv, 1)
            else:
                raise ValueError(policy)
            _evict_liso(pkv, ev)
            for l in range(L):
                for h in range(Hkv):
                    for i in sorted(ev[l, h].tolist(), reverse=True):
                        positions[l][h].pop(i)
            # compact score buffers with the same mask, append zero tails
            ones = torch.ones(L * Hkv, W)
            src = torch.zeros(L * Hkv, stride)
            mask = ones.scatter(-1, ev.view(L * Hkv, -1).to(torch.int64), src).bool()
            tail_c = (torch.arange(stride) - stride + 1).flip(0).float()
            scores = torch.cat([
                scores.view(-1, W)[mask].view(L, Hkv, -1),
                torch.zeros(L, Hkv, stride)], dim=-1)
            scores_sq = torch.cat([
                scores_sq.view(-1, W)[mask].view(L, Hkv, -1),
                torch.zeros(L, Hkv, stride)], dim=-1)
            counter = torch.cat([
                counter.view(-1, W)[mask].view(L, Hkv, -1),
                tail_c.view(1, 1, -1).repeat(L, Hkv, 1)], dim=-1)
        cur_pos += stride

    ids_cat = torch.cat(all_ids)
    logits_cat = torch.cat(all_logits, dim=0)
    loss = torch.nn.CrossEntropyLoss(reduction="none")(
        logits_cat[:-1], ids_cat[1:]
    )
    retained = {
        (l, h): sorted(positions[l][h]) for l in range(L) for h in range(Hkv)
    }
    return math.exp(loss.mean().item()), retained


def reference_decode_greedy(
    model, input_ids, budget, policy="roco", max_new_tokens=16,
):
    """The reference's decode-phase loop (easykv.py:228-366): greedy
    sampling, per-step silo eviction over the generated region only, decode
    recent_ratio hard-coded to 0.3. Returns the generated token list."""
    from transformers import DynamicCache

    cfg = model.config
    L = cfg.num_hidden_layers
    Hkv = cfg.num_key_value_heads
    rep = cfg.num_attention_heads // Hkv
    P = input_ids.shape[-1]

    pkv = DynamicCache()
    with torch.no_grad():
        out = model(input_ids=input_ids, use_cache=True, past_key_values=pkv)
    pkv = out.past_key_values
    logits_prev = out.logits[:, -1, :]

    W = budget + 1
    scores = torch.zeros(L, Hkv, W)
    scores_sq = torch.zeros(L, Hkv, W)
    counter = torch.arange(budget, -1.0, -1.0).view(1, 1, -1).repeat(L, Hkv, 1).clone()
    out_ids = []
    cur_pos = P
    recent_window = int(budget * 0.3)  # easykv.py:308

    for _ in range(max_new_tokens):
        tok = int(logits_prev.argmax(-1)[0])
        out_ids.append(tok)
        with torch.no_grad():
            o = model(
                input_ids=torch.tensor([[tok]]), past_key_values=pkv,
                use_cache=True, output_attentions=True,
                position_ids=torch.tensor([[cur_pos]]),
                cache_position=torch.tensor([cur_pos]),
            )
        pkv = o.past_key_values
        logits_prev = o.logits[:, -1, :]
        attn = [_gqa_mean(a.float(), Hkv, rep) for a in o.attentions]
        for l in range(L):
            am = attn[l][:, 0, P:]                    # generated region
            if policy in ("h2o_head", "roco"):
                scores[l, :, : am.shape[-1]] += am
                if policy == "roco":
                    scores_sq[l, :, : am.shape[-1]] += am ** 2
            elif policy == "tova":
                scores[l, :, : am.shape[-1]] = am
        cur_kv = pkv.layers[0].keys.shape[2]
        if cur_kv - P > budget:
            counter += 1.0
            if policy == "h2o_head":
                ev = torch.argmin(scores[:, :, :-recent_window], dim=-1)
            elif policy == "roco":
                std = torch.sqrt(scores_sq / counter - (scores / counter) ** 2)
                std[:, :, -10:] = 1e9
                feas = torch.topk(std, largest=False, k=budget - recent_window,
                                  dim=-1)[1]
                avg = scores.gather(-1, feas) / counter.gather(-1, feas)
                ev = feas.gather(-1, avg.argmin(-1, keepdim=True)).squeeze(-1)
            elif policy == "tova":
                ev = scores.argmin(dim=-1)
            elif policy == "recency":
                ev = torch.zeros(L, Hkv, dtype=torch.int64)
            else:
                raise ValueError(policy)
            ev_abs = ev + P
            _evict_liso(pkv, ev_abs.unsqueeze(-1))
            # compact score buffers, append zero columns
            idxs = torch.arange(W).view(1, 1, -1).repeat(L, Hkv, 1)
            mask = (ev.unsqueeze(-1) != idxs).view(-1, W)
            def compact(t):
                return torch.cat([
                    t.view(-1, W)[mask].view(L, Hkv, W - 1),
                    torch.zeros(L, Hkv, 1)], dim=-1)
            scores = compact(scores)
            if policy == "roco":
                scores_sq = compact(scores_sq)
                counter = compact(counter)
        cur_pos += 1
    return out_ids


def reference_encoding_greedy(
    model, input_ids, budget=0.5, stride=4, policy="roco",
    recent_ratio=0.1, sink_length=4, max_new_tokens=16,
    keep_attention=False,
):
    """The reference's encoding mode (easykv.py:367-529): strided prefill
    with per-chunk eviction, then plain greedy decode WITHOUT eviction.
    keep_attention=False path. Returns generated tokens."""
    from transformers import DynamicCache

    cfg = model.config
    L = cfg.num_hidden_layers
    Hkv = cfg.num_key_value_heads
    rep = cfg.num_attention_heads // Hkv
    length = input_ids.shape[-1]

    if isinstance(budget, float):
        budget = int(length * budget) + stride
    else:
        budget = int(budget) + stride
    idx = 0
    for i in range(budget, -1, -1):
        if (length - i) % stride == 0:
            idx = i
            break
    # encoding uses the DESCENDING scan (easykv.py:391-392)
    r_idx = 0
    for r in range(idx - 1, -1, -1):
        if (idx - r) % stride == 0:
            r_idx = r
            break
    recent_window = int(budget * recent_ratio)

    pkv = DynamicCache()
    with torch.no_grad():
        out = model(input_ids=input_ids[:, :r_idx], use_cache=True,
                    past_key_values=pkv,
                    output_attentions=keep_attention)
    pkv = out.past_key_values
    logits_prev = out.logits[:, -1, :]

    W = idx + stride
    scores = torch.zeros(L, Hkv, W)
    scores_sq = torch.zeros(L, Hkv, W)
    if keep_attention:
        # h2o_head_score bootstrap (easykv.py:173-186): per-row prob sums
        # (and squares) from the prefix attention maps
        for l, a in enumerate(out.attentions):
            am = _gqa_mean(a.float(), Hkv, rep)       # (Hkv, r_idx, r_idx)
            scores[l, :, :r_idx] = am.sum(dim=1)
            scores_sq[l, :, :r_idx] = (am ** 2).sum(dim=1)
        # counter init (easykv.py:413-414): cumsum(ones).flip() - stride
        counter = (torch.arange(W, 0, -1, dtype=torch.float32) - float(stride))
        counter = counter.unsqueeze(0).unsqueeze(0).repeat(L, Hkv, 1).clone()
    else:
        counter = torch.cat([
            torch.full((idx,), float(stride)),
            torch.arange(stride, 0, -1, dtype=torch.float32),
        ]) - float(stride)
        counter = counter.unsqueeze(0).unsqueeze(0).repeat(L, Hkv, 1).clone()

    cur_pos = r_idx
    for token_i in range(r_idx, length, stride):
        chunk = input_ids[:, token_i : token_i + stride]
        pos_ids = torch.arange(cur_pos, cur_pos + stride).unsqueeze(0)
        past_len = pkv.layers[0].keys.shape[2] if pkv.layers else 0
        with torch.no_grad():
            out = model(input_ids=chunk, past_key_values=pkv, use_cache=True,
                        output_attentions=True, position_ids=pos_ids,
                        cache_position=pos_ids[0],
                        attention_mask=_chunk_causal_mask(past_len, stride))
        pkv = out.past_key_values
        logits_prev = out.logits[:, -1, :]
        cur_kv = pkv.layers[0].keys.shape[2]
        attn = [_gqa_mean(a.float(), Hkv, rep) for a in out.attentions]
        if cur_kv > idx or keep_attention:
            # score updates also run during the grow phase when
            # keep_attention (reference easykv.py:443)
            if policy in ("h2o_head", "roco"):
                for l in range(L):
                    am = attn[l].sum(dim=1)
                    scores[l, :, : am.shape[-1]] += am
                    if policy == "roco":
                        scores_sq[l, :, : am.shape[-1]] += (attn[l] ** 2).sum(dim=1)
            elif policy == "tova":
                for l in range(L):
                    am = attn[l][:, -1, :].mean(dim=0).unsqueeze(0).repeat(Hkv, 1)
                    scores[l, :, : am.shape[-1]] = am
        if cur_kv > idx:
            # eviction only once over budget (reference easykv.py:459)
            counter += float(stride)
            if policy in ("h2o_head", "tova"):
                ev = torch.topk(scores[:, :, sink_length:-recent_window],
                                dim=-1, k=stride, largest=False)[1] + sink_length
            elif policy == "roco":
                std = torch.sqrt(scores_sq / counter - (scores / counter) ** 2)
                std[:, :, -10:] = 1e9
                std[:, :, :sink_length] = 1e9
                k1 = max(budget - recent_window - sink_length, stride)
                feas = torch.topk(std, largest=False, k=k1, dim=-1)[1]
                avg = scores.gather(-1, feas) / counter.gather(-1, feas)
                inner = torch.topk(avg, dim=-1, largest=False, k=stride)[1]
                ev = feas.gather(-1, inner)
            elif policy == "recency":
                ev = (sink_length + torch.arange(stride)).view(1, 1, -1).repeat(L, Hkv, 1)
            else:
                raise ValueError(policy)
            _evict_liso(pkv, ev)
            ones = torch.ones(L * Hkv, W)
            src = torch.zeros(L * Hkv, stride)
            mask = ones.scatter(-1, ev.view(L * Hkv, -1).to(torch.int64), src).bool()
            tail_c = (torch.arange(stride) - stride + 1).flip(0).float()
            scores = torch.cat([scores.view(-1, W)[mask].view(L, Hkv, -1),
                                torch.zeros(L, Hkv, stride)], dim=-1)
            scores_sq = torch.cat([scores_sq.view(-1, W)[mask].view(L, Hkv, -1),
                                   torch.zeros(L, Hkv, stride)], dim=-1)
            counter = torch.cat([counter.view(-1, W)[mask].view(L, Hkv, -1),
                                 tail_c.view(1, 1, -1).repeat(L, Hkv, 1)], dim=-1)
        cur_pos += stride

    # plain decode, NO eviction (easykv.py:508-526); cur_pos_id reset to length
    cur_pos = length
    out_ids = []
    for _ in range(max_new_tokens):
        tok = int(logits_prev.argmax(-1)[0])
        out_ids.append(tok)
        with torch.no_grad():
            o = model(input_ids=torch.tensor([[tok]]), past_key_values=pkv,
                      use_cache=True, position_ids=torch.tensor([[cur_pos]]),
                      cache_position=torch.tensor([cur_pos]))
        pkv = o.past_key_values
        logits_prev = o.logits[:, -1, :]
        cur_pos += 1
    return out_ids


def reference_encdec_greedy(
    model, input_ids, budget, stride=4, policy="roco",
    recent_ratio=0.1, sink_length=4, max_new_tokens=12,
):
    """The reference's encoding_decoding mode (easykv.py:530-753): int
    budget (+stride unless >= length), tiny ascending-scan prefix, strided
    prefill eviction, then decode with per-step silo eviction over the WHOLE
    cache (prompt included), decode recent_ratio hard-coded 0.3."""
    from transformers import DynamicCache

    cfg = model.config
    L = cfg.num_hidden_layers
    Hkv = cfg.num_key_value_heads
    rep = cfg.num_attention_heads // Hkv
    length = input_ids.shape[-1]

    budget = int(budget) + stride
    if budget >= length:
        budget -= stride
    idx = 0
    for i in range(budget, -1, -1):
        if (length - i) % stride == 0:
            idx = i
            break
    r_idx = idx - 1 if idx >= 1 else 0
    for r in range(1, idx):
        if (idx - r) % stride == 0:
            r_idx = r
            break
    recent_window = int(budget * recent_ratio)

    pkv = DynamicCache()
    with torch.no_grad():
        out = model(input_ids=input_ids[:, :r_idx], use_cache=True,
                    past_key_values=pkv)
    pkv = out.past_key_values
    logits_prev = out.logits[:, -1, :]

    W = idx + stride
    scores = torch.zeros(L, Hkv, W)
    scores_sq = torch.zeros(L, Hkv, W)
    counter = torch.cat([
        torch.full((idx,), float(stride)),
        torch.arange(stride, 0, -1, dtype=torch.float32),
    ]) - float(stride)
    counter = counter.unsqueeze(0).unsqueeze(0).repeat(L, Hkv, 1).clone()

    cur_pos = r_idx
    for token_i in range(r_idx, length, stride):
        chunk = input_ids[:, token_i : token_i + stride]
        pos_ids = torch.arange(cur_pos, cur_pos + stride).unsqueeze(0)
        past_len = pkv.layers[0].keys.shape[2] if pkv.layers else 0
        with torch.no_grad():
            out = model(input_ids=chunk, past_key_values=pkv, use_cache=True,
                        output_attentions=True, position_ids=pos_ids,
                        cache_position=pos_ids[0],
                        attention_mask=_chunk_causal_mask(past_len, stride))
        pkv = out.past_key_values
        logits_prev = out.logits[:, -1, :]
        cur_kv = pkv.layers[0].keys.shape[2]
        attn = [_gqa_mean(a.float(), Hkv, rep) for a in out.attentions]
        if cur_kv > idx:
            if policy in ("h2o_head", "roco"):
                for l in range(L):
                    am = attn[l].sum(dim=1)
                    scores[l, :, : am.shape[-1]] += am
                    if policy == "roco":
                        scores_sq[l, :, : am.shape[-1]] += (attn[l] ** 2).sum(dim=1)
            elif policy == "tova":
                for l in range(L):
                    am = attn[l][:, -1, :].mean(dim=0).unsqueeze(0).repeat(Hkv, 1)
                    scores[l, :, : am.shape[-1]] = am
            counter += float(stride)
            if policy == "tova":
                ev = torch.topk(scores[:, :, sink_length:-recent_window],
                                dim=-1, k=stride, largest=False)[1] + sink_length
            elif policy == "roco":
                std = torch.sqrt(scores_sq / counter - (scores / counter) ** 2)
                std[:, :, -10:] = 1e9
                std[:, :, :sink_length] = 1e9
                k1 = max(budget - recent_window - sink_length, stride)
                feas = torch.topk(std, largest=False, k=k1, dim=-1)[1]
                avg = scores.gather(-1, feas) / counter.gather(-1, feas)
                inner = torch.topk(avg, dim=-1, largest=False, k=stride)[1]
                ev = feas.gather(-1, inner)
            elif policy == "recency":
                ev = (sink_length + torch.arange(stride)).view(1, 1, -1).repeat(L, Hkv, 1)
            else:
                raise ValueError(policy)
            _evict_liso(pkv, ev)
            ones = torch.ones(L * Hkv, W)
            src = torch.zeros(L * Hkv, stride)
            mask = ones.scatter(-1, ev.view(L * Hkv, -1).to(torch.int64), src).bool()
            tail_c = (torch.arange(stride) - stride + 1).flip(0).float()
            scores = torch.cat([scores.view(-1, W)[mask].view(L, Hkv, -1),
                                torch.zeros(L, Hkv, stride)], dim=-1)
            scores_sq = torch.cat([scores_sq.view(-1, W)[mask].view(L, Hkv, -1),
                                   torch.zeros(L, Hkv, stride)], dim=-1)
            counter = torch.cat([counter.view(-1, W)[mask].view(L, Hkv, -1),
                                 tail_c.view(1, 1, -1).repeat(L, Hkv, 1)], dim=-1)
        cur_pos += stride

    # trim by stride-1 (easykv.py:666-669) then decode with per-step eviction
    if stride > 1:
        scores = scores[:, :, : -(stride - 1)]
        scores_sq = scores_sq[:, :, : -(stride - 1)]
        counter = counter[:, :, : -(stride - 1)]
    W2 = scores.shape[-1]
    cur_pos = length
    recent_window = int(budget * 0.3)  # easykv.py:709-710
    out_ids = []
    for _ in range(max_new_tokens):
        tok = int(logits_prev.argmax(-1)[0])
        out_ids.append(tok)
        with torch.no_grad():
            o = model(input_ids=torch.tensor([[tok]]), past_key_values=pkv,
                      use_cache=True, output_attentions=True,
                      position_ids=torch.tensor([[cur_pos]]),
                      cache_position=torch.tensor([cur_pos]))
        pkv = o.past_key_values
        logits_prev = o.logits[:, -1, :]
        attn = [_gqa_mean(a.float(), Hkv, rep) for a in o.attentions]
        for l in range(L):
            am = attn[l][:, 0, :]
            if policy == "roco":
                scores[l, :, : am.shape[-1]] += am
                scores_sq[l, :, : am.shape[-1]] += am ** 2
            elif policy == "tova":
                scores[l, :, : am.shape[-1]] = am
        counter += 1.0
        if policy == "roco":
            std = torch.sqrt(scores_sq / counter - (scores / counter) ** 2)
            std[:, :, -10:] = 1e9
            feas = torch.topk(std, largest=False, k=budget - recent_window,
                              dim=-1)[1]
            avg = scores.gather(-1, feas) / counter.gather(-1, feas)
            ev = feas.gather(-1, avg.argmin(-1, keepdim=True)).squeeze(-1)
        elif policy == "tova":
            ev = scores.argmin(dim=-1)
        elif policy == "recency":
            ev = torch.full((L, Hkv), sink_length, dtype=torch.int64)
        else:
            raise ValueError(policy)
        _evict_liso(pkv, ev.unsqueeze(-1))
        idxs = torch.arange(W2).view(1, 1, -1).repeat(L, Hkv, 1)
        mask = (ev.unsqueeze(-1) != idxs).view(-1, W2)
        def compact(t, fill=0.0):
            return torch.cat([t.view(-1, W2)[mask].view(L, Hkv, W2 - 1),
                              torch.full((L, Hkv, 1), fill)], dim=-1)
        scores = compact(scores)
        if policy == "roco":
            scores_sq = compact(scores_sq)
            counter = compact(counter)
        cur_pos += 1
    return out_ids


def _manual_stream_step(model, tok, pkv, attn_out_probs):
    """One streaming decode step, faithful to the reference's
    llama_forward_stream (reference llama_patch.py:251-379): the new K/V are
    appended to the cache PRE-RoPE, then the ENTIRE cached K is re-rotated
    with key positions arange(cache_len) (cache-relative), and the query is
    rotated at position prev_len = cache_len - 1. Note the reference's
    prefill runs UNPATCHED (easykv.py:232 before :253-256), so prompt keys
    enter the cache already rotated at their true positions and get rotated
    a second time here — reproduced as-is for parity.

    Returns logits (1, V); appends each layer's fp32 attention row
    (1, Hq, 1, S) to attn_out_probs.
    """
    from transformers.models.llama.modeling_llama import repeat_kv, rotate_half

    cfg = model.config
    Hq = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    D = getattr(cfg, "head_dim", cfg.hidden_size // Hq)
    rep = Hq // Hkv
    h = model.model.embed_tokens(tok)
    for l, layer in enumerate(model.model.layers):
        x = layer.input_layernorm(h)
        q = layer.self_attn.q_proj(x).view(1, 1, Hq, D).transpose(1, 2)
        k = layer.self_attn.k_proj(x).view(1, 1, Hkv, D).transpose(1, 2)
        v = layer.self_attn.v_proj(x).view(1, 1, Hkv, D).transpose(1, 2)
        keys = torch.cat([pkv.layers[l].keys, k], dim=2)   # pre-RoPE append
        vals = torch.cat([pkv.layers[l].values, v], dim=2)
        pkv.layers[l].keys = keys
        pkv.layers[l].values = vals
        S = keys.shape[2]
        pos_k = torch.arange(S)[None]
        cos_k, sin_k = model.model.rotary_emb(vals, pos_k)
        k_rot = keys * cos_k.unsqueeze(1) + rotate_half(keys) * sin_k.unsqueeze(1)
        pos_q = torch.tensor([[S - 1]])
        cos_q, sin_q = model.model.rotary_emb(vals, pos_q)
        q_rot = q * cos_q.unsqueeze(1) + rotate_half(q) * sin_q.unsqueeze(1)
        kr = repeat_kv(k_rot, rep)
        vr = repeat_kv(vals, rep)
        w = (q_rot @ kr.transpose(2, 3)) / math.sqrt(D)
        w = torch.softmax(w, dim=-1, dtype=torch.float32)
        attn_out_probs.append(w)
        o = (w.to(q.dtype) @ vr).transpose(1, 2).reshape(1, 1, -1)
        h = h + layer.self_attn.o_proj(o)
        h = h + layer.mlp(layer.post_attention_layernorm(h))
    h = model.model.norm(h)
    return model.lm_head(h)[:, -1, :]


def reference_decode_stream_greedy(
    model, input_ids, budget, policy="roco", max_new_tokens=16,
):
    """The reference's decode loop with streaming=True (easykv.py:228-366
    with llama_forward_stream patched in): stock prefill, then cache-relative
    RoPE decode with per-step silo eviction over the generated region."""
    from transformers import DynamicCache

    cfg = model.config
    L = cfg.num_hidden_layers
    Hkv = cfg.num_key_value_heads
    rep = cfg.num_attention_heads // Hkv
    P = input_ids.shape[-1]

    pkv = DynamicCache()
    with torch.no_grad():
        out = model(input_ids=input_ids, use_cache=True, past_key_values=pkv)
    pkv = out.past_key_values
    logits_prev = out.logits[:, -1, :]

    W = budget + 1
    scores = torch.zeros(L, Hkv, W)
    scores_sq = torch.zeros(L, Hkv, W)
    counter = torch.arange(budget, -1.0, -1.0).view(1, 1, -1).repeat(L, Hkv, 1).clone()
    out_ids = []
    recent_window = int(budget * 0.3)  # easykv.py:308

    for _ in range(max_new_tokens):
        tok = int(logits_prev.argmax(-1)[0])
        out_ids.append(tok)
        attns_raw = []
        with torch.no_grad():
            logits_prev = _manual_stream_step(
                model, torch.tensor([[tok]]), pkv, attns_raw
            )
        attn = [_gqa_mean(a, Hkv, rep) for a in attns_raw]
        for l in range(L):
            am = attn[l][:, 0, P:]
            if policy in ("h2o_head", "roco"):
                scores[l, :, : am.shape[-1]] += am
                if policy == "roco":
                    scores_sq[l, :, : am.shape[-1]] += am ** 2
            elif policy == "tova":
                scores[l, :, : am.shape[-1]] = am
        cur_kv = pkv.layers[0].keys.shape[2]
        if cur_kv - P > budget:
            counter += 1.0
            if policy == "h2o_head":
                ev = torch.argmin(scores[:, :, :-recent_window], dim=-1)
            elif policy == "roco":
                std = torch.sqrt(scores_sq / counter - (scores / counter) ** 2)
                std[:, :, -10:] = 1e9
                feas = torch.topk(std, largest=False, k=budget - recent_window,
                                  dim=-1)[1]
                avg = scores.gather(-1, feas) / counter.gather(-1, feas)
                ev = feas.gather(-1, avg.argmin(-1, keepdim=True)).squeeze(-1)
            elif policy == "tova":
                ev = scores.argmin(dim=-1)
            elif policy == "recency":
                ev = torch.zeros(L, Hkv, dtype=torch.int64)
            else:
                raise ValueError(policy)
            ev_abs = ev + P
            _evict_liso(pkv, ev_abs.unsqueeze(-1))
            idxs = torch.arange(W).view(1, 1, -1).repeat(L, Hkv, 1)
            mask = (ev.unsqueeze(-1) != idxs).view(-1, W)

            def compact(t):
                return torch.cat([
                    t.view(-1, W)[mask].view(L, Hkv, W - 1),
                    torch.zeros(L, Hkv, 1)], dim=-1)

            scores = compact(scores)
            scores_sq = compact(scores_sq)
            counter = compact(counter)
    return out_ids
