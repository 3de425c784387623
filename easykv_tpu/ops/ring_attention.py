"""Ring attention: sequence-parallel causal attention over a device mesh.

Additive capability relative to the reference (SURVEY.md §5: nothing to
mirror — the reference is single-GPU): prompts longer than one chip's memory
are sharded over the `sp` mesh axis; K/V blocks rotate around the ring via
`ppermute` while every device folds the visiting block into an online-softmax
accumulator for its local queries.

Crucially for the eviction engine, the *traveling* K/V block carries its own
per-key attention-mass accumulator: after a full rotation every block returns
home with Σp (and Σp²) summed over ALL queries — exactly the h2o/roco score
update (reference easykv.py:443-453) — so budgeted-prefill scoring composes
with sequence parallelism without any extra collective.

Implemented with XLA collectives under shard_map (compiler-scheduled ICI
transfers); a Pallas double-buffered variant is a later optimization.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = jnp.float32(-1e30)


def _block_attend(q, k, v, q_pos, k_pos, scale):
    """One (local-q x visiting-kv) block: returns (numer, denom, m, probs).

    q: (B, Hkv, rep, Tq, D) (GQA: rep query heads share each KV head);
    k/v: (B, Hkv, Tk, D); positions used for causal masking.
    Probabilities are unnormalized exp(logits - m) with per-row max m."""
    logits = jnp.einsum(
        "bhrqd,bhkd->bhrqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    mask = k_pos[:, None, None, None, :] <= q_pos[:, None, None, :, None]
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1)                     # (B, Hkv, rep, Tq)
    e = jnp.exp(logits - m[..., None])
    e = jnp.where(mask, e, 0.0)
    numer = jnp.einsum("bhrqk,bhkd->bhrqd", e, v.astype(jnp.float32))
    denom = jnp.sum(e, axis=-1)                      # (B, Hkv, rep, Tq)
    return numer, denom, m, e


def ring_attention(
    q: jax.Array,       # (B, Hq, T, D) — sharded over T on `axis_name`
    k: jax.Array,       # (B, Hkv, T, D); Hkv may divide Hq (GQA)
    v: jax.Array,
    q_pos: jax.Array,   # (B, T) global positions — sharded over T
    mesh: Mesh,
    axis_name: str = "sp",
    collect_scores: bool = False,
    k_pos: Optional[jax.Array] = None,  # (B, T) key positions; default q_pos
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Causal self-attention with the sequence dimension sharded over
    `axis_name`. Returns (out (B, Hq, T, D), score_sum, score_sq_sum) where
    the score sums are the per-key GQA-mean Σp / Σp² over all queries at
    KV-head granularity (B, Hkv, T) — exactly update_scores' bootstrap
    semantics (reference easykv.py:443-453) — or None unless collect_scores.

    Pass k_pos with sentinel INT_MAX at padding keys to hide them (a -1
    padding q_pos would otherwise be causally visible to every query)."""
    scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    Hq, Hkv = q.shape[1], k.shape[1]
    rep = Hq // Hkv
    if k_pos is None:
        k_pos = q_pos

    def local(q, k, v, q_pos, k_pos):
        B, H, Tq, D = q.shape
        q = q.reshape(B, Hkv, rep, Tq, D)
        idx = jax.lax.axis_index(axis_name)

        def step(carry, _):
            acc, m, l, k_cur, v_cur, kpos_cur = carry
            numer, denom, m_new, _e = _block_attend(
                q, k_cur, v_cur, q_pos, kpos_cur, scale
            )
            # online softmax merge
            m_tot = jnp.maximum(m, m_new)
            c_old = jnp.exp(m - m_tot)
            c_new = jnp.exp(m_new - m_tot)
            acc = acc * c_old[..., None] + numer * c_new[..., None]
            l = l * c_old + denom * c_new
            perm = [(i, (i + 1) % n) for i in range(n)]
            return (acc, m_tot, l,
                    jax.lax.ppermute(k_cur, axis_name, perm),
                    jax.lax.ppermute(v_cur, axis_name, perm),
                    jax.lax.ppermute(kpos_cur, axis_name, perm)), None

        vary = lambda x: jax.lax.pcast(x, (axis_name,), to='varying')
        acc0 = vary(jnp.zeros(q.shape, jnp.float32))
        m0 = vary(jnp.full(q.shape[:-1], NEG_INF))
        l0 = vary(jnp.zeros(q.shape[:-1], jnp.float32))
        carry = (acc0, m0, l0, k, v, k_pos)
        (acc, m, l, *_), _ = jax.lax.scan(step, carry, None, length=n)
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return out.reshape(B, Hq, Tq, D).astype(q.dtype)

    spec4 = P(None, None, axis_name, None)
    spec2 = P(None, axis_name)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2, spec2),
        out_specs=spec4,
    )
    out = fn(q, k, v, q_pos, k_pos)
    if not collect_scores:
        return out, None, None
    ssum, ssq = ring_attention_scores(q, k, q_pos, mesh, axis_name, k_pos=k_pos)
    return out, ssum, ssq


def ring_attention_scores(
    q: jax.Array, k: jax.Array, q_pos: jax.Array,
    mesh: Mesh, axis_name: str = "sp",
    k_pos: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-key attention-mass sums Σp / Σp² over all queries (the h2o/roco
    prefill score bootstrap) with the sequence sharded over `axis_name`.

    GQA: probabilities are averaged over the rep query heads sharing each KV
    head BEFORE squaring, exactly matching update_scores on attend()'s
    GQA-mean probs_kv (reference process_for_mqa_gqa, easykv.py:188-196) —
    accumulators are (B, Hkv, T).

    Two ring rotations: the first computes each query row's exact softmax
    statistics (m, l); the second rotates K once more, with every device
    folding its locally-normalized probabilities into the traveling block's
    score accumulator, which arrives home after a full rotation."""
    scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    Hq, Hkv = q.shape[1], k.shape[1]
    rep = Hq // Hkv
    if k_pos is None:
        k_pos = q_pos

    def local(q, k, q_pos, k_pos):
        B, _, Tq, D = q.shape
        q = q.reshape(B, Hkv, rep, Tq, D)

        # pass 1: softmax stats for local queries (per q-head)
        def stats_step(carry, _):
            m, l, k_cur, kpos_cur = carry
            logits = jnp.einsum(
                "bhrqd,bhkd->bhrqk", q.astype(jnp.float32),
                k_cur.astype(jnp.float32)
            ) * scale
            mask = kpos_cur[:, None, None, None, :] <= q_pos[:, None, None, :, None]
            logits = jnp.where(mask, logits, NEG_INF)
            m_new = jnp.max(logits, axis=-1)
            m_tot = jnp.maximum(m, m_new)
            l = l * jnp.exp(m - m_tot) + jnp.sum(
                jnp.where(mask, jnp.exp(logits - m_tot[..., None]), 0.0), axis=-1
            )
            perm = [(i, (i + 1) % n) for i in range(n)]
            return (m_tot, l, jax.lax.ppermute(k_cur, axis_name, perm),
                    jax.lax.ppermute(kpos_cur, axis_name, perm)), None

        vary = lambda x: jax.lax.pcast(x, (axis_name,), to='varying')
        m0 = vary(jnp.full(q.shape[:-1], NEG_INF))
        l0 = vary(jnp.zeros(q.shape[:-1], jnp.float32))
        (m, l, _, _), _ = jax.lax.scan(
            stats_step, (m0, l0, k, k_pos), None, length=n
        )

        # pass 2: rotate K + accumulators; every device adds its normalized
        # GQA-mean probability mass for the visiting block
        def score_step(carry, _):
            k_cur, kpos_cur, ssum, ssq = carry
            logits = jnp.einsum(
                "bhrqd,bhkd->bhrqk", q.astype(jnp.float32),
                k_cur.astype(jnp.float32)
            ) * scale
            mask = kpos_cur[:, None, None, None, :] <= q_pos[:, None, None, :, None]
            p = jnp.where(mask, jnp.exp(logits - m[..., None]), 0.0)
            p = p / jnp.maximum(l, 1e-30)[..., None]      # exact probabilities
            pm = jnp.mean(p, axis=2)                      # GQA-mean (B,Hkv,Tq,Tk)
            ssum = ssum + jnp.sum(pm, axis=2)             # (B, Hkv, Tk)
            ssq = ssq + jnp.sum(pm * pm, axis=2)
            perm = [(i, (i + 1) % n) for i in range(n)]
            return (jax.lax.ppermute(k_cur, axis_name, perm),
                    jax.lax.ppermute(kpos_cur, axis_name, perm),
                    jax.lax.ppermute(ssum, axis_name, perm),
                    jax.lax.ppermute(ssq, axis_name, perm)), None

        z = jax.lax.pcast(
            jnp.zeros(k.shape[:2] + (k.shape[2],), jnp.float32), (axis_name,),
            to="varying",
        )
        (k_back, _, ssum, ssq), _ = jax.lax.scan(
            score_step, (k, k_pos, z, z), None, length=n
        )
        # after n rotations the accumulators are home again
        return ssum, ssq

    spec4 = P(None, None, axis_name, None)
    spec2 = P(None, axis_name)
    spec3 = P(None, None, axis_name)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec4, spec4, spec2, spec2),
        out_specs=(spec3, spec3),
    )
    return fn(q, k, q_pos, k_pos)
