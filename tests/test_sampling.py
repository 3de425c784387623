"""logits_adapter parity with the reference's nucleus semantics
(reference easykv/easykv.py:115-134), checked against an independent torch
implementation of the same formula."""
import jax.numpy as jnp
import numpy as np
import torch

from easykv_tpu.sampling import logits_adapter, sample_token
import jax


def _torch_reference(logits, temperature, top_p):
    logits = torch.tensor(logits, dtype=torch.float32)
    prob = torch.softmax(logits / temperature, dim=-1)
    sorted_prob, sorted_idx = torch.sort(prob, descending=True, dim=-1)
    cumsum = torch.cumsum(sorted_prob, dim=-1)
    mask = (cumsum - sorted_prob) > top_p
    sorted_prob[mask] = 0.0
    sorted_prob = sorted_prob / sorted_prob.sum(dim=-1, keepdim=True)
    _, gather_pos = torch.sort(sorted_idx, descending=False, dim=-1)
    return torch.gather(sorted_prob, -1, gather_pos).numpy()


def test_top_p_filtering_matches_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 50)).astype(np.float32) * 3
    for temp, top_p in [(1.0, 0.9), (0.3, 0.5), (2.0, 0.99), (1.0, 1.0)]:
        ours, raw = logits_adapter(jnp.asarray(logits), temp, top_p)
        ref = _torch_reference(logits, temp, top_p)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(raw),
            torch.softmax(torch.tensor(logits), -1).numpy(),
            atol=1e-6,
        )


def test_greedy_via_tiny_temperature():
    """temperature=1e-9 must produce the argmax deterministically
    (reference test_decoding.py:41)."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 40)).astype(np.float32)
    probs, _ = logits_adapter(jnp.asarray(logits), 1e-9, 1.0)
    tok = sample_token(jax.random.PRNGKey(0), probs)
    np.testing.assert_array_equal(np.asarray(tok), logits.argmax(-1))


def test_filtered_distribution_support():
    """Sampled tokens always come from the top-p nucleus."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(1, 30)).astype(np.float32) * 4)
    probs, _ = logits_adapter(logits, 1.0, 0.5)
    support = np.asarray(probs)[0] > 0
    for i in range(50):
        tok = int(sample_token(jax.random.PRNGKey(i), probs)[0])
        assert support[tok]


def test_nucleus_mask_matches_sorted_keep_set():
    """Sort-free nucleus_mask == the sorted (cumsum - p) <= top_p kept set,
    mapped back through the permutation — including boundary ties."""
    import numpy as np

    from easykv_tpu.sampling import nucleus_mask

    rng = np.random.default_rng(0)
    for trial in range(30):
        V = rng.integers(8, 300)
        logits = rng.standard_normal((2, V)).astype(np.float32) * 3
        if trial % 3 == 0:  # plant exact ties, some at the likely boundary
            logits[:, : V // 2] = logits[:, V // 2 : V // 2 * 2][:, ::-1]
        prob = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        top_p = float(rng.choice([0.01, 0.3, 0.9, 0.95, 0.999]))

        order = np.argsort(-prob, axis=-1, kind="stable")
        sp = np.take_along_axis(prob, order, axis=-1)
        keep_sorted = (np.cumsum(sp, axis=-1) - sp) <= top_p
        ref = np.zeros_like(keep_sorted)
        np.put_along_axis(ref, order, keep_sorted, axis=-1)
        # zero-prob tokens carry no mass: the sorted set may include them at
        # top_p ~ 1, the bisection set never does — normalize the comparison
        ref &= prob > 0

        got = np.asarray(nucleus_mask(jnp.asarray(prob), jnp.float32(top_p)))
        np.testing.assert_array_equal(got, ref, err_msg=f"trial {trial} p={top_p}")


def test_sample_topp_greedy_and_support():
    """Greedy (tiny temperature) picks argmax; at temp>0 every sampled token
    lies in the exact nucleus."""
    import numpy as np

    from easykv_tpu.sampling import nucleus_mask, sample_topp

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32) * 2)
    tok = sample_topp(jax.random.PRNGKey(0), logits, jnp.float32(1e-9),
                      jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.asarray(jnp.argmax(logits, -1)))
    prob = jax.nn.softmax(logits / 0.7, axis=-1)
    keep = np.asarray(nucleus_mask(prob, jnp.float32(0.8)))
    for s in range(50):
        tok = np.asarray(sample_topp(jax.random.PRNGKey(s), logits,
                                     jnp.float32(0.7), jnp.float32(0.8)))
        assert all(keep[i, t] for i, t in enumerate(tok))
