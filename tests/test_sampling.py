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
