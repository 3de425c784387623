"""Runtime feature flags (kernel selection + active mesh registry)."""
from __future__ import annotations

from typing import Optional, Tuple

_PALLAS_OVERRIDE: Optional[bool] = None
_ACTIVE_MESH: Optional[Tuple] = None  # (Mesh, data_axis_name, model_axis_name)


def use_pallas(enabled: Optional[bool]) -> None:
    """Force the fused Pallas kernels on/off (None = auto: TPU backend)."""
    global _PALLAS_OVERRIDE
    _PALLAS_OVERRIDE = enabled


def set_active_mesh(mesh, data_axis: str = "data", model_axis: str = "model") -> None:
    """Register the device mesh model code runs under. With a mesh active,
    the fused decode kernel is invoked through shard_map (grid partitions
    over batch x KV-heads with zero communication) instead of being gated
    off. Pass mesh=None to clear."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = None if mesh is None else (mesh, data_axis, model_axis)


def active_mesh() -> Optional[Tuple]:
    return _ACTIVE_MESH


_SP_MESH: Optional[Tuple] = None  # (Mesh, seq_axis_name)


def set_sp_mesh(mesh, axis: str = "sp") -> None:
    """Register a sequence-parallel mesh: engine prefill then shards the
    prefix over `axis` and runs ring attention (ops/ring_attention) with the
    traveling Σp/Σp² accumulators feeding the keep_attention score bootstrap.
    Pass mesh=None to clear."""
    global _SP_MESH
    _SP_MESH = None if mesh is None else (mesh, axis)


def sp_mesh() -> Optional[Tuple]:
    return _SP_MESH


def pallas_enabled() -> bool:
    import os

    if _PALLAS_OVERRIDE is not None:
        return _PALLAS_OVERRIDE
    env = os.environ.get("EASYKV_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    import jax

    # TPU-backend default: single chip runs pallas_call directly; with more
    # devices a registered active mesh is required (the kernel then runs
    # under shard_map — pallas_call is not GSPMD-auto-partitionable).
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or _ACTIVE_MESH is not None


_SIDECAR_OVERRIDE: Optional[bool] = None


def use_sidecar(enabled: Optional[bool]) -> None:
    """Force the fused sidecar write/evict kernels on/off independently of
    the decode-attention kernel (None = auto: follow pallas_enabled)."""
    global _SIDECAR_OVERRIDE
    _SIDECAR_OVERRIDE = enabled


def sidecar_enabled() -> bool:
    import os

    if _SIDECAR_OVERRIDE is not None:
        return _SIDECAR_OVERRIDE and pallas_enabled()
    env = os.environ.get("EASYKV_TPU_SIDECAR")
    if env is not None:
        return env not in ("0", "false", "off") and pallas_enabled()
    return pallas_enabled()


_CHUNK_KERNEL_OVERRIDE: Optional[bool] = None


def use_chunk_kernel(enabled: Optional[bool]) -> None:
    """Force the fused chunk-attention kernel (strided-encode / prefill
    paths) on/off (None = env EASYKV_TPU_CHUNK_KERNEL, default 'auto').
    The wrapper picks the 1-pass whole-logits-in-VMEM variant when it fits
    VMEM and the 2-pass flash variant otherwise."""
    global _CHUNK_KERNEL_OVERRIDE
    _CHUNK_KERNEL_OVERRIDE = enabled


def chunk_kernel_mode() -> str:
    """'on' | 'off' | 'auto'. 'auto' (the default) enables the kernel only
    for quantized (int8) KV caches, where it streams K/V at half the bytes
    with dequant folded on-chip and measured +4.5% strided roco / +5.6%
    keep_attention / +58% wide-chunk full-cache prefill at 7B; on bf16 KV
    the strided path measured neutral-to-slightly-negative, so 'auto'
    leaves XLA's fused attend in place there (RESULTS.md "Chunk-attention
    kernel A/B"). Env EASYKV_TPU_CHUNK_KERNEL: 0/false/off, auto, else on."""
    import os

    if not pallas_enabled():
        return "off"
    if _CHUNK_KERNEL_OVERRIDE is not None:
        return "on" if _CHUNK_KERNEL_OVERRIDE else "off"
    env = os.environ.get("EASYKV_TPU_CHUNK_KERNEL")
    if env is not None:
        if env in ("0", "false", "off"):
            return "off"
        if env == "auto":
            return "auto"
        return "on"
    return "auto"


_W4_KERNEL_OVERRIDE: Optional[bool] = None


def use_w4_kernel(enabled: Optional[bool]) -> None:
    """Force the Pallas w4a16 GEMV kernel on/off (None = auto: follow
    pallas_enabled; see RESULTS.md for the measured default)."""
    global _W4_KERNEL_OVERRIDE
    _W4_KERNEL_OVERRIDE = enabled


def w4_kernel_enabled() -> bool:
    import os

    if _W4_KERNEL_OVERRIDE is not None:
        return _W4_KERNEL_OVERRIDE and pallas_enabled()
    env = os.environ.get("EASYKV_TPU_W4_KERNEL")
    if env is not None:
        return env not in ("0", "false", "off") and pallas_enabled()
    return False


def mega_kernel_enabled() -> bool:
    """One-pallas-call decode step (ops/pallas/fused_decode.py): the whole
    L-layer forward — arith-int4 GEMVs + RoPE + budgeted-cache attention —
    in a single kernel. Applies only when the param tree is the fused
    (wqkv/wgu) arithmetic-int4 layout, B == 1, single chip. Default ON
    where Pallas is; EASYKV_TPU_MEGA=0 drops to the per-layer scan."""
    import os

    env = os.environ.get("EASYKV_TPU_MEGA")
    if env is not None:
        return env not in ("0", "false", "off") and pallas_enabled()
    return pallas_enabled()


def mega_batch_enabled() -> bool:
    """Batched (B > 1) one-pallas-call decode step
    (ops/pallas/fused_decode_batch.py). Same applicability rules as the
    B == 1 mega kernel (arith-int4 fused tree, single chip, non-streaming);
    default ON where the mega kernel is. EASYKV_TPU_MEGA_BATCH=0 drops
    batched decode back to the per-layer scan (per-op GEMM kernels)."""
    import os

    env = os.environ.get("EASYKV_TPU_MEGA_BATCH")
    if env is not None:
        return env not in ("0", "false", "off") and mega_kernel_enabled()
    return mega_kernel_enabled()


_W4A_KERNEL_OVERRIDE: Optional[bool] = None


def use_w4a_kernel(enabled: Optional[bool]) -> None:
    """Force the Pallas arith-int4 GEMV/GEMM kernels on/off (None = env
    EASYKV_TPU_W4A_KERNEL, default: follow pallas_enabled)."""
    global _W4A_KERNEL_OVERRIDE
    _W4A_KERNEL_OVERRIDE = enabled


def w4a_kernel_enabled() -> bool:
    """Pallas streaming GEMV/GEMM for ARITHMETIC-packed int4 weights
    ({"q4a"} linears, ops/pallas/w4_stream.py). Default ON whenever Pallas
    is — streaming the plain-int8 carrier is the format's entire point; the
    env knob EASYKV_TPU_W4A_KERNEL=0 drops to the XLA einsum path for
    A/Bs."""
    import os

    if _W4A_KERNEL_OVERRIDE is not None:
        return _W4A_KERNEL_OVERRIDE and pallas_enabled()
    env = os.environ.get("EASYKV_TPU_W4A_KERNEL")
    if env is not None:
        return env not in ("0", "false", "off") and pallas_enabled()
    return pallas_enabled()


_INC_RANKS_OVERRIDE: Optional[bool] = None


def use_inc_ranks(enabled: Optional[bool]) -> None:
    """Force the engine-carried incremental age ranks for streaming decode
    on/off (None = env EASYKV_TPU_INC_RANKS, default on). Off = recompute
    the batched double-argsort every step (0.54 ms/step at 7B — the A/B
    reference path)."""
    global _INC_RANKS_OVERRIDE
    _INC_RANKS_OVERRIDE = enabled


def inc_ranks_enabled() -> bool:
    import os

    if _INC_RANKS_OVERRIDE is not None:
        return _INC_RANKS_OVERRIDE
    return os.environ.get("EASYKV_TPU_INC_RANKS", "1") not in (
        "0", "false", "off")


_PREROT_OVERRIDE: Optional[bool] = None


def use_prerot(enabled: Optional[bool]) -> None:
    """Force the pre-rotated ordered streaming-decode cache on/off
    (None = env EASYKV_TPU_PREROT, default on). Off = the r4 path: raw-K
    cache rotated by slot index inside the attention kernel every step."""
    global _PREROT_OVERRIDE
    _PREROT_OVERRIDE = enabled


def prerot_enabled() -> bool:
    """Pre-rotated ordered streaming decode: cached K is stored already
    rotated by its age rank (== slot index in the ordered cache), so the
    attention hot path reads K with NO per-step rotation at all — the
    rotation moves into (a) the decode write (the engine already computes
    the q_rel-rotated K) and (b) the compact-on-evict shift, where each
    shifted row picks up one fixed R(-theta) Givens update on values the
    compaction already streams. Rotation work drops from every-slot-every-
    step to shifted-rows-only (~(S - victim)/S, and victims sit above the
    protected prompt). Semantics match the rank-rotation path (including
    the reference's prefix double-rotation artifact — the one-time
    _prerotate_cache transform composes on top of the prefix's true-position
    RoPE) up to fp rounding and int8 requant drift, quantified in
    RESULTS.md."""
    import os

    if _PREROT_OVERRIDE is not None:
        return _PREROT_OVERRIDE
    return os.environ.get("EASYKV_TPU_PREROT", "1") not in (
        "0", "false", "off")


_LAYER_MAJOR_OVERRIDE: Optional[bool] = None


def use_layer_major(enabled: Optional[bool]) -> None:
    """Force the layer-major strided encode (per layer: one whole-prompt
    QKV/MLP matmul + an inner chunk scan for the cache ops) on/off.
    None = env EASYKV_TPU_LAYER_MAJOR, default on — the chunk-major path
    re-streams all weights per stride-wide chunk (RESULTS.md "Encode
    diagnosis")."""
    global _LAYER_MAJOR_OVERRIDE
    _LAYER_MAJOR_OVERRIDE = enabled


def layer_major_enabled() -> bool:
    import os

    if _LAYER_MAJOR_OVERRIDE is not None:
        return _LAYER_MAJOR_OVERRIDE
    env = os.environ.get("EASYKV_TPU_LAYER_MAJOR")
    if env is not None:
        return env not in ("0", "false", "off")
    return True


def dense_write_enabled() -> bool:
    """Use the one-hot-contraction cache write (cache.write_tokens_dense)
    in the layer-major strided encode instead of the XLA scatter
    (env EASYKV_TPU_DENSE_WRITE, default on). XLA lowers TPU scatters to a
    serialized per-index loop — ~0.6 ms per chunk-layer at 7B encode
    shapes, 70% of the strided phase (RESULTS.md "strided-encode
    ablation")."""
    import os

    return os.environ.get("EASYKV_TPU_DENSE_WRITE", "1") not in (
        "0", "false", "off")


def step_kernel_enabled() -> bool:
    """Opt-in full-step encode fusion (write+attend+score+evict in one
    kernel, ops/pallas/chunk_attention.fused_chunk_step). Default OFF:
    measured slower than write+attend fusion + batched XLA eviction at 7B
    shapes — the per-(B,H)-program kth-smallest bisection is serial while
    XLA's eviction batches over heads (RESULTS.md "fused-step A/B")."""
    import os

    return os.environ.get("EASYKV_TPU_STEP_KERNEL", "0") not in (
        "0", "false", "off")


def encode_unroll() -> int:
    """Unroll factor for the layer-major encode/prefill inner chunk scan
    (env EASYKV_TPU_ENCODE_UNROLL, default 1). The inner scan is
    dispatch-bound (~0.7 ms per chunk-layer iteration at 7B, RESULTS.md
    "Layer-major encode"); unrolling lets XLA overlap consecutive chunks'
    small ops at the cost of a bigger loop body."""
    import os

    return int(os.environ.get("EASYKV_TPU_ENCODE_UNROLL", "1"))


_INTERPRET_OVERRIDE: Optional[bool] = None


def use_interpret(enabled: Optional[bool]) -> None:
    """Force Pallas interpret mode on/off (None = auto: off on TPU only).

    The TPU lowering smoke gate (tools/tpu_smoke.py, tests/
    test_tpu_lowering.py) forces False while cross-lowering for platform
    'tpu' on a CPU host, so Mosaic's block-mapping checks actually run —
    interpret mode skips exactly the checks that crashed BENCH_r03."""
    global _INTERPRET_OVERRIDE
    _INTERPRET_OVERRIDE = enabled


def pallas_interpret() -> bool:
    """Pallas kernels need interpret mode off-TPU (CPU mesh tests)."""
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    import jax

    return jax.default_backend() != "tpu"
