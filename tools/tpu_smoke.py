"""TPU Mosaic lowering gate for every default-ON Pallas path (VERDICT r3 #2).

BENCH_r03 crashed (rc=1) because a kernel that only ever ran under
`interpret=True` on CPU had illegal Mosaic block specs — interpret mode
skips exactly the lowering checks that real TPU hardware enforces. This
gate closes that hole: it traces the engine's ACTUAL jitted mode drivers
(`_run_decoding` / `_run_encoding` / `_run_encdec` / `_run_ppl`) at 7B
shapes for every default-ON kernel configuration and lowers them for
platform 'tpu', which runs Mosaic's `lower_jaxpr_to_module` checks —
WITHOUT compiling or executing anything (abstract params, no HBM, no
remote-compile round trip; ~seconds per graph).

Because lowering is cross-platform (`trace().lower(lowering_platforms=
('tpu',))`), this runs anywhere: on the TPU host before a bench, or on a
CPU box / in the test suite (tests/test_tpu_lowering.py runs the decode
scenarios on every CPU suite run).

Usage:
    python tools/tpu_smoke.py            # all scenarios, native backend
    python tools/tpu_smoke.py --cpu      # force CPU host (e.g. dev box)
    python tools/tpu_smoke.py -k int4    # substring-filter scenarios

Exit code 0 = every default-ON Pallas path lowers for TPU. Run this after
the last kernel-touching commit of a round; record the rc in RESULTS.md.
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


class _LoweredOK(Exception):
    """Raised by the lower-only shims after a successful TPU lowering."""


def _lower_only(jit_fn, compile_too=False):
    @functools.wraps(jit_fn)
    def shim(st, *args):
        lowered = jit_fn.trace(st, *args).lower(lowering_platforms=("tpu",))
        if compile_too:
            # full Mosaic/XLA compile (abstract args — AOT): catches the
            # compile-stage error classes .lower() cannot (scoped-vmem
            # OOMs, dynamic-slice alignment provability, layout
            # legalization). Needs a TPU backend; results land in the
            # persistent compile cache, prewarming the bench.
            lowered.compile()
        raise _LoweredOK
    return shim


def _abstract_params(cfg, fmt: str, fused: bool):
    """ShapeDtypeStruct tree of bench.py's synthetic 7B params — zero HBM,
    works on hosts without the chip."""
    import jax

    import bench

    def build():
        if fmt == "bf16":
            from easykv_tpu.models import llama

            return llama.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jax.numpy.bfloat16)
        p = (bench.fake_int4_params(cfg) if fmt == "int4"
             else bench.fake_int8_params(cfg))
        if fused:
            from easykv_tpu.ops.quant import fuse_gemv_params

            p = fuse_gemv_params(p)
        return p

    return jax.eval_shape(build)


def scenarios():
    """(name, fmt, fused, kv_quant, kv_mode, gen_config, extra_env, B,
    prompt_len, stride, cfg_name) for every default-ON Pallas routing at
    7B (LLaMa2-7B MHA; Mistral-7B GQA + sliding window)."""
    dec = {"budget": 200, "kv_policy": "roco", "max_new_tokens": 8,
           "temperature": 1.0, "top_p": 0.95, "eos_token_ids": []}
    enc = {"budget": 0.5, "kv_policy": "roco", "max_new_tokens": 8,
           "temperature": 1.0, "top_p": 0.95, "eos_token_ids": [],
           "keep_attention": True}
    return [
        # mega one-call decode kernel + arith-int4 GEMM prefill (M=512,
        # the BENCH_r03 crash site) + sidecar write/evict
        ("int4_decode_roco", "int4", True, True, "decoding", dec, {}, 1, 512, 1,
         "llama7b"),
        ("int4_decode_full", "int4", True, True, "decoding",
         {**dec, "kv_policy": "full"}, {}, 1, 512, 1, "llama7b"),
        # streaming: inflight decode kernel with in-kernel rank rotation
        ("int4_decode_stream", "int4", True, True, "decoding",
         {**dec, "streaming": True}, {}, 1, 512, 1, "llama7b"),
        # B=2: batched mega kernel (fused_decode_batch, Bp=8 padding)
        ("int4_decode_b2", "int4", True, True, "decoding", dec, {}, 2, 512, 1,
         "llama7b"),
        # B=2 with the batched mega off: per-layer scan + arith GEMM at M=2
        ("int4_decode_b2_nomegab", "int4", True, True, "decoding", dec,
         {"EASYKV_TPU_MEGA_BATCH": "0"}, 2, 512, 1, "llama7b"),
        # batched mega on GQA shapes (rep=4 per-head q reshape) + window
        ("mistral_decode_b2", "int4", True, True, "decoding", dec, {},
         2, 512, 1, "mistral7b"),
        # B=8: the serving batch (all-B attention phases, NT=1)
        ("int4_decode_b8", "int4", True, True, "decoding", dec, {}, 8, 512,
         1, "llama7b"),
        # B=16: the lifted gate — Bp=16 scratch, CG=2, S-tiled flash
        # attention (NT=2 at S=768) + halved weight tiles
        ("int4_decode_b16", "int4", True, True, "decoding", dec, {}, 16,
         512, 1, "llama7b"),
        # Dh=64 class (TinyLlama): bf16 KV decode — caught the r5
        # write_rows sub-128-lane DMA regression the 7B scenarios missed
        ("tiny_decode_bf16", "bf16", False, False, "decoding", dec, {}, 1,
         512, 1, "tiny1b"),
        # mega off: per-op arith GEMV kernel (w4a16_gemv_arith) decode
        ("int4_decode_nomega", "int4", True, True, "decoding", dec,
         {"EASYKV_TPU_MEGA": "0"}, 1, 512, 1, "llama7b"),
        # int8 weights: XLA w8a16 matmuls + inflight decode kernel
        ("int8_decode_roco", "int8", False, True, "decoding", dec, {}, 1, 512,
         1, "llama7b"),
        ("int8_decode_stream", "int8", False, True, "decoding",
         {**dec, "streaming": True}, {}, 1, 512, 1, "llama7b"),
        # bf16 KV cache variant of the inflight kernel (quant=False branch)
        ("int8_decode_bf16kv", "int8", False, False, "decoding", dec, {}, 1,
         512, 1, "llama7b"),
        # strided encode: chunk write+attend kernels (S-tiled), layer-major,
        # keep_attention bootstrap, encode-phase sidecar evict
        ("int4_encode_roco", "int4", True, True, "encoding", enc, {}, 1, 4096,
         96, "llama7b"),
        # ppl mode (teacher-forced strided encode variant)
        ("int4_ppl_roco", "int4", True, True, "ppl", enc, {}, 1, 4096, 96,
         "llama7b"),
        # encoding_decoding: fused chunk-step kernel + encdec decode eviction
        ("int4_encdec_roco", "int4", True, True, "encoding_decoding",
         {**dec, "budget": 384}, {}, 1, 512, 8, "llama7b"),
        # Mistral-7B shapes (GQA 32/8 + sliding window): the in-kernel
        # window mask paths (decode inflight, mega, chunk write+attend)
        ("mistral_decode_roco", "int4", True, True, "decoding", dec, {},
         1, 512, 1, "mistral7b"),
        ("mistral_encode_roco", "int4", True, True, "encoding", enc, {},
         1, 4096, 96, "mistral7b"),
    ]


def make_cfg(cfg_name):
    from easykv_tpu.config import ModelConfig

    if cfg_name == "mistral7b":
        return ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=8, max_position_embeddings=8192,
            sliding_window=4096,
        )
    if cfg_name == "tiny1b":
        # TinyLlama-1.1B shapes: head_dim 64 — the sub-128-lane class
        return ModelConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=22, num_attention_heads=32,
            num_key_value_heads=4, max_position_embeddings=2048,
        )
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=32, max_position_embeddings=4096,
    )


def run_scenario(name, fmt, fused, kv_quant, kv_mode, gc, env, B,
                 prompt_len, stride, cfg_name, compile_too=False) -> float:
    import jax
    import numpy as np

    from easykv_tpu import flags
    import easykv_tpu.engine.generate  # noqa: F401 — ensure module import
    # `easykv_tpu.engine.__init__` re-exports the generate *function* under
    # the submodule's name, so attribute-style import returns the function
    gen_mod = sys.modules["easykv_tpu.engine.generate"]

    cfg = make_cfg(cfg_name)
    params = _abstract_params(cfg, fmt, fused)
    model = gen_mod.CausalLM(cfg, params, dtype="bfloat16", kv_quant=kv_quant)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(B, prompt_len))

    saved_env = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    patched = {}
    try:
        for fn_name in ("_run_decoding", "_run_encoding", "_run_encdec",
                        "_run_ppl", "_run_ppl_full"):
            patched[fn_name] = getattr(gen_mod, fn_name)
            setattr(gen_mod, fn_name,
                    _lower_only(patched[fn_name], compile_too))
        flags.use_pallas(True)
        flags.use_interpret(False)
        t0 = time.time()
        try:
            gen_mod.generate(model, ids, gc, kv_mode=kv_mode, stride=stride)
        except _LoweredOK:
            pass
        else:
            raise AssertionError(
                f"{name}: generate() returned without reaching a jitted "
                f"mode driver — the shim never fired")
        return time.time() - t0
    finally:
        for fn_name, fn in patched.items():
            setattr(gen_mod, fn_name, fn)
        flags.use_pallas(None)
        flags.use_interpret(None)
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (dev box / no chip)")
    ap.add_argument("--compile", action="store_true", dest="compile_too",
                    help="full AOT compile per scenario (TPU host only; "
                         "catches Mosaic compile-stage errors — vmem OOM, "
                         "alignment provability — that lowering misses; "
                         "minutes per cold graph, cached after)")
    ap.add_argument("-k", default="", help="substring filter on scenario names")
    args = ap.parse_args(argv)
    if args.compile_too and args.cpu:
        ap.error("--compile needs the TPU backend")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import contextlib
    import io

    failures = []
    todo = [s for s in scenarios() if args.k in s[0]]
    for s in todo:
        name = s[0]
        try:
            # engine report prints (budget ratios) are noise here
            with contextlib.redirect_stdout(io.StringIO()):
                dt = run_scenario(*s, compile_too=args.compile_too)
            verb = "compiled" if args.compile_too else "lowered"
            print(f"  OK   {name:24s} {verb} for tpu in {dt:5.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — gate reports all failures
            failures.append((name, e))
            msg = str(e).split("\n")[0][:160]
            print(f"  FAIL {name:24s} {type(e).__name__}: {msg}", flush=True)
    print(f"tpu_smoke: {len(todo) - len(failures)}/{len(todo)} scenarios "
          f"lowered clean")
    if failures:
        name, e = failures[0]
        print(f"first failure [{name}]:", file=sys.stderr)
        raise failures[0][1]
    return 0


if __name__ == "__main__":
    sys.exit(main())
