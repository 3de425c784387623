"""Command-line interface: `python -m easykv_tpu <command>`.

Commands mirror the reference's example workloads (SURVEY.md §2.2) without
hard-coded checkpoint paths:

    generate  — budget-constrained generation in any kv_mode
    ppl       — perplexity under a KV budget
    info      — print a checkpoint/config summary
"""
from __future__ import annotations

import argparse
import sys


def _add_common(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--model", help="local HF checkpoint directory")
    ap.add_argument("--random", action="store_true",
                    help="small random-weight model (no checkpoint needed)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8 compressed-KV cache")
    ap.add_argument("--stride", type=int, default=8)
    ap.add_argument("--budget", type=float, default=0.5,
                    help="int token budget or float fraction (<= 1.0)")
    ap.add_argument("--policy", default="roco")
    ap.add_argument("--seed", type=int, default=0)


def _build_model(args):
    import jax
    import jax.numpy as jnp

    from .config import ModelConfig
    from .engine.generate import CausalLM
    from .models import llama

    dtype = jnp.dtype(args.dtype)
    if args.model:
        from .models.hf import load_hf_checkpoint

        cfg, params = load_hf_checkpoint(args.model, dtype=dtype)
        tok = None
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            pass
        return CausalLM(cfg, params, tokenizer=tok, dtype=str(dtype),
                        kv_quant=args.kv_quant)
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=512, intermediate_size=1376,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=4096,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(args.seed), dtype=dtype)
    return CausalLM(cfg, params, dtype=str(dtype), kv_quant=args.kv_quant)


def _prompt_ids(model, args):
    import numpy as np

    if args.prompt_file:
        text = open(args.prompt_file).read()
    else:
        text = args.prompt or "Hello, world."
    if model.tokenizer is not None:
        return model.tokenizer(text, return_tensors="np").input_ids[0]
    return np.asarray(
        [3 + (ord(c) * 31) % (model.cfg.vocab_size - 4) for c in text[:2048]],
        np.int32,
    )


def _budget(args):
    b = args.budget
    return int(b) if b > 1.0 else float(b)


def cmd_generate(args) -> int:
    from .engine.generate import generate

    model = _build_model(args)
    ids = _prompt_ids(model, args)
    out = generate(
        model, ids,
        {
            "budget": _budget(args), "kv_policy": args.policy,
            "temperature": args.temperature, "top_p": args.top_p,
            "max_new_tokens": args.max_new_tokens, "seed": args.seed,
            "keep_attention": args.keep_attention,
            "streaming": args.streaming,
        },
        kv_mode=args.mode, stride=args.stride,
        report_decoding_latency=args.verbose,
    )
    print(out)
    return 0


def cmd_ppl(args) -> int:
    from .engine.generate import generate

    model = _build_model(args)
    ids = _prompt_ids(model, args)
    ppl = generate(
        model, ids, {"budget": _budget(args), "kv_policy": args.policy},
        kv_mode="ppl", stride=args.stride,
    )
    print(f"ppl: {ppl:.4f}")
    return 0


def cmd_info(args) -> int:
    model = _build_model(args)
    import dataclasses
    import json

    print(json.dumps(dataclasses.asdict(model.cfg), indent=2))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="easykv_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="budget-constrained generation")
    _add_common(g)
    g.add_argument("--mode", default="auto",
                   choices=["auto", "decoding", "encoding", "encoding_decoding"])
    g.add_argument("--prompt")
    g.add_argument("--prompt-file")
    g.add_argument("--max-new-tokens", type=int, default=128)
    g.add_argument("--temperature", type=float, default=1.0)
    g.add_argument("--top-p", type=float, default=1.0)
    g.add_argument("--keep-attention", action="store_true")
    g.add_argument("--streaming", action="store_true")
    g.add_argument("-v", "--verbose", action="store_true")
    g.set_defaults(fn=cmd_generate)

    p = sub.add_parser("ppl", help="perplexity under a KV budget")
    _add_common(p)
    p.add_argument("--prompt")
    p.add_argument("--prompt-file")
    p.set_defaults(fn=cmd_ppl)

    i = sub.add_parser("info", help="print model config")
    _add_common(i)
    i.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
