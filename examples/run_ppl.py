"""Perplexity under a KV budget (reference test_ppl.py): teacher-forced ppl
of a long document at full cache vs budget=0.5 for recency and roco, with
DynamicNTK scaling for beyond-max-length contexts."""
import argparse

from common import add_model_args, build_model, encode_prompt

from easykv_tpu import enable_fixed_kv, set_dynamicntk_rope_length


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--doc", default=None, help="text file (reference doc.txt)")
    ap.add_argument("--stride", type=int, default=96)
    ap.add_argument("--ntk-length", type=int, default=None)
    args = ap.parse_args()

    model = build_model(args)
    if args.ntk_length:
        set_dynamicntk_rope_length(model, args.ntk_length)
    enable_fixed_kv(model, model.tokenizer, mode="ppl", stride=args.stride)

    if args.doc:
        text = open(args.doc).read()
        ids = encode_prompt(model, text)
    else:
        import numpy as np

        ids = np.random.default_rng(0).integers(
            3, model.cfg.vocab_size, size=(2048,)
        )

    results = {}
    for policy in ["full", "recency", "roco"]:
        budget = 1.0 if policy == "full" else 0.5
        ppl = model.easykv_ppl(
            ids, generation_config={"budget": budget, "kv_policy": policy}
        )
        results[policy] = ppl
        print(f"policy={policy:8s} budget={budget}: ppl={ppl:.4f}")
    if "full" in results:
        print(f"Δ recency: {results['recency']-results['full']:+.4f}  "
              f"Δ roco: {results['roco']-results['full']:+.4f}")


if __name__ == "__main__":
    main()
