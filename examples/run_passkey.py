"""Passkey retrieval under prompt-encoding eviction (reference
test_passkey.py / test_passkey_NTK.py): long filler + hidden passkey,
budget=0.5 strided encoding, exact-retrieval accuracy."""
import argparse
import json

from common import add_model_args, build_model, encode_prompt

from easykv_tpu import enable_fixed_kv, set_dynamicntk_rope_length


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--data", default="/root/reference/passkey_examples_5k.jsonl")
    ap.add_argument("--stride", type=int, default=24)
    ap.add_argument("--budget", type=float, default=0.5)
    ap.add_argument("--policy", default="h2o_head_std_avg")  # alias of roco
    ap.add_argument("--ntk-length", type=int, default=None)
    args = ap.parse_args()

    model = build_model(args)
    if args.ntk_length:
        set_dynamicntk_rope_length(model, args.ntk_length)
    enable_fixed_kv(model, model.tokenizer, mode="encoding", stride=args.stride)

    n_ok = n = 0
    for line in open(args.data):
        ex = json.loads(line)
        ids = encode_prompt(model, ex["input"])
        out = model.easykv_generate(
            ids,
            generation_config={
                "budget": args.budget, "kv_policy": args.policy,
                "temperature": 1e-9, "top_p": 1.0, "max_new_tokens": 16,
            },
        )
        text = out if isinstance(out, str) else " ".join(map(str, out))
        ok = ex["target"] in text
        n_ok += ok
        n += 1
        print(f"[{n}] target={ex['target']} ok={ok} out={text[:60]!r}")
    print(f"accuracy: {n_ok}/{n}")


if __name__ == "__main__":
    main()
