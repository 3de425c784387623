"""Decode-phase eviction example (reference test_decoding.py): instruction
following with an integer generated-token budget, roco policy, greedy."""
import argparse

from common import TEMPLATES, add_model_args, build_model, encode_prompt

from easykv_tpu import enable_fixed_kv


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--budget", type=int, nargs="+", default=[300, 150])
    ap.add_argument("--policy", default="roco")
    ap.add_argument("--streaming", action="store_true",
                    help="StreamingLLM cache-relative positions "
                         "(reference generation_config['streaming'])")
    ap.add_argument("--max-new-tokens", type=int, default=256)
    args = ap.parse_args()

    model = build_model(args)
    enable_fixed_kv(model, model.tokenizer, mode="decoding", stride=1, verbose=True)

    inst = (
        "What are the names of some famous actors that started their careers on "
        "Broadway?"
    )
    prompt = TEMPLATES[args.template].format(inst=inst)
    ids = encode_prompt(model, prompt)

    for budget in args.budget:
        gen_config = {
            "temperature": 1e-9,  # greedy (reference test_decoding.py:41)
            "top_p": 1.0,
            "max_new_tokens": args.max_new_tokens,
            "budget": budget,
            "kv_policy": args.policy,
            "eos_token_ids": [],
            "streaming": args.streaming,
        }
        out = model.easykv_generate(ids, generation_config=gen_config)
        print(f"[budget={budget}] {out!r}")


if __name__ == "__main__":
    main()
