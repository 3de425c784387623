"""Long-article summarization with prefill eviction (reference
test_summarization.py): encoding mode, stride 24, keep_attention score
bootstrap, sampling at temperature 0.3."""
import argparse

from common import TEMPLATES, add_model_args, build_model, encode_prompt

from easykv_tpu import enable_fixed_kv


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--article", default=None, help="text file to summarize")
    ap.add_argument("--stride", type=int, default=24)
    args = ap.parse_args()

    model = build_model(args)
    enable_fixed_kv(model, model.tokenizer, mode="encoding", stride=args.stride,
                    verbose=True)

    article = (
        open(args.article).read() if args.article
        else "The quick brown fox jumps over the lazy dog. " * 100
    )
    inst = f"Summarize the following article in one sentence:\n\n{article}"
    ids = encode_prompt(model, TEMPLATES[args.template].format(inst=inst))

    for budget in [1.0, 0.5]:
        out = model.easykv_generate(
            ids,
            generation_config={
                "budget": budget, "kv_policy": "roco", "temperature": 0.3,
                "top_p": 0.9, "max_new_tokens": 128,
                "keep_attention": True,  # reference test_summarization.py:48
            },
        )
        print(f"[budget={budget}] {out!r}")


if __name__ == "__main__":
    main()
