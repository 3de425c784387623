"""Continuous-batching serving demo: submit a stream of requests with mixed
prompt lengths and priorities, watch the native scheduler interleave chunked
prefills with decode ticks."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(
    globals().get("__file__", "examples/x"))), ".."))

import numpy as np

from common import add_model_args, build_model

from easykv_tpu.serving import Request
from easykv_tpu.serving.scheduled import ScheduledBatchEngine


def main():
    ap = argparse.ArgumentParser()
    add_model_args(ap)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--requests", type=int, default=8)
    args = ap.parse_args()

    model = build_model(args)
    eng = ScheduledBatchEngine(
        model, batch_slots=args.slots, max_prompt=256, budget=args.budget,
        kv_policy="roco", temperature=0.8, top_p=0.95, prefill_chunk=64,
    )
    rng = np.random.default_rng(0)
    for rid in range(args.requests):
        n = int(rng.integers(16, 200))
        eng.submit(Request(
            request_id=rid,
            ids=rng.integers(1, model.cfg.vocab_size, size=(n,)),
            max_new_tokens=int(rng.integers(8, 32)),
        ))
        print(f"submitted request {rid}: prompt {n} tokens")

    tick = 0
    while eng.requests or eng.sched.num_waiting:
        ev = eng.tick()
        tick += 1
        if ev:
            summary = ", ".join(f"r{rid}:{tok}" for rid, tok in ev[:6])
            print(f"tick {tick:3d} | active {eng.sched.num_active} "
                  f"waiting {eng.sched.num_waiting} | {summary}")
    print("\ncompleted:")
    for rid, req in sorted(eng.finished.items()):
        print(f"  request {rid}: {len(req.out)} tokens")


if __name__ == "__main__":
    main()
