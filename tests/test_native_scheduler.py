"""Native continuous-batching scheduler: slot assignment, chunked-prefill
budgeting, priorities, completion/recycling."""
import pytest

from easykv_tpu.native.scheduler import DECODE, PREFILL_CHUNK, NativeScheduler


def drain_prefill(s, actions):
    for a in actions:
        if a.kind == PREFILL_CHUNK:
            s.report_prefill(a.request_id, a.chunk_len)


def test_chunked_prefill_budget():
    s = NativeScheduler(n_slots=2, max_prefill_tokens_per_tick=100)
    s.submit(1, prompt_len=250, max_new_tokens=4)
    # tick 1: 100 tokens of request 1
    acts = s.plan()
    assert [(a.kind, a.request_id, a.chunk_start, a.chunk_len) for a in acts] == [
        (PREFILL_CHUNK, 1, 0, 100)
    ]
    drain_prefill(s, acts)
    # tick 2: next 100
    acts = s.plan()
    assert acts[0].chunk_start == 100 and acts[0].chunk_len == 100
    drain_prefill(s, acts)
    # tick 3: final 50, no decode yet (prefill completes this tick)
    acts = s.plan()
    assert acts[0].chunk_len == 50
    drain_prefill(s, acts)
    # tick 4: decode
    acts = s.plan()
    assert [(a.kind, a.request_id) for a in acts] == [(DECODE, 1)]


def test_prefill_budget_shared_across_requests():
    s = NativeScheduler(n_slots=4, max_prefill_tokens_per_tick=64)
    s.submit(1, 40, 4)
    s.submit(2, 40, 4)
    acts = s.plan()
    pf = [a for a in acts if a.kind == PREFILL_CHUNK]
    assert [(a.request_id, a.chunk_len) for a in pf] == [(1, 40), (2, 24)]


def test_priority_and_fifo():
    s = NativeScheduler(n_slots=1, max_prefill_tokens_per_tick=1000)
    s.submit(10, 8, 2, priority=0)
    s.submit(11, 8, 2, priority=5)
    # only one slot: the high-priority request still waits — FIFO got slot?
    # admit happens at plan() time with priority ordering, so 11 wins the slot
    acts = s.plan()
    assert acts[0].request_id == 11
    assert s.slot_of(11) == 0 and s.slot_of(10) == -1
    assert s.num_waiting == 1
    drain_prefill(s, acts)
    # finish request 11 (2 tokens)
    s.plan()
    s.report_token(11)
    done = s.report_token(11)
    assert done
    # slot recycled to request 10
    acts = s.plan()
    assert acts[0].request_id == 10 and acts[0].kind == PREFILL_CHUNK
    assert s.num_active == 1 and s.num_waiting == 0


def test_eos_frees_slot():
    s = NativeScheduler(2, 100)
    s.submit(7, 10, 50)
    drain_prefill(s, s.plan())
    s.plan()
    assert not s.report_token(7)
    assert s.report_token(7, is_eos=True)
    assert s.num_active == 0


def test_duplicate_id_rejected():
    s = NativeScheduler(1, 10)
    s.submit(1, 4, 4)
    with pytest.raises(ValueError):
        s.submit(1, 4, 4)


def test_mixed_decode_and_prefill_same_tick():
    s = NativeScheduler(2, 16)
    s.submit(1, 16, 8)
    drain_prefill(s, s.plan())
    s.submit(2, 32, 8)
    acts = s.plan()
    kinds = {(a.kind, a.request_id) for a in acts}
    assert (DECODE, 1) in kinds
    assert (PREFILL_CHUNK, 2) in kinds
