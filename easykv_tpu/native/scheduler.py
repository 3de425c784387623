"""ctypes binding for the native continuous-batching scheduler
(native/scheduler.cc)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass
from typing import List

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libscheduler.so"))

PREFILL_CHUNK = 0
DECODE = 1


class _CAction(ctypes.Structure):
    _fields_ = [
        ("kind", ctypes.c_int32),
        ("request_id", ctypes.c_int64),
        ("slot", ctypes.c_int32),
        ("chunk_start", ctypes.c_int32),
        ("chunk_len", ctypes.c_int32),
    ]


@dataclass(frozen=True)
class Action:
    kind: int
    request_id: int
    slot: int
    chunk_start: int
    chunk_len: int


_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(os.path.abspath(_NATIVE_DIR), "scheduler.cc")
    if (not os.path.exists(_SO_PATH)
            or os.path.getmtime(src) > os.path.getmtime(_SO_PATH)):
        # make's own dependency check handles the actual rebuild
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)
    lib.sched_create.restype = ctypes.c_void_p
    lib.sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                 ctypes.c_int32]
    lib.sched_destroy.argtypes = [ctypes.c_void_p]
    lib.sched_submit.restype = ctypes.c_int32
    lib.sched_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.sched_plan.restype = ctypes.c_int32
    lib.sched_plan.argtypes = [ctypes.c_void_p, ctypes.POINTER(_CAction),
                               ctypes.c_int32]
    lib.sched_report.restype = ctypes.c_int32
    lib.sched_report.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.sched_slot_of.restype = ctypes.c_int32
    lib.sched_slot_of.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.sched_dump.restype = ctypes.c_int32
    lib.sched_dump.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                               ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.sched_restore.restype = ctypes.c_int32
    lib.sched_restore.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32]
    lib.sched_num_waiting.restype = ctypes.c_int32
    lib.sched_num_waiting.argtypes = [ctypes.c_void_p]
    lib.sched_num_active.restype = ctypes.c_int32
    lib.sched_num_active.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeScheduler:
    """Continuous-batching planner: slot assignment + chunked-prefill token
    budgeting + FIFO-within-priority ordering, implemented in C++."""

    def __init__(self, n_slots: int, max_prefill_tokens_per_tick: int,
                 chunk_cap: int = 0):
        """chunk_cap: per-request per-tick prefill cap (0 = whole budget).
        Set it to the compiled chunk width so several requests can each
        prefill one chunk per tick (they ride one merged dispatch)."""
        self._lib = _load()
        self._h = self._lib.sched_create(n_slots, max_prefill_tokens_per_tick,
                                         chunk_cap)
        self._cap = max(64, 2 * n_slots)
        self._buf = (_CAction * self._cap)()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.sched_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def submit(self, request_id: int, prompt_len: int, max_new_tokens: int,
               priority: int = 0) -> None:
        rc = self._lib.sched_submit(self._h, request_id, prompt_len,
                                    max_new_tokens, priority)
        if rc != 0:
            raise ValueError(f"duplicate request id {request_id}")

    def plan(self) -> List[Action]:
        n = self._lib.sched_plan(self._h, self._buf, self._cap)
        return [
            Action(a.kind, a.request_id, a.slot, a.chunk_start, a.chunk_len)
            for a in self._buf[:n]
        ]

    def report_prefill(self, request_id: int, n_tokens: int) -> None:
        self._lib.sched_report(self._h, request_id, 0, n_tokens, 0)

    def report_token(self, request_id: int, is_eos: bool = False) -> bool:
        """Returns True when the request completed (slot freed)."""
        return self._lib.sched_report(self._h, request_id, 1, 1,
                                      1 if is_eos else 0) == 1

    def dump(self) -> List[dict]:
        """All live requests in admission order (crash-recovery snapshot)."""
        cap = max(64, 4 * self._cap)
        ids = (ctypes.c_int64 * cap)()
        fields = (ctypes.c_int32 * (6 * cap))()
        n = self._lib.sched_dump(self._h, ids, fields, cap)
        out = []
        for i in range(n):
            f = fields[6 * i : 6 * i + 6]
            out.append(dict(request_id=int(ids[i]), slot=int(f[0]),
                            prompt_len=int(f[1]), max_new_tokens=int(f[2]),
                            prefilled=int(f[3]), generated=int(f[4]),
                            priority=int(f[5])))
        return out

    def restore(self, row: dict) -> None:
        """Re-create one dumped request with its progress (see dump())."""
        rc = self._lib.sched_restore(
            self._h, row["request_id"], row["slot"], row["prompt_len"],
            row["max_new_tokens"], row["prefilled"], row["generated"],
            row["priority"])
        if rc != 0:
            raise ValueError(f"restore failed ({rc}) for {row}")

    def slot_of(self, request_id: int) -> int:
        return self._lib.sched_slot_of(self._h, request_id)

    @property
    def num_waiting(self) -> int:
        return self._lib.sched_num_waiting(self._h)

    @property
    def num_active(self) -> int:
        return self._lib.sched_num_active(self._h)
