"""Mosaic TPU lowering gate as a suite test (VERDICT r3 weak #2).

Every other Pallas test in this suite runs `interpret=True` on CPU, which
skips Mosaic's block-mapping/layout checks — the exact class of failure
that crashed BENCH_r03 (an illegal (1, TN) scale BlockSpec that only real
TPU lowering rejects). This test cross-lowers the engine's actual jitted
mode drivers for platform 'tpu' (no compile, no hardware) at 7B shapes
for every default-ON kernel configuration, so that failure class breaks
the CPU suite instead of the round's benchmark.

The scenario list lives in tools/tpu_smoke.py (also runnable standalone on
the TPU host: `python tools/tpu_smoke.py`).
"""
import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_smoke():
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    spec = importlib.util.spec_from_file_location(
        "tpu_smoke", os.path.join(_REPO, "tools", "tpu_smoke.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_smoke = _load_smoke()


@pytest.mark.parametrize(
    "scenario", _smoke.scenarios(), ids=lambda s: s[0])
def test_lowers_for_tpu(scenario):
    _smoke.run_scenario(*scenario)
