"""End-to-end passkey pipeline check (VERDICT r2 next #2): drives the
examples/run_passkey.py machinery — jsonl fixture parsing, budget-0.5
strided encoding, generation, answer scan, accuracy report — on the
random-weight model. Retrieval ACCURACY needs real weights (RUNBOOK.md);
this pins the pipeline itself: it must run the reference fixture format
end-to-end, evict to the requested ratio, and produce well-formed output.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_run_passkey_pipeline_random_model(tmp_path):
    # synthetic fixture in the reference's jsonl schema
    # (/root/reference/passkey_examples_5k.jsonl: {"input": .., "target": ..})
    fixture = tmp_path / "passkey_tiny.jsonl"
    filler = "The grass is green. The sky is blue. " * 12
    with open(fixture, "w") as f:
        for key in ("12345", "98765"):
            prompt = (
                f"{filler}The pass key is {key}. Remember it. "
                f"{filler}What is the pass key? The pass key is"
            )
            f.write(json.dumps({"input": prompt, "target": key}) + "\n")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "run_passkey.py", "--random", "--dtype", "float32",
         "--data", str(fixture), "--stride", "24", "--budget", "0.5"],
        cwd=os.path.join(REPO, "examples"),
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # per-example result lines + the final accuracy report
    assert out.count("target=") == 2, out
    assert "accuracy:" in out.splitlines()[-1], out
    # the encoding path must actually evict to ~the requested ratio
    ratios = [ln for ln in out.splitlines() if "budget ratio" in ln]
    assert len(ratios) == 2, out
    for ln in ratios:
        pct = float(ln.split(":")[1].strip().split("%")[0])
        assert 45.0 <= pct <= 70.0, ln
