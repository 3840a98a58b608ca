"""Full-size end-to-end fp32 parity certificate (BASELINE's core clause).

Runs scripts/parity_e2e.py: a reference-shaped torch stack at FULL dims
(seeded weights) vs our parity engine, BOTH driven end-to-end on the
reference's own sample assets (``backend/sample_images/{e1,e2}.jpg`` +
``patient_details.json``), through the reference's exact ``inference()``
semantics incl. the full beam-4 generation config
(inference_pipeline.py:150-206). Asserts 13 probs <= 1e-5 and IDENTICAL
report token ids. Certificate numbers are recorded in README/NOTES.

Default run uses --quick (24/8 gen tokens, ~45 s); the slow variant runs the
reference's full 180/150 config (~100 s) — the exact certified claim.
"""
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _run(args, tmp_path):
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "parity_e2e.py"),
         "--out", str(tmp_path), *args],
        capture_output=True, text=True, timeout=2400, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    cert = json.loads((tmp_path / "certificate.json").read_text())
    assert cert["ok"]
    for name, s in cert["samples"].items():
        assert s["prob_max_abs_diff"] <= 1e-5, (name, s)
        assert s["vector_match"] and s["report_ids_identical"], (name, s)
    return cert


def test_parity_e2e_quick(tmp_path):
    _run(["--quick"], tmp_path)


@pytest.mark.slow
def test_parity_e2e_full_generation_config(tmp_path):
    cert = _run([], tmp_path)
    for s in cert["samples"].values():
        assert s["report_len"] == 181  # decoder start + max_new_tokens
