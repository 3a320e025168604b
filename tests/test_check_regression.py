"""The headline regression gate (scripts/check_regression.py): the 120 ms
latency bar had 1.8% headroom in round 4 and nothing guarded it. These
tests pin the gate's semantics: device-trace p50 preferred, driver-wrapper
unwrapping, loud failure past the thresholds."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "scripts", "check_regression.py")


def run_gate(tmp_path, rec, *flags):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(rec))
    r = subprocess.run([sys.executable, GATE, str(p), *flags],
                       capture_output=True, text=True, timeout=60)
    return r.returncode, r.stdout


def test_pass_within_thresholds(tmp_path):
    rc, out = run_gate(tmp_path, {"value": 5472, "device_p50_ms": 117.8,
                                  "p50_chunk_latency_ms": 117.9})
    assert rc == 0 and "gate pass" in out


def test_fail_on_latency(tmp_path):
    rc, out = run_gate(tmp_path, {"value": 5472, "device_p50_ms": 119.9})
    assert rc == 1 and "GATE FAIL" in out and "119.9" in out


def test_fail_on_capacity(tmp_path):
    rc, out = run_gate(tmp_path, {"value": 1600, "device_p50_ms": 110.0})
    assert rc == 1 and "streams 1600 < gate 5400" in out


def test_device_p50_preferred_over_host(tmp_path):
    # host chain-mean fine, device trace over: the REAL per-step stat gates
    rc, out = run_gate(tmp_path, {"value": 5472, "device_p50_ms": 121.0,
                                  "p50_chunk_latency_ms": 110.0})
    assert rc == 1 and "device_p50_ms" in out


def test_host_fallback_when_no_trace(tmp_path):
    rc, _ = run_gate(tmp_path, {"value": 5472,
                                "p50_chunk_latency_ms": 118.0})
    assert rc == 0


def test_driver_wrapper_unwrapped(tmp_path):
    inner = json.dumps({"metric": "realtime_streams_per_chip",
                        "value": 5472, "device_p50_ms": 117.8})
    rc, out = run_gate(tmp_path, {"n": 4, "rc": 0,
                                  "tail": "noise\n" + inner + "\n"})
    assert rc == 0, out


def test_threshold_overrides(tmp_path):
    rc, _ = run_gate(tmp_path, {"value": 800, "device_p50_ms": 117.8},
                     "--min-streams", "800")
    assert rc == 0


def test_missing_file():
    r = subprocess.run([sys.executable, GATE, "/nonexistent.json"],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 2


def test_cohort_step_gated(tmp_path):
    # with cohort stacking the cohort step p50 IS each chunk's latency;
    # a shared-layout round whose step creeps past the bar must fail even
    # if the single-slab trace is fine
    rc, out = run_gate(tmp_path, {
        "value": 5472, "device_p50_ms": 117.8,
        "cohorts": {"cohorts": 9, "batch": 608, "step_p50_ms": 121.3,
                    "layout": "shared-x-ring"}})
    assert rc == 1 and "cohort step_p50_ms" in out
