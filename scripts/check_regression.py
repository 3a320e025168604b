#!/usr/bin/env python3
"""Headline regression gate (VERDICT r4 item 6).

The headline contract (BASELINE.md) is <120 ms p50 per-chunk latency at
the shipped capacity. Round 5's shared-x-ring headline is 5472 streams
(9 cohorts x 608) with the binding per-chunk latency the COHORT step p50
(106.5 ms measured, 11% headroom); the single-slab device trace and the
cohort step are both gated. This gate fails LOUDLY before an innocent
change eats the headroom.

    check_regression.py BENCH_rNN.json            # validate a bench record
    check_regression.py --run [--quick]           # run bench.py, then gate
    check_regression.py x.json --p50-max 119.5 --min-streams 5400

Exit codes: 0 pass, 1 regression, 2 bad/missing input.

Default thresholds (overridable):
  --p50-max 119.5      p50 per-chunk latency ceiling in ms (0.5 ms inside
                       the 120 ms bar: trips on drift before the bar does);
                       applied to the single-slab p50 AND the cohort step
  --min-streams 5400   just under the shipped 5472-stream headline
The p50 checked is the device-trace p50 when the record has one (real
per-step percentiles), falling back to the host chain-mean p50.
"""

import json
import subprocess
import sys


def gate(rec: dict, p50_max: float, min_streams: int) -> list[str]:
    fails = []
    p50 = rec.get("device_p50_ms") or rec.get("p50_chunk_latency_ms")
    src = "device_p50_ms" if rec.get("device_p50_ms") else \
        "p50_chunk_latency_ms"
    if p50 is None:
        fails.append("no p50 latency in record")
    elif p50 > p50_max:
        fails.append(f"{src} {p50:.2f} ms > gate {p50_max} ms "
                     f"(bar 120 ms)")
    v = rec.get("value")
    if v is None:
        fails.append("no 'value' (streams) in record")
    elif v < min_streams:
        fails.append(f"streams {v} < gate {min_streams}")
    co = rec.get("cohorts")
    if co and co.get("step_p50_ms") is not None \
            and co["step_p50_ms"] > p50_max:
        # with cohort stacking the COHORT step is each chunk's latency
        fails.append(f"cohort step_p50_ms {co['step_p50_ms']:.2f} ms > "
                     f"gate {p50_max} ms (bar 120 ms)")
    return fails


def main(argv: list[str]) -> int:
    def opt(name, default, cast):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    p50_max = opt("--p50-max", 119.5, float)
    min_streams = opt("--min-streams", 5400, int)

    if "--run" in argv:
        cmd = [sys.executable, "bench.py"]
        if "--quick" in argv:
            cmd.append("--quick")
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=3600)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            print(f"gate: bench.py failed (exit {r.returncode})")
            return 2
        rec = json.loads(r.stdout.strip().splitlines()[-1])
    else:
        paths = [a for a in argv[1:] if not a.startswith("--")]
        if not paths:
            print(__doc__, file=sys.stderr)
            return 2
        try:
            rec = json.load(open(paths[0]))
        except (OSError, json.JSONDecodeError) as e:
            print(f"gate: cannot read {paths[0]}: {e}")
            return 2
        if "metric" not in rec and "tail" in rec:
            # driver BENCH_rNN.json wrapper: the bench line is the last
            # JSON object inside "tail"
            lines = [ln for ln in rec["tail"].splitlines()
                     if ln.startswith("{")]
            if not lines:
                print(f"gate: no bench JSON line in {paths[0]} tail")
                return 2
            rec = json.loads(lines[-1])

    fails = gate(rec, p50_max, min_streams)
    if fails:
        for f in fails:
            print(f"GATE FAIL: {f}")
        return 1
    print(f"gate pass: {rec.get('value')} streams, p50 "
          f"{rec.get('device_p50_ms') or rec.get('p50_chunk_latency_ms')}"
          f" ms (gates: >= {min_streams} streams, <= {p50_max} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
