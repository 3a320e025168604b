"""Multichip scaling evidence on the virtual CPU mesh.

The environment has ONE real TPU chip, so real multi-chip wall-time cannot
be measured here.  What CAN be measured — and is what this script records
for n_devices in {1, 2, 4, 8} — is the part of the scaling story that is a
*property of the compiled program*, not of the hardware:

  - the exact collective ops GSPMD inserts (kind, count, bytes) for the
    serving step and the full training step, read out of the compiled HLO;
  - per-device parameter / stream-state bytes (memory scaling);
  - a predicted per-step ICI time for the collectives at a stated link
    bandwidth, so the day real multi-chip hardware exists the prediction
    has a number to be checked against;
  - per-step wall time on the virtual mesh (reported, but explicitly
    labeled structure-validation only: this host has 1 core, so 8 virtual
    devices time-slice it and wall time measures nothing about ICI).

The data axis is the whole point of the serving design: stream state is
sharded over 'data' and steady-state serving has ZERO cross-device
collectives (each chip serves its shard of streams) — the script proves
that claim from the HLO rather than asserting it.  The 'model' axis (TP
over FFN hidden + attention heads) is where the all-reduces appear.

Usage:  python scripts/bench_multichip.py [--out docs/multichip_scaling.json]

Reference contrast: the ggml build is single-device with no collectives at
all (SURVEY.md 2.4); this is the TPU-native scale-out story replacing it.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# v5e ICI: ~45 GB/s per direction per link (public figure, scaling-book).
ICI_BYTES_PER_S = 45e9

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shapes_text: str) -> int:
    """Sum byte sizes of every `dtype[dims]` shape in the text."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes_text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collectives_in_hlo(hlo_text: str) -> dict:
    """Count GSPMD collectives in compiled HLO; bytes = result-shape bytes.

    Counts are static op counts in the post-optimization module.  The
    caller compiles with the layer scan UNROLLED so an op inside the layer
    loop appears once per executed instance (a rolled `while` would make
    static counts undercount dynamic executions).
    """
    out: dict[str, dict] = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"^(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*)$", line)
        if not m:
            continue
        rhs = m.group(1)
        for kind in _COLLECTIVES:
            # result shape(s) precede the op name: `f32[8,2048]{1,0} all-reduce(`
            k = rhs.find(f" {kind}(")
            if k < 0:
                k = rhs.find(f" {kind}-start(")
            if k < 0:
                continue
            ent = out.setdefault(kind, {"count": 0, "bytes": 0})
            ent["count"] += 1
            ent["bytes"] += _shape_bytes(rhs[:k])
            break
    return out


def _one_mesh_run(n: int) -> dict:
    """Runs inside the subprocess: build, shard, compile, count, time."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    from nemotron_tpu.config import CacheConfig, ModelConfig
    from nemotron_tpu.parallel.mesh import (
        make_mesh, mel_sharding, param_shardings, state_shardings)

    cfg = ModelConfig(
        n_mels=32, d_model=128, n_heads=8, d_head=16, d_ff=256, n_layers=2,
        kernel_size=9, vocab_size=64, decoder_dim=64, joint_dim=64,
        subsampling_channels=16)
    cc = CacheConfig(att_right_context=1, att_left_context=8,
                     n_mels=cfg.n_mels)

    mp = 2 if n % 2 == 0 else 1
    mesh = make_mesh(n, model_parallel=mp)
    dp = mesh.shape["data"]
    batch = 2 * dp

    params, pos_heads, enc_state, dec_state, mel = ge._build(
        cfg, cc, batch=batch, dtype=jnp.float32)
    params = jax.device_put(params, param_shardings(params, mesh))
    pos_heads = jax.device_put(pos_heads, param_shardings(pos_heads, mesh))
    enc_state = jax.device_put(enc_state, state_shardings(enc_state, mesh))
    dec_state = jax.device_put(dec_state, state_shardings(dec_state, mesh))
    mel = jax.device_put(mel, mel_sharding(mesh))

    d0 = jax.devices()[0]

    def per_device_bytes(tree) -> int:
        total = 0
        for leaf in jax.tree.leaves(tree):
            for s in leaf.addressable_shards:
                if s.device == d0:
                    total += s.data.nbytes
        return total

    row: dict = {
        "n_devices": n, "data_parallel": dp, "model_parallel": mp,
        "batch": batch,
        "param_bytes_per_device": per_device_bytes(params),
        "state_bytes_per_device": (per_device_bytes(enc_state)
                                   + per_device_bytes(dec_state)),
    }

    serve_fn = jax.jit(ge._step_fn(cfg, cc))
    lowered = serve_fn.lower(params, mel, enc_state, dec_state, pos_heads)
    serve_coll = collectives_in_hlo(lowered.compile().as_text())

    # time a few steps: STRUCTURE VALIDATION ONLY on a 1-core host.
    # Use the jit wrapper, not the AOT executable: under TP the step's
    # OUTPUT cache sharding can legally differ from the input sharding
    # (GSPMD propagates head-sharding into the ring writes), and jit
    # re-compiles once for the steady-state output-fed signature where
    # the AOT executable would reject it.
    tokens, es, ds = serve_fn(params, mel, enc_state, dec_state, pos_heads)
    tokens, es, ds = serve_fn(params, mel, es, ds, pos_heads)  # steady sig
    jax.block_until_ready(tokens)
    t0 = time.perf_counter()
    for _ in range(5):
        tokens, es, ds = serve_fn(params, mel, es, ds, pos_heads)
    jax.block_until_ready(tokens)
    serve_ms = (time.perf_counter() - t0) / 5 * 1e3

    row["serving"] = {
        "collectives": serve_coll,
        "bytes_per_step": sum(v["bytes"] for v in serve_coll.values()),
        "predicted_ici_us_per_step": round(sum(
            v["bytes"] for v in serve_coll.values()) / ICI_BYTES_PER_S * 1e6,
            2),
        "virtual_mesh_wall_ms_per_step": round(serve_ms, 2),
    }

    # ---- full training step ----
    import optax

    from nemotron_tpu.training import make_train_step

    rng = np.random.default_rng(0)
    U = 3
    train_batch = {
        "mel": jax.device_put(
            jnp.asarray(rng.standard_normal((batch, 25, cfg.n_mels)),
                        jnp.float32), mel_sharding(mesh)),
        "labels": jnp.asarray(
            rng.integers(0, cfg.vocab_size - 1, (batch, U)), jnp.int32),
        "mel_lengths": jnp.full((batch,), 4, jnp.int32),
        "label_lengths": jnp.full((batch,), U, jnp.int32),
    }
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    train_step = make_train_step(cfg, opt)
    tjit = jax.jit(train_step)
    tlow = tjit.lower(params, opt_state, train_batch)
    train_coll = collectives_in_hlo(tlow.compile().as_text())

    p2, o2, loss = tjit(params, opt_state, train_batch)
    p2, o2, loss = tjit(p2, o2, train_batch)  # steady output-fed signature
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(3):
        p2, o2, loss = tjit(p2, o2, train_batch)
    jax.block_until_ready(loss)
    train_ms = (time.perf_counter() - t0) / 3 * 1e3

    row["training"] = {
        "collectives": train_coll,
        "bytes_per_step": sum(v["bytes"] for v in train_coll.values()),
        "predicted_ici_us_per_step": round(sum(
            v["bytes"] for v in train_coll.values()) / ICI_BYTES_PER_S * 1e6,
            2),
        "virtual_mesh_wall_ms_per_step": round(train_ms, 2),
    }
    return row


def main(argv):
    if argv[1:2] == ["--worker"]:
        n = int(argv[2])
        # unroll the 2-layer scan so static collective counts equal
        # dynamic executions (see collectives_in_hlo docstring)
        os.environ["NEMOTRON_TPU_SCAN_UNROLL"] = "2"
        row = _one_mesh_run(n)
        print("ROW " + json.dumps(row))
        return

    out_path = os.path.join(REPO, "docs", "multichip_scaling.json")
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]

    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            env=env, capture_output=True, text=True, timeout=1800, cwd=REPO)
        if proc.returncode != 0:
            print(proc.stdout, file=sys.stderr)
            print(proc.stderr, file=sys.stderr)
            raise SystemExit(f"n={n} worker failed rc={proc.returncode}")
        for line in proc.stdout.splitlines():
            if line.startswith("ROW "):
                rows.append(json.loads(line[4:]))
                break
        else:
            raise SystemExit(f"n={n}: no ROW in worker output")
        print(json.dumps(rows[-1]))

    doc = {
        "note": ("virtual CPU mesh (1-core host): wall times validate the "
                 "SPMD program only; collective counts/bytes are exact "
                 "properties of the compiled HLO. predicted_ici_us assumes "
                 f"{ICI_BYTES_PER_S/1e9:.0f} GB/s/link (v5e)."),
        "mesh_rule": "model_parallel=2 when n_devices is even, else 1; "
                     "rest of the mesh is the data (stream) axis",
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv)
