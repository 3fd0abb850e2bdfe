#!/usr/bin/env python
"""One-window benchmark matrix: every BASELINE config back to back.

Round figures on this box are confounded by tunnel-latency windows (CLAUDE.md:
identical code measured 8.9-11.7s at scale-1M across windows).  This tool runs
example / scale-1M / scale-2 / long / scale-5 SEQUENTIALLY in one session,
bracketing each config with a tunnel-upload probe (the window fingerprint), and
emits a single JSON table — the round-over-round comparison artifact
(VERDICT r4 item 5; BASELINE measurement configs 1-5).

Usage: python tools/bench_matrix.py [--out BENCH_MATRIX.json] [config ...]
  configs default to: default 1 2 long 5
Each config is `python bench.py` in a subprocess with PANTAX_TPU_BENCH_SCALE
set, so the matrix exercises exactly what the driver measures.  Run AFTER the
per-config compile caches are warm — a cold compile inside a config would be
recorded as wall time.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tunnel_probe(n: int = 3) -> dict:
    """Median ms to upload a production-size 2.6MB batch (~90 good, >=150
    bad) — the window fingerprint bracketing every config."""
    import numpy as np
    import jax

    x = np.random.default_rng(0).integers(0, 255, 2_621_440, dtype=np.uint8)
    jax.device_put(x)  # first put may pay layout setup
    times = []
    for _ in range(n):
        x = x.copy()  # defeat the content cache
        t0 = time.time()
        d = jax.device_put(x)
        np.asarray(d[:1])
        times.append((time.time() - t0) * 1e3)
    times.sort()
    return {"upload_2p6MB_ms_median": round(times[len(times) // 2], 1),
            "upload_2p6MB_ms": [round(t, 1) for t in times]}


def run_config(scale: str | None) -> dict:
    env = dict(os.environ)
    if scale is None:
        env.pop("PANTAX_TPU_BENCH_SCALE", None)
    else:
        env["PANTAX_TPU_BENCH_SCALE"] = scale
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=7200,
    )
    wall = time.time() - t0
    out: dict = {"config_wall_s": round(wall, 1)}
    if p.returncode != 0:
        out["error"] = (p.stderr or p.stdout)[-2000:]
        return out
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            out.update(json.loads(line))
            break
    # keep the bench's own stderr commentary (strain counts, stage splits)
    notes = [ln for ln in p.stderr.splitlines() if ln.startswith("# ")]
    if notes:
        out["notes"] = notes
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the matrix JSON to this path")
    ap.add_argument("configs", nargs="*",
                    default=["default", "1", "2", "long", "5"])
    args = ap.parse_args()

    matrix: dict = {
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "window_before": tunnel_probe(),
        "configs": {},
    }
    for cfg in args.configs:
        scale = None if cfg == "default" else cfg
        sys.stderr.write(f"== bench config {cfg} ==\n")
        matrix["configs"][cfg] = run_config(scale)
        matrix["configs"][cfg]["window_after"] = tunnel_probe()
        sys.stderr.write(
            json.dumps(matrix["configs"][cfg].get("value")) + "\n"
        )
    matrix["finished_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    line = json.dumps(matrix)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
