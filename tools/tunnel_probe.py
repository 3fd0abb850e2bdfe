#!/usr/bin/env python
"""One-number tunnel-window probe: time a production-size batch upload.

Bench figures on this box swing +-25% with the tunnel window (CLAUDE.md);
run this BEFORE a recorded benchmark — ~90 ms/2.6MB is a good window,
>=150 ms is a bad one (record nothing, retry later).
"""
from __future__ import annotations

import time

import numpy as np
import jax

x = np.random.default_rng(0).integers(0, 255, 2_621_440, dtype=np.uint8)
for i in range(5):
    t0 = time.time()
    d = jax.device_put(x)
    np.asarray(d[:1])
    dt = (time.time() - t0) * 1e3
    if i:  # first put may pay layout/compile
        print(f"upload 2.6MB: {dt:7.1f} ms")
    x = x.copy()  # defeat any content cache
