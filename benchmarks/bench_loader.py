#!/usr/bin/env python
"""Native C++ grid loader vs pure-python: the reference's startup bottleneck.

The reference's grid preload is a python float() loop over the BT-Settl ASCII
files ("time to read in specs", mft6.py:3511-3514) and typically dominates
startup.  Writes a realistic grid (130k rows x N files) and times both paths.
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
from mcmc_spec_tpu.models.grid import _read_two_columns_py
from mcmc_spec_tpu.runtime import native_loader


def main():
    tmp = tempfile.mkdtemp()
    wl = np.arange(3000.0, 30000.0, 0.2)  # 135k rows like the real window
    rng = np.random.RandomState(0)
    paths = []
    for i in range(8):
        p = os.path.join(tmp, f"lte{30 + i}-4.5-0.0a+0.0.BT-Settl.spec.7.txt")
        np.savetxt(p, np.column_stack([wl, np.abs(rng.randn(len(wl))) * 1e6]),
                   fmt="%.4f %.6e")
        paths.append(p)

    t0 = time.perf_counter()
    for p in paths:
        _read_two_columns_py(p, 2900.0, 30100.0)
    t_py = time.perf_counter() - t0

    reader = native_loader.maybe_reader()
    if reader is None:
        print("native loader unavailable")
        return
    t0 = time.perf_counter()
    out = reader.read_many(paths, 2900.0, 30100.0)
    t_nat = time.perf_counter() - t0

    # correctness spot check
    wl_n, fx_n = out[0]
    wl_p, fx_p = _read_two_columns_py(paths[0], 2900.0, 30100.0)
    assert np.array_equal(wl_n, wl_p) and np.array_equal(fx_n, fx_p)

    print(f"python loader : {t_py:.2f}s for {len(paths)} files")
    print(f"native loader : {t_nat:.3f}s  ({t_py / t_nat:.0f}x faster)")


if __name__ == "__main__":
    main()
