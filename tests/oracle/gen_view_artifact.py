#!/usr/bin/env python3
"""Regenerate docs/img/view_stability.png — the pinned render of the
conservation view used by tests/test_view.py's pixel-stability test.
Run from the repo root after a matplotlib version bump:

    PYTHONPATH=. python tests/oracle/gen_view_artifact.py
"""

import pathlib

import numpy as np

from memo_tpu.view.plot import save_conservation_plot

out = pathlib.Path(__file__).parents[2] / "docs" / "img" / "view_stability.png"
out.parent.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(20260820)
vals = rng.integers(0, 6, 5000)
tmp = out.parent / "_cons_tmp.txt"
np.savetxt(tmp, vals, fmt="%i")
save_conservation_plot(str(tmp), str(out), 5, 50, 100)
tmp.unlink()
print(f"wrote {out}")
