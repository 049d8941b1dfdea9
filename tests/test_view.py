"""View binning math == the reference's preprocess_data semantics
(reference plot_conservation.py:46-65), plus an end-to-end PNG smoke test."""

from collections import Counter

import numpy as np
import pytest

from memo_tpu.view.plot import bin_conservation, plot_conservation


def reference_bins(values, n_docs, n_bins):
    """Faithful reimplementation of reference preprocess_data:46-58 —
    int(linspace) edges, per-bin Counter, normalized proportions."""
    bin_space = list(map(int, np.linspace(0, len(values), n_bins + 1)))
    rows = []
    for lo, hi in zip(bin_space[:-1], bin_space[1:]):
        cnt = Counter(values[lo:hi])
        total = sum(cnt.values())
        rows.append([cnt[o] / total if total else 0.0 for o in range(n_docs + 1)])
    return np.asarray(rows)


@pytest.mark.parametrize("n_bins", [1, 4, 7, 100])
def test_bin_conservation_matches_reference(n_bins):
    rng = np.random.default_rng(0)
    n_docs = 5
    values = rng.integers(0, n_docs + 1, 1000).tolist()
    got = bin_conservation(np.asarray(values), n_docs, n_bins)
    want = reference_bins(values, n_docs, n_bins)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_bin_conservation_uneven_edges():
    # 10 positions into 4 bins: int() edges [0,2,5,7,10] — uneven on purpose.
    values = np.asarray([0, 1, 2, 3, 4, 5, 5, 5, 1, 0])
    got = bin_conservation(values, 5, 4)
    want = reference_bins(values.tolist(), 5, 4)
    np.testing.assert_allclose(got, want)


def test_plot_figure_builds(tmp_path):
    rng = np.random.default_rng(1)
    values = rng.integers(0, 6, 500)
    fig, ax = plot_conservation(values, 5, 10)
    out = tmp_path / "p.png"
    fig.savefig(out, dpi=72)
    assert out.stat().st_size > 1000
    import matplotlib.pyplot as plt

    plt.close(fig)
