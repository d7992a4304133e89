"""SNAP NN kernel parity: golden TestCases vectors + transliterated oracle.

The ``*_TestCases`` auxdata (100 rows of 11 inputs + expected output per
variable) are the reference's own unused golden fixtures
(reference biophys/snap-auxdata/biophysical/2_1/<V>/<V>_TestCases).
"""

import numpy as np
import pytest

from satellitetools_spark.biophys import load_nn_params, load_test_cases, run_nn
from satellitetools_spark.constants import BIOPHYS_VARIABLES


def _oracle_nn(x: np.ndarray, variable: str) -> np.ndarray:
    """Independent transliteration of reference biophys.py:188-251 (column-
    vector convention, sequential masking) used to cross-check run_nn."""
    p = load_nn_params(variable)
    xt = x.T.copy()  # (11, N) as in the reference
    bands = xt[:8, :]
    bad = np.any(
        (bands < p["defdom_min"].reshape(-1, 1)) | (bands > p["defdom_max"].reshape(-1, 1)),
        axis=0,
    )
    xt[:, bad] = np.nan
    xn = 2 * (xt - p["norm_min"].reshape(-1, 1)) / (
        (p["norm_max"] - p["norm_min"]).reshape(-1, 1)
    ) - 1
    h = np.tanh(p["w1"].dot(xn) + p["b1"].reshape(-1, 1))
    y = p["w2"].reshape(1, -1).dot(h) + p["b2"]
    y = 0.5 * (y + 1) * (p["denorm_max"] - p["denorm_min"])
    tol, omin, omax = p["extreme"]
    out = np.copy(y)
    out[y < (omin + tol)] = np.nan
    out[(y > (omin + tol)) & (y < omin)] = omin
    out[(y < (omax - tol)) & (y > omax)] = omax
    out[y > (omax - tol)] = np.nan
    return out.ravel()


@pytest.mark.parametrize("variable", BIOPHYS_VARIABLES)
def test_nn_matches_transliterated_oracle(variable):
    rng = np.random.default_rng(42)
    p = load_nn_params(variable)
    n = 500
    # mostly in-domain, some out-of-domain and NaN
    span = p["defdom_max"] - p["defdom_min"]
    bands = p["defdom_min"] + rng.random((n, 8)) * span
    bands[:25] += span * 2          # out of domain high
    bands[25:50] -= span * 2        # out of domain low
    angles = np.column_stack([
        np.cos(np.radians(rng.uniform(0, 12, n))),
        np.cos(np.radians(rng.uniform(20, 70, n))),
        np.cos(np.radians(rng.uniform(-180, 180, n))),
    ])
    x = np.column_stack([bands, angles])
    got = run_nn(x, variable)
    want = _oracle_nn(x, variable)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12, equal_nan=True)


@pytest.mark.parametrize("variable", BIOPHYS_VARIABLES)
def test_nn_golden_test_cases(variable):
    tc = load_test_cases(variable)
    if tc is None:
        pytest.skip(f"no TestCases fixture published for {variable}")
    x, expected = tc[:, :11], tc[:, 11]
    got = run_nn(x, variable)
    # The golden fixtures NaN-out vectors via SNAP's convex-hull definition-
    # domain check, which the reference deliberately disables
    # (biophys.py:211-218) — our kernel matches the *reference*. Compare the
    # rows both keep; golden values carry ~5-7 significant digits.
    keep = ~np.isnan(got) & ~np.isnan(expected)
    assert keep.sum() >= 25
    np.testing.assert_allclose(got[keep], expected[keep], rtol=5e-4, atol=1e-3)
