"""Native (C++) Welford vs the Python sequential oracle — bit parity.

The production stats path uses gamio_welford (native/gamio.cc); both
implement the reference's streaming update (MultiBamReader.cc:346-429,
count seeded at 1, std divides by the final count) in the same float64
operation order, so results must match to the last bit.
"""

import numpy as np
import pytest

from gam_ngs_tpu.core.stats import welford_isize_stats
from gam_ngs_tpu.native.loader import welford_native


@pytest.mark.parametrize("n", [0, 1, 2, 3, 17, 1000, 65537])
def test_welford_native_bit_parity(n):
    if welford_native(np.zeros(0, np.int64)) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(n + 1)
    x = rng.integers(90, 1200, size=n).astype(np.int64)
    mean, std, _ = welford_isize_stats(x)
    assert welford_native(x) == (mean, std)


def test_welford_native_constant_series():
    if welford_native(np.zeros(0, np.int64)) is None:
        pytest.skip("native lib unavailable")
    x = np.full(1000, 250, np.int64)
    mean, std, _ = welford_isize_stats(x)
    assert welford_native(x) == (mean, std) == (250.0, 0.0)
