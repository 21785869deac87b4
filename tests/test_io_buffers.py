"""pcl::io buffers — every vector from reference test/io/test_buffers.cpp
(int8 / int32 / float instantiations; invalid = NaN for float, 0 for
ints)."""

import numpy as np
import pytest

from pcl_tpu.io.buffers import SingleBuffer, MedianBuffer, AverageBuffer

DTYPES = [np.int8, np.int32, np.float32]


def _check(buf, data, expected, dtype):
    data = np.asarray(data, np.float64)
    expected = np.asarray(expected, np.float64)
    n = buf.size
    for i in range(len(data) // n):
        frame = data[i * n:(i + 1) * n]
        if dtype != np.float32:
            frame = np.nan_to_num(frame)        # invalid -> 0 for ints
        buf.push(frame.astype(dtype))
        exp = expected[i * n:(i + 1) * n]
        for j in range(n):
            if np.isnan(exp[j]):
                if dtype == np.float32:
                    assert np.isnan(buf[j])
                else:
                    assert buf[j] == 0
            else:
                assert buf[j] == exp[j], (i, j, buf[j], exp[j])


@pytest.mark.parametrize("dtype", DTYPES)
class TestBuffers:
    def test_single(self, dtype):
        _check(SingleBuffer(1, dtype), [5, 4, 3, 2, 1], [5, 4, 3, 2, 1],
               dtype)

    def test_median_window1(self, dtype):
        _check(MedianBuffer(1, 1, dtype), [5, 4, 3, 2, 1], [5, 4, 3, 2, 1],
               dtype)

    def test_median_window2(self, dtype):
        _check(MedianBuffer(1, 2, dtype), [5, 4, 3, 2, 1], [5, 5, 4, 3, 2],
               dtype)
        _check(MedianBuffer(1, 2, dtype), [3, 4, 1, 3, 4], [3, 4, 4, 3, 4],
               dtype)

    def test_median_window3(self, dtype):
        _check(MedianBuffer(1, 3, dtype), [5, 4, 3, 2, 1, -1, -1],
               [5, 5, 4, 3, 2, 1, -1], dtype)
        _check(MedianBuffer(1, 3, dtype), [3, 4, 1, 3, 4, -1, -1],
               [3, 4, 3, 3, 3, 3, -1], dtype)
        _check(MedianBuffer(1, 3, dtype), [-4, -1, 3, -4, 1, 3, 4, -1],
               [-4, -1, -1, -1, 1, 1, 3, 3], dtype)

    def test_median_window4(self, dtype):
        _check(MedianBuffer(1, 4, dtype), [5, 4, 3, 2, 1, -1, -1],
               [5, 5, 4, 4, 3, 2, 1], dtype)
        _check(MedianBuffer(1, 4, dtype), [-4, -1, 3, -4, 1, 3, 4, -2],
               [-4, -1, -1, -1, 1, 3, 3, 3], dtype)

    def test_median_push_invalid(self, dtype):
        nan = np.nan
        _check(MedianBuffer(1, 3, dtype),
               [5, 4, 3, nan, 1, nan, nan, nan, 9, 3, 1],
               [5, 5, 4, 4, 3, 1, 1, nan, 9, 9, 3], dtype)

    def test_median_size3_window3(self, dtype):
        _check(MedianBuffer(3, 3, dtype),
               [3, 3, 3, 1, 1, 1, -1, -1, -1],
               [3, 3, 3, 3, 3, 3, 1, 1, 1], dtype)
        _check(MedianBuffer(3, 3, dtype),
               [3, 2, 1, 1, 1, 1, 3, 2, 1, 1, 2, 3],
               [3, 2, 1, 3, 2, 1, 3, 2, 1, 1, 2, 1], dtype)

    def test_average_window1(self, dtype):
        _check(AverageBuffer(1, 1, dtype), [5, 4, 3, 2, 1], [5, 4, 3, 2, 1],
               dtype)

    def test_average_window2(self, dtype):
        _check(AverageBuffer(1, 2, dtype), [5, 3, 3, 1, 1], [5, 4, 3, 2, 1],
               dtype)
        _check(AverageBuffer(1, 2, dtype), [3, 5, 1, 13, 3], [3, 4, 3, 7, 8],
               dtype)

    def test_average_window3(self, dtype):
        _check(AverageBuffer(1, 3, dtype), [5, 3, 1, 2, -3, 4, -7],
               [5, 4, 3, 2, 0, 1, -2], dtype)
        _check(AverageBuffer(1, 3, dtype), [3, -5, 2, -3, 4, -1, -3],
               [3, -1, 0, -2, 1, 0, 0], dtype)
