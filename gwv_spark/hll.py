"""HyperLogLog distinct-count sketch — numpy register core.

BASELINE.json's north_star names "distinct-count via HyperLogLog
sketches" literally.  ``stats.column_stats`` already uses Spark's
built-in ``approx_count_distinct`` (an HLL++ aggregate) for the
one-shot number; this module supplies the MERGEABLE sketch the
incremental tier needs: per-file register arrays that can be stored,
re-read, and folded with an element-wise ``max`` — an operation that is
associative, commutative, and idempotent, so a sketch store can be
updated per appended file and the folded estimate is bit-identical to
a full recompute no matter how the rows were grouped (the property
tests/test_sketchstore.py asserts).

Algorithm: Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm" (AofA
2007), with the standard linear-counting small-range correction.  The
hash is Spark's ``xxhash64`` computed JVM-side (whole-stage codegen);
Python only ever sees int64 hash batches, and every register operation
here is a whole-array numpy op — no per-row Python.

With a 64-bit hash the large-range correction of the 32-bit paper is
unnecessary (collision probability ~n^2 / 2^64).  Standard error is
1.04/sqrt(m); at the default p=14 (m=16384 registers, 16 KB) that is
0.81%.
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_P = 14

# frexp-based bit-length extraction is exact only while the low
# (64 - p) bits fit in a float64 mantissa (53 bits)
_MIN_P = 11
_MAX_P = 18


def empty_registers(p: int = DEFAULT_P) -> np.ndarray:
    if not _MIN_P <= p <= _MAX_P:
        raise ValueError(f"p must be in [{_MIN_P}, {_MAX_P}], got {p}")
    return np.zeros(1 << p, dtype=np.uint8)


def accumulate(registers: np.ndarray, hashes: np.ndarray) -> None:
    """Fold a batch of 64-bit hashes (int64, e.g. from F.xxhash64) into
    the register array in place.  Vectorized: index = top p bits, rank =
    leading zeros of the remaining (64-p)-bit word + 1, register update
    is an unbuffered elementwise max."""
    if hashes.size == 0:
        return
    p = int(registers.size).bit_length() - 1
    u = np.ascontiguousarray(hashes, dtype=np.int64).view(np.uint64)
    idx = (u >> np.uint64(64 - p)).astype(np.int64)
    w_low = (u & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
    # frexp exponent == bit length for positive ints (exact: w_low < 2^53);
    # w_low == 0 -> e == 0 -> rank == (64 - p) + 1, the max possible
    _, e = np.frexp(w_low)
    rank = ((64 - p) + 1 - e).astype(np.uint8)
    np.maximum.at(registers, idx, rank)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sketches: element-wise register max.  Associative,
    commutative, idempotent — merge order can never change the result."""
    if a.size != b.size:
        raise ValueError(f"register size mismatch: {a.size} vs {b.size}")
    return np.maximum(a, b)


def estimate(registers: np.ndarray) -> float:
    """Cardinality estimate: raw HLL harmonic mean with the standard
    linear-counting correction when the estimate is small and empty
    registers remain."""
    m = int(registers.size)
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    inv_sum = float(np.ldexp(1.0, -registers.astype(np.int64)).sum())
    e = alpha * m * m / inv_sum
    v = int((registers == 0).sum())
    if e <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return e


def to_bytes(registers: np.ndarray) -> bytes:
    return registers.tobytes()


def from_bytes(raw: bytes) -> np.ndarray:
    return np.frombuffer(raw, dtype=np.uint8).copy()
