"""Vectorized (numpy) block-local pair-scoring kernels for the
LSH/cluster similarity operators (guide §4.2 / §8).

The quadratic *verify* step of banded similarity search — score every
candidate pair inside an LSH block or SemDeDup cell, keep the top-k /
above-threshold ones — was previously expressed as a JVM band self-join
whose per-pair dot product evaluated through interpreted higher-order
functions at ~5.7 µs/pair (measured; both the fold and a 64-term
unrolled sum — the latter trips the JVM's huge-method JIT limit).  At
sf1 (20k vectors, 16 planes / 4 bands) that is ~10² million pairs and
~580 CPU-seconds per run.  numpy does the same arithmetic at memory
bandwidth.

Exactness contract (what lets a Python kernel live inside hash-exact
operators):

* **Selection** runs on BLAS scores (``A @ M.T``), which may differ
  from the engines' sequential left-fold dot by ≲1e-13 — so candidates
  are selected with a SAFETY MARGIN below the cut (0.5e-6 rounding
  wobble + 1e-12 BLAS wobble, rounded up to ``2e-6``), making the
  selected set a guaranteed SUPERSET of every pair the exact rounded
  ordering can rank inside the cut.
* **Emitted scores** are recomputed for the selected pairs only, with
  :func:`exact_pair_scores` — a vectorized dim-loop whose per-pair
  operation order is EXACTLY the engines' fold (``((0.0 + a₀b₀) + a₁b₁)
  + …``), hence bit-identical float64 results.
* **The final verdict** (round to 6 decimals, threshold / rank filter)
  is applied afterwards in Spark SQL on those exact scores — Python
  never rounds, so no Python/Java rounding-mode mismatch can leak into
  results.
"""

from __future__ import annotations

import numpy as np

#: selection slack: 0.5e-6 (a pair can round UP onto the cut) plus BLAS
#: reassociation error (≲1e-13 for unit vectors), with headroom.
SELECT_MARGIN = 2e-6

#: row-chunk size bound for the m×m score matrix (keeps the per-chunk
#: BLAS output ≤ ~32 MB however large a block is)
_CHUNK_CELLS = 4 * 1024 * 1024


def exact_pair_scores(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Per-row dot products of two (n, dim) float64 matrices with the
    engines' exact sequential-fold operation order: ``acc = 0.0; for i:
    acc += a[i]*b[i]`` — vectorized over rows, sequential over dims, so
    each result is bit-identical to Spark's ``aggregate(zip_with(...))``
    fold and the DuckDB oracle's ``list_sum(list_transform(...))``."""
    acc = np.zeros(len(A), dtype=np.float64)
    for i in range(A.shape[1]):
        acc += A[:, i] * B[:, i]
    return acc


def _row_chunks(m: int, n_cols: int):
    step = max(1, _CHUNK_CELLS // max(1, n_cols))
    for lo in range(0, m, step):
        yield lo, min(m, lo + step)


def topk_candidate_pairs(ids: np.ndarray, M: np.ndarray, k: int):
    """For every row of the (m, dim) block matrix ``M``: the indices of
    all OTHER rows whose BLAS score is within :data:`SELECT_MARGIN` of
    the row's k-th highest — a superset of the row's exact top-k under
    (rounded score desc, id asc).  Returns (src_idx, nbr_idx) index
    arrays; caller re-scores exactly."""
    m = len(ids)
    out_src: list[np.ndarray] = []
    out_nbr: list[np.ndarray] = []
    for lo, hi in _row_chunks(m, m):
        S = M[lo:hi] @ M.T
        # self-pairs are excluded by id, which within a block is row
        # identity (one row per id per block)
        S[np.arange(lo, hi) - lo, np.arange(lo, hi)] = -np.inf
        if m - 1 <= k:
            # keep every candidate; the finite cut still excludes the
            # -inf self marker (unit-vector scores are ≥ -1)
            cut = np.full(hi - lo, -1e30)
        else:
            cut = np.partition(S, m - k, axis=1)[:, m - k] - SELECT_MARGIN
        rows, cols = np.nonzero(S >= cut[:, None])
        out_src.append(rows + lo)
        out_nbr.append(cols)
    if not out_src:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    return np.concatenate(out_src), np.concatenate(out_nbr)


def threshold_candidate_pairs(
    M: np.ndarray, threshold: float, pair_mask_fn
):
    """All (row, col) index pairs of the (m, dim) block matrix whose
    BLAS score is ≥ ``threshold - SELECT_MARGIN`` and that satisfy
    ``pair_mask_fn(rows, cols) -> bool array`` (e.g. an id ordering or a
    rank ordering).  Returns (src_idx, nbr_idx); caller re-scores
    exactly and re-applies the rounded threshold in SQL."""
    m = len(M)
    out_src: list[np.ndarray] = []
    out_nbr: list[np.ndarray] = []
    cut = threshold - SELECT_MARGIN
    for lo, hi in _row_chunks(m, m):
        S = M[lo:hi] @ M.T
        rows, cols = np.nonzero(S >= cut)
        rows = rows + lo
        keep = pair_mask_fn(rows, cols)
        out_src.append(rows[keep])
        out_nbr.append(cols[keep])
    if not out_src:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    return np.concatenate(out_src), np.concatenate(out_nbr)


_POP16 = None


def pop16_table() -> np.ndarray:
    """Lazily-built 16-bit popcount lookup (module-global so reused
    Python workers build it once per process, not once per pandas
    group)."""
    global _POP16
    if _POP16 is None:
        _POP16 = np.array(
            [bin(v).count("1") for v in range(1 << 16)], dtype=np.uint8
        )
    return _POP16


def block_matrix(pdf, vec_col: str, dim: int):
    """(valid_row_positions, (m, dim) float64 matrix) from a pandas
    group frame — rows whose vector is not exactly ``dim`` long are
    dropped (they score NULL through the JVM fold's zip_with padding and
    can never pass a threshold/rank filter; the operators' documented
    ``dim`` contract)."""
    vecs = pdf[vec_col].to_numpy()
    ok = np.array([v is not None and len(v) == dim for v in vecs])
    if not ok.any():
        return ok, np.zeros((0, dim))
    M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[ok]])
    return ok, M
