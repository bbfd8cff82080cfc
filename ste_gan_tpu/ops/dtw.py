"""Monotonic DTW alignment.

The reference's only repo-authored compiled kernel is a numba-JIT O(T^2)
dynamic program (reference: ste_gan/emg_encoder/utils.py:24-54) used for the
silent-EMG loss path and silent-set evaluation. Three equivalent
implementations, same semantics:

* :func:`dtw_matrix` / :func:`dtw_alignment` — JAX, accelerator-resident.
  The DP runs as an anti-diagonal *wavefront* ``lax.scan`` (each
  anti-diagonal depends only on the previous two, so every cell of a
  diagonal computes in parallel on the VPU — O(T1+T2) sequential depth
  instead of O(T1*T2)); the backtrace is a ``lax.while_loop``.
* :func:`dtw_matrix_np` / :func:`dtw_alignment_np` — plain numpy oracle.
* the C++ kernel in ``ste_gan_tpu/native`` (see
  :mod:`ste_gan_tpu.native.dtw`) — fastest for host-side eval over long
  utterances; used automatically by :func:`align_from_distances` when built.

DP semantics (identical to the reference): ``dtw[0, 0] = 0`` (NOT
``costs[0,0]``), first row/column infinite, ``dtw[i, j] = costs[i, j] +
min(dtw[i-1, j], dtw[i, j-1], dtw[i-1, j-1])``; the backtrace walks from the
bottom-right corner taking the first-minimal predecessor in the order
(up, left, diag), recording for each row its matched column, stopping at the
first row/column.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.inf


def dtw_matrix(costs: jnp.ndarray) -> jnp.ndarray:
    """Accumulated-cost matrix via an anti-diagonal wavefront scan."""
    costs = jnp.asarray(costs)
    t1, t2 = costs.shape
    num_diags = t1 + t2 - 1
    rows = jnp.arange(t1)

    # dtw[i, j] lives on diagonal d = i + j at slot i.
    def step(carry, d):
        prev1, prev2 = carry  # diagonals d-1 and d-2, indexed by row i
        j = d - rows
        cost_d = costs[rows, jnp.clip(j, 0, t2 - 1)]

        up = jnp.roll(prev1, 1)         # dtw[i-1, j]    -> prev1[i-1]
        left = prev1                    # dtw[i, j-1]    -> prev1[i]
        diag = jnp.roll(prev2, 1)       # dtw[i-1, j-1]  -> prev2[i-1]

        best = jnp.minimum(jnp.minimum(up, left), diag)
        new = cost_d + best
        # Boundary conditions.
        new = jnp.where((rows == 0) & (j == 0), 0.0, new)          # dtw[0,0]=0
        new = jnp.where((rows == 0) & (j > 0), _INF, new)          # first row
        new = jnp.where((j == 0) & (rows > 0), _INF, new)          # first col
        new = jnp.where((j < 0) | (j > t2 - 1), _INF, new)         # off-board
        return (new, prev1), new

    init = (jnp.full((t1,), _INF), jnp.full((t1,), _INF))
    _, diags = jax.lax.scan(step, init, jnp.arange(num_diags))
    # Scatter diagonals back: dtw[i, j] = diags[i + j, i].
    ii = rows[:, None]
    jj = jnp.arange(t2)[None, :]
    return diags[ii + jj, ii]


def dtw_backtrace(dtw: jnp.ndarray, end=None) -> jnp.ndarray:
    """[T1] alignment: for each row its matched column (reference
    align_from_distances backtrace; first-minimal order up/left/diag).

    ``end=(i, j)`` starts the backtrace at a dynamic cell instead of the
    bottom-right corner — used for padded/masked batched DTW, where only the
    top-left ``[i+1, j+1]`` block of ``dtw`` is valid. Rows beyond ``i``
    stay 0 in the result."""
    t1, t2 = dtw.shape
    if end is None:
        end = (t1 - 1, t2 - 1)

    def cond(state):
        i, j, _ = state
        return (i > 0) & (j > 0)

    def body(state):
        i, j, results = state
        results = results.at[i].set(j)
        candidates = jnp.stack([
            dtw[i - 1, j], dtw[i, j - 1], dtw[i - 1, j - 1]])
        choice = jnp.argmin(candidates)  # first minimum, like python min()
        i_next = jnp.where(choice == 1, i, i - 1)
        j_next = jnp.where(choice == 0, j, j - 1)
        return i_next, j_next, results

    _, _, results = jax.lax.while_loop(
        cond, body, (jnp.asarray(end[0], jnp.int32),
                     jnp.asarray(end[1], jnp.int32),
                     jnp.zeros((t1,), jnp.int32)))
    return results


def dtw_alignment(costs: jnp.ndarray, end=None) -> jnp.ndarray:
    return dtw_backtrace(dtw_matrix(costs), end=end)


# ---------------------------------------------------------------------------
# numpy oracle (host-side)
# ---------------------------------------------------------------------------


def dtw_matrix_np(costs: np.ndarray) -> np.ndarray:
    t1, t2 = costs.shape
    dtw = np.zeros_like(costs, dtype=np.float64)
    dtw[0, 1:] = np.inf
    dtw[1:, 0] = np.inf
    for i in range(1, t1):
        for j in range(1, t2):
            dtw[i, j] = costs[i, j] + min(dtw[i - 1, j], dtw[i, j - 1],
                                          dtw[i - 1, j - 1])
    return dtw


def dtw_alignment_np(costs: np.ndarray) -> List[int]:
    dtw = dtw_matrix_np(costs)
    i, j = costs.shape[0] - 1, costs.shape[1] - 1
    results = [0] * costs.shape[0]
    while i > 0 and j > 0:
        results[i] = j
        i, j = min([(i - 1, j), (i, j - 1), (i - 1, j - 1)],
                   key=lambda x: dtw[x[0], x[1]])
    return results


def align_from_distances(distance_matrix: np.ndarray) -> List[int]:
    """Host-side alignment; prefers the native C++ kernel when built."""
    try:
        from ste_gan_tpu.native import dtw as native_dtw

        return native_dtw.align_from_distances(
            np.ascontiguousarray(distance_matrix, dtype=np.float32))
    except Exception:
        return dtw_alignment_np(distance_matrix)
