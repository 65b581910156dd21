"""Scaled symmetric-vectorization (svec) utilities.

Symmetric (and later Hermitian) matrices are stored as scaled upper-triangle
vectors in column-major order with off-diagonals scaled by sqrt(2), matching
the reference convention (`src/Cones/arrayutilities.jl:163-263`): for a side-d
real symmetric matrix the svec dimension is d(d+1)/2 and the entry order is
(1,1), (1,2), (2,2), (1,3), (2,3), (3,3), ...

All index bookkeeping is precomputed in NumPy (static under jit); the
pack/unpack ops are pure gathers/scatters that XLA fuses away.
"""

import functools

import numpy as np
import jax.numpy as jnp

RT2 = np.sqrt(2.0)
IRT2 = 1.0 / RT2


def svec_length(side: int) -> int:
    return side * (side + 1) // 2


def svec_side(length: int) -> int:
    side = int(round((np.sqrt(8 * length + 1) - 1) / 2))
    assert svec_length(side) == length, f"invalid svec length {length}"
    return side


@functools.lru_cache(maxsize=None)
def _svec_indices(side: int):
    """(rows, cols, is_diag) for column-major upper-triangle order."""
    rows, cols = [], []
    for j in range(side):
        for i in range(j + 1):
            rows.append(i)
            cols.append(j)
    rows = np.asarray(rows, dtype=np.int32)
    cols = np.asarray(cols, dtype=np.int32)
    return rows, cols, (rows == cols)


def smat_to_svec(W, scal: float = RT2):
    """Pack symmetric matrix W (side x side) into svec with off-diag * scal."""
    side = W.shape[-1]
    rows, cols, is_diag = _svec_indices(side)
    vals = W[..., rows, cols]
    weights = jnp.where(is_diag, 1.0, scal).astype(W.dtype)
    return vals * weights


def svec_to_smat(v, scal: float = IRT2):
    """Unpack svec v into a full symmetric matrix with off-diag * scal."""
    length = v.shape[-1]
    side = svec_side(length)
    rows, cols, is_diag = _svec_indices(side)
    weights = jnp.where(is_diag, 1.0, scal).astype(v.dtype)
    vals = v * weights
    W = jnp.zeros(v.shape[:-1] + (side, side), dtype=v.dtype)
    W = W.at[..., rows, cols].set(vals)
    W = W.at[..., cols, rows].set(vals)
    return W


def smat_to_svec_np(W, scal: float = RT2):
    """NumPy smat_to_svec for host-side model building: examples that
    called the jnp version eagerly paid a remote-compile/execute RPC per
    call on the tunneled TPU backend (~24 s of the relentr bench build)."""
    W = np.asarray(W)
    rows, cols, is_diag = _svec_indices(W.shape[-1])
    weights = np.where(is_diag, 1.0, scal)
    return W[..., rows, cols] * weights


def svec_to_smat_np(v, scal: float = IRT2):
    """NumPy svec_to_smat (see smat_to_svec_np)."""
    v = np.asarray(v)
    side = svec_side(v.shape[-1])
    rows, cols, is_diag = _svec_indices(side)
    vals = v * np.where(is_diag, 1.0, scal)
    W = np.zeros(v.shape[:-1] + (side, side), dtype=v.dtype)
    W[..., rows, cols] = vals
    W[..., cols, rows] = vals
    return W


# ---------------------------------------------------------------------------
# complex Hermitian <-> real svec (side-d Hermitian -> real vector of dim d^2)
# order per column j: for i<j interleaved (re, im) scaled off-diagonals, then
# the real diagonal entry (arrayutilities.jl:81, complex branch)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _herm_svec_indices(side: int):
    """Index plan for Hermitian svec of real dim side^2.

    Returns arrays (kind, rows, cols) where kind 0=diag, 1=re offdiag,
    2=im offdiag, in reference order.
    """
    kind, rows, cols = [], [], []
    for j in range(side):
        for i in range(j):
            kind.append(1)
            rows.append(i)
            cols.append(j)
            kind.append(2)
            rows.append(i)
            cols.append(j)
        kind.append(0)
        rows.append(j)
        cols.append(j)
    return (
        np.asarray(kind, dtype=np.int32),
        np.asarray(rows, dtype=np.int32),
        np.asarray(cols, dtype=np.int32),
    )


def herm_to_svec(W, scal: float = RT2):
    """Pack complex Hermitian W (side x side) into real svec of dim side^2."""
    side = W.shape[-1]
    kind, rows, cols = _herm_svec_indices(side)
    entries = W[..., rows, cols]
    re = jnp.real(entries)
    im = jnp.imag(entries)
    vals = jnp.where(kind == 2, im, re)
    weights = jnp.where(kind == 0, 1.0, scal).astype(vals.dtype)
    return vals * weights


def svec_to_herm(v, scal: float = IRT2):
    """Unpack real svec of dim side^2 into complex Hermitian matrix."""
    length = v.shape[-1]
    side = int(round(np.sqrt(length)))
    assert side * side == length, f"invalid hermitian svec length {length}"
    kind, rows, cols = _herm_svec_indices(side)
    weights = jnp.where(kind == 0, 1.0, scal).astype(v.dtype)
    vals = v * weights
    re = jnp.where(kind != 2, vals, 0.0)
    im = jnp.where(kind == 2, vals, 0.0)
    cdtype = jnp.complex128 if v.dtype == jnp.float64 else jnp.complex64
    W = jnp.zeros(v.shape[:-1] + (side, side), dtype=cdtype)
    W = W.at[..., rows, cols].add(re + 1j * im)
    # mirror with conjugation (diagonal only added once above)
    offd = kind != 0
    W = W.at[..., cols[offd], rows[offd]].add(
        re[..., offd] - 1j * im[..., offd]
    )
    return W
