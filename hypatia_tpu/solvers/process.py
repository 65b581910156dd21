"""Host-side preprocessing / postprocessing.

Runs once per solve (NumPy/SciPy on CPU — rank-revealing pivoted QR has no
TPU/XLA kernel, and this is outside the hot loop; `SURVEY.md` §7 "hard
parts").  Mirrors `src/Solvers/process.jl`:

- `rescale_data`:   Ruiz-like sqrt row/col equilibration (`process.jl:13-60`)
- `find_initial_x`: least-squares init + dual-equality preprocessing via
                    rank-revealing QR of [A; G] (`process.jl:64-178`)
- `find_initial_y`: primal-equality preprocessing via QR of A', and the
                    `reduce` transformation eliminating all p equalities
                    (`process.jl:182-365`)
- `postprocess`:    un-reduce / un-preprocess / un-rescale the final point
                    (`process.jl:385-458`)
"""

import numpy as np
import scipy.linalg


class Preprocess:
    """Result of preprocessing: the (possibly modified) model data plus the
    transforms needed to postprocess, and the initial x/y."""

    def __init__(self):
        self.status = None  # None = ok; else terminal status string
        self.used_rescaling = False
        self.c_scale = None
        self.b_scale = None
        self.h_scale = None
        self.x_keep_idxs = None
        self.y_keep_idxs = None
        self.Ap_R = None  # upper-triangular (p x p) for QRChol
        self.Ap_Q = None  # full orthogonal (n x n)
        self.reduce_cQ1 = None
        self.reduce_Rpib0 = None
        self.reduce_GQ1 = None
        self.reduce_Ap_R = None
        self.reduce_Ap_Q = None
        self.reduce_y_keep_idxs = None
        self.init_x = None
        self.init_y = None


def _rank_est(R, tol):
    """Diagonal-of-R thresholded rank estimate (`process.jl:370-382`)."""
    d = np.abs(np.diag(R))
    return int(np.sum(d > tol))


def rescale_data(model, pre):
    """Sqrt row/col equilibration of (c, A, b, G, h) (`process.jl:13-60`)."""
    c, A, b, G, h = model.c, model.A, model.b, model.G, model.h
    minval = np.sqrt(np.finfo(model.dtype).eps)

    def maxabsmin(v):
        return max(np.max(np.abs(v)) if v.size else 0.0, minval)

    c_scale = np.sqrt(np.maximum.reduce([
        np.abs(c),
        np.abs(A).max(axis=0, initial=minval),
        np.abs(G).max(axis=0, initial=minval),
    ]))
    b_scale = np.sqrt(np.maximum(
        np.abs(b), np.abs(A).max(axis=1, initial=minval))) if model.p else np.ones(0, dtype=model.dtype)

    h_scale = np.ones(model.q, dtype=model.dtype)
    from hypatia_tpu.cones.nonnegative import Nonnegative
    for cone, (start, dim) in zip(model.cones, model.cone_idxs):
        idxs = slice(start, start + dim)
        if isinstance(cone, Nonnegative):
            h_scale[idxs] = np.sqrt(np.maximum(
                np.abs(h[idxs]), np.abs(G[idxs, :]).max(axis=1, initial=minval)))
        else:
            h_scale[idxs] = np.sqrt(max(
                maxabsmin(h[idxs]), maxabsmin(G[idxs, :])))

    model.c = c / c_scale
    model.A = (A / c_scale[None, :]) / b_scale[:, None] if model.p else A / c_scale[None, :]
    model.G = (G / c_scale[None, :]) / h_scale[:, None]
    model.b = b / b_scale
    model.h = h / h_scale
    pre.used_rescaling = True
    pre.c_scale, pre.b_scale, pre.h_scale = c_scale, b_scale, h_scale
    return True


def find_initial_x(model, pre, init_s, preprocess, init_tol_qr, verbose=False,
                   use_indirect=False):
    """Initial x = lsq solution of [A; G] x = [b; h - s]; optionally drop
    dependent dual equalities (`process.jl:64-178`)."""
    n = model.n
    if n == 0:
        pre.x_keep_idxs = np.zeros(0, dtype=int)
        pre.init_x = np.zeros(0, dtype=model.dtype)
        return
    pre.x_keep_idxs = np.arange(n)
    rhs = np.concatenate([model.b, model.h - init_s])

    if use_indirect:
        # device LSQR on matvecs with [A; G]: no host QR of the stacked
        # matrix, the setup bottleneck for large models
        # (`process.jl:86-95` init_use_indirect)
        import jax.numpy as jnp

        from hypatia_tpu.ops.lsqr import lsqr

        A_d, G_d = jnp.asarray(model.A), jnp.asarray(model.G)
        p = model.p
        mv = (lambda v: jnp.concatenate([A_d @ v, G_d @ v])) if p \
            else (lambda v: G_d @ v)
        rmv = (lambda u: A_d.T @ u[:p] + G_d.T @ u[p:]) if p \
            else (lambda u: G_d.T @ u)
        pre.init_x = np.asarray(lsqr((mv, rmv, n), jnp.asarray(rhs)))
        return

    AG = np.vstack([model.A, model.G]) if model.p else model.G.copy()

    Q, R, piv = scipy.linalg.qr(AG, mode="full", pivoting=True)
    rank = _rank_est(R, init_tol_qr)

    if not preprocess or rank == n:
        if rank < n and verbose:
            print("some dual equalities appear dependent; "
                  "try preprocess=True")
        pre.init_x, *_ = np.linalg.lstsq(AG, rhs, rcond=None)
        return

    # drop dependent dual equalities (columns of AG / entries of x)
    x_keep_idxs = piv[:rank]
    AG_R = R[:rank, :rank]
    c_sub = model.c[x_keep_idxs]
    yz_sub = np.zeros(model.p + model.q, dtype=model.dtype)
    yz_sub[:rank] = scipy.linalg.solve_triangular(AG_R.T, c_sub, lower=True)
    yz_sub = Q @ yz_sub
    residual = np.max(np.abs(
        (model.A.T @ yz_sub[:model.p] if model.p else 0)
        + model.G.T @ yz_sub[model.p:] - model.c))
    if residual > init_tol_qr:
        if verbose:
            print(f"dual equality constraints inconsistent "
                  f"(residual {residual:.2e})")
        pre.status = "DualInconsistent"
        return
    if verbose:
        print(f"{n - rank} of {n} dual equality constraints are dependent")

    model.c = c_sub
    model.A = model.A[:, x_keep_idxs]
    model.G = model.G[:, x_keep_idxs]
    model.n = rank
    pre.x_keep_idxs = x_keep_idxs

    temp = Q.T @ np.concatenate([model.b, model.h - init_s])
    pre.init_x = scipy.linalg.solve_triangular(AG_R, temp[:rank], lower=False)


def find_initial_y(model, pre, init_z, reduce, preprocess, init_tol_qr,
                   verbose=False, use_indirect=False):
    """Initial y = lsq solution of A'y = -c - G'z; optionally drop dependent
    primal equalities or `reduce` them away entirely (`process.jl:182-365`)."""
    p = model.p
    if p == 0:
        pre.y_keep_idxs = np.zeros(0, dtype=int)
        pre.Ap_R = np.zeros((0, 0), dtype=model.dtype)
        pre.Ap_Q = None  # identity
        pre.init_y = np.zeros(0, dtype=model.dtype)
        return
    n = model.n

    if use_indirect and not reduce and not preprocess:
        # device LSQR on A' (`process.jl:209-211` init_use_indirect)
        import jax.numpy as jnp

        from hypatia_tpu.ops.lsqr import lsqr

        rhs = -model.c - model.G.T @ init_z
        pre.init_y = np.asarray(
            lsqr(jnp.asarray(model.A.T), jnp.asarray(rhs)))
        return

    Ap = model.A.T.copy()
    Q, R, piv = scipy.linalg.qr(Ap, mode="full", pivoting=True)
    rank = _rank_est(R, init_tol_qr)

    if not reduce and not preprocess:
        if rank < p and verbose:
            print("some primal equalities appear dependent")
        rhs = -model.c - model.G.T @ init_z
        pre.init_y, *_ = np.linalg.lstsq(Ap, rhs, rcond=None)
        return

    Ap_R = R[:rank, :rank]
    y_keep_idxs = piv[:rank]
    b_sub = model.b[y_keep_idxs]

    if rank < p:
        # dependent primal equalities: consistency check
        x_sub = np.zeros(n, dtype=model.dtype)
        x_sub[:rank] = scipy.linalg.solve_triangular(Ap_R.T, b_sub, lower=True)
        x_sub = Q @ x_sub
        residual = np.max(np.abs(model.A @ x_sub - model.b))
        if residual > init_tol_qr:
            if verbose:
                print(f"primal equality constraints inconsistent "
                      f"(residual {residual:.2e})")
            pre.status = "PrimalInconsistent"
            return
        if verbose:
            print(f"{p - rank} of {p} primal equality constraints "
                  f"are dependent")

    if reduce:
        # eliminate all primal equalities: n -> n - rank, p -> 0
        # (`process.jl:274-338`); recover x0 = Q [R'^-1 b; x], y0 from z0.
        cQ = model.c @ Q
        cQ1, cQ2 = cQ[:rank], cQ[rank:]
        Rpib0 = scipy.linalg.solve_triangular(Ap_R.T, b_sub, lower=True)
        model.obj_offset += float(cQ1 @ Rpib0)
        model.c = cQ2.copy()
        model.n = model.c.size
        GQ = model.G @ Q
        GQ1, GQ2 = GQ[:, :rank], GQ[:, rank:]
        model.h = model.h - GQ1 @ Rpib0
        model.G = GQ2.copy()
        model.p = 0
        model.A = np.zeros((0, model.n), dtype=model.dtype)
        model.b = np.zeros(0, dtype=model.dtype)

        pre.reduce_cQ1 = cQ1
        pre.reduce_Rpib0 = Rpib0
        pre.reduce_GQ1 = GQ1
        pre.reduce_Ap_R = Ap_R
        pre.reduce_Ap_Q = Q
        pre.reduce_y_keep_idxs = y_keep_idxs
        pre.Ap_R = np.zeros((0, 0), dtype=model.dtype)
        pre.Ap_Q = None
        pre.init_y = np.zeros(0, dtype=model.dtype)
        return

    # preprocess only: drop dependent rows of A, keep QR transforms for QRChol
    rhs = -model.c - model.G.T @ init_z
    temp = Q.T @ rhs
    init_y = scipy.linalg.solve_triangular(Ap_R, temp[:rank], lower=False)

    model.A = model.A[y_keep_idxs, :]
    model.b = b_sub
    model.p = rank
    pre.y_keep_idxs = y_keep_idxs
    pre.Ap_R = Ap_R
    pre.Ap_Q = Q
    pre.init_y = init_y


def postprocess(solver_status, orig_model, model, pre, point, result):
    """Map the solver-model point back to the original model
    (`process.jl:385-458`). `point`/`result` are dicts of numpy arrays."""
    infeas = solver_status in ("PrimalInfeasible", "DualInfeasible")
    tau = 1.0 if infeas else float(point["tau"])
    if not infeas and tau <= 0:
        for key in ("x", "y", "z", "s"):
            result[key][:] = np.nan
        return

    result["s"][:] = point["s"] / tau
    result["z"][:] = point["z"] / tau

    # x
    if pre.preprocess_used and orig_model.n > 0 and not np.any(np.isnan(point["x"])):
        if pre.reduce_Ap_Q is not None and orig_model.p > 0:
            rank = pre.reduce_Rpib0.size
            xa = np.zeros(orig_model.n - rank, dtype=orig_model.dtype)
            xa[pre.x_keep_idxs] = point["x"] / tau
            Rpib0 = np.zeros(rank) if infeas else pre.reduce_Rpib0
            xb = np.concatenate([Rpib0, xa])
            result["x"][:] = pre.reduce_Ap_Q @ xb
        else:
            result["x"][:] = 0
            result["x"][pre.x_keep_idxs] = point["x"] / tau
    else:
        result["x"][:] = point["x"] / tau

    # y
    if pre.preprocess_used and orig_model.p > 0 and (
            pre.reduce_Ap_Q is not None or not np.any(np.isnan(point["y"]))):
        if pre.reduce_Ap_Q is not None:
            # y = R^-1 (-cQ1 - GQ1' z)
            ya = pre.reduce_GQ1.T @ result["z"]
            if not infeas:
                ya = ya + pre.reduce_cQ1
            rank = pre.reduce_y_keep_idxs.size
            ya = scipy.linalg.solve_triangular(pre.reduce_Ap_R, ya[:rank],
                                               lower=False)
            result["y"][:] = 0
            result["y"][pre.reduce_y_keep_idxs] = -ya
        else:
            result["y"][:] = 0
            result["y"][pre.y_keep_idxs] = point["y"] / tau
    else:
        result["y"][:] = point["y"] / tau

    if pre.used_rescaling:
        result["s"][:] *= pre.h_scale
        result["z"][:] /= pre.h_scale
        if orig_model.p:
            result["y"][:] /= pre.b_scale
        result["x"][:] /= pre.c_scale
