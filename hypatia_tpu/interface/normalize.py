"""Input-normalization analogs of the reference MOI layer's model
transformations (`src/MathOptInterface/wrapper.jl:300-413`):

- the reference merges every scalar GreaterThan/LessThan/Nonneg/Nonpos
  row into ONE Nonnegative cone — here `merge_nonnegative` folds runs of
  adjacent Nonnegative cones into single cones (non-adjacent runs are
  first made adjacent by an optional row permutation);
- two-sided interval constraints  l_i <= a_i'x + g_i <= u_i  become one
  EpiNormInf cone with rows scaled by 2/(u_i-l_i) and centered at the
  midpoint (`wrapper.jl:337-392`) — here `intervals_to_epinorminf`
  builds that block for the native API, and `interval_dual_untransform`
  applies the inverse scaling the reference stores in
  `opt.interval_scales` for dual recovery (`wrapper.jl:575-582`).

These are host-side NumPy passes over the Model container; the solver
itself is unchanged (the TPU compute path sees fewer, larger cones —
fewer oracle groups after BatchedCone batching).
"""

import numpy as np

from hypatia_tpu import cones
from hypatia_tpu.models.model import Model


def merge_nonnegative(model, permute=False):
    """Fold adjacent Nonnegative cones into single cones.

    With permute=True, first reorder the cone list (and G/h rows) so ALL
    Nonnegative cones become one contiguous block placed at its first
    occurrence — the full analog of the reference's single merged
    Nonnegative cone. Returns (model2, row_perm) where row_perm maps new
    row index -> old row index (identity when permute=False).
    """
    ks = list(model.cones)
    idxs = [(s, d) for (s, d) in model.cone_idxs]
    order = list(range(len(ks)))
    if permute:
        nn = [k for k in order if isinstance(ks[k], cones.Nonnegative)]
        rest = [k for k in order if not isinstance(ks[k], cones.Nonnegative)]
        if nn:
            first = min(nn)
            order = ([k for k in rest if k < first] + nn
                     + [k for k in rest if k >= first])
    row_perm = np.concatenate(
        [np.arange(idxs[k][0], idxs[k][0] + idxs[k][1]) for k in order]
    ) if order else np.arange(0)
    new_cones = []
    for k in order:
        c = ks[k]
        if (isinstance(c, cones.Nonnegative) and new_cones
                and isinstance(new_cones[-1], cones.Nonnegative)):
            new_cones[-1] = cones.Nonnegative(new_cones[-1].dim + c.dim)
        else:
            new_cones.append(
                cones.Nonnegative(c.dim)
                if isinstance(c, cones.Nonnegative) else c)
    m2 = Model(model.c, model.A, model.b,
               model.G[row_perm, :], model.h[row_perm],
               new_cones, obj_offset=model.obj_offset, dtype=model.dtype)
    return m2, row_perm


def intervals_to_epinorminf(Grows, grows, lower, upper, dtype=np.float64):
    """Build the scaled EpiNormInf block for two-sided constraints
    l <= Grows x + grows <= u (all bounds finite, u > l).

    Returns (G_block, h_block, cone, scales, mids): the rows encode
    t = 1 and  w_i = scal_i*(mid_i - g_i - a_i'x)  with
    scal_i = 2/(u_i-l_i), so  (t, w) in EpiNormInf  iff the intervals
    hold (`wrapper.jl:355-392` semantics in h - Gx form).
    """
    Grows = np.asarray(Grows, dtype=dtype)
    grows = np.asarray(grows, dtype=dtype).reshape(-1)
    lower = np.asarray(lower, dtype=dtype).reshape(-1)
    upper = np.asarray(upper, dtype=dtype).reshape(-1)
    k, n = Grows.shape
    assert lower.shape == (k,) and upper.shape == (k,)
    assert np.all(np.isfinite(lower)) and np.all(np.isfinite(upper))
    assert np.all(upper > lower)
    mids = (upper + lower) / 2
    scales = 2.0 / (upper - lower)
    G_block = np.zeros((k + 1, n), dtype=dtype)
    G_block[1:, :] = scales[:, None] * Grows
    h_block = np.concatenate([[1.0], scales * (mids - grows)])
    return G_block, h_block, cones.EpiNormInf(k + 1), scales, mids


def interval_dual_untransform(z_block, scales):
    """Recover the duals of the original interval rows from the
    EpiNormInf block duals (drop the epigraph row, rescale — the
    reference's `opt.z[opt.interval_idxs] .*= opt.interval_scales`,
    `wrapper.jl:490`)."""
    z_block = np.asarray(z_block)
    return z_block[1:] * np.asarray(scales)


def interval_slack_untransform(s_block, scales):
    """Recover the original-scale interval slacks from the EpiNormInf
    block slacks (the reference's `opt.s[opt.interval_idxs] ./=
    opt.interval_scales`, `wrapper.jl:478`)."""
    s_block = np.asarray(s_block)
    return s_block[1:] / np.asarray(scales)
