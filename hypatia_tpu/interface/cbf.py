"""Conic Benchmark Format (CBF v1-3) reader.

Reads .cbf / .cbf.gz files into a hypatia_tpu Model (continuous relaxation:
INT declarations are ignored with a warning).  Covers the blocks used by the
CBLIB benchmark instances: VER, OBJSENSE, VAR, CON, PSDVAR, PSDCON,
OBJACOORD, OBJBCOORD, ACOORD, BCOORD, HCOORD, DCOORD, FCOORD, OBJFCOORD,
with scalar domains F, L+, L-, L=, Q, QR, EXP, EXP*, POW, POW*.

The reference reads CBF via JuMP file readers (`examples/CBLIB/JuMP.jl:10-18`);
this is a native implementation mapping directly to the primal conic form.
Cone mappings follow the reference MOI bridge (`src/MathOptInterface/cones.jl`):
EXP rows (x1, x2, x3) with x1 >= x2 exp(x3/x2) map to HypoPerLog
(u, v, w) = (x3, x2, x1) (order reversal); POW(a) maps to GeneralizedPower.
"""

import gzip
import warnings

import numpy as np

from hypatia_tpu import Model, cones
from hypatia_tpu.ops.svec import svec_length, _svec_indices


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def _svec_np(M):
    side = M.shape[0]
    rows, cols, is_diag = _svec_indices(side)
    vals = M[rows, cols]
    return np.where(is_diag, vals, np.sqrt(2.0) * vals)


def read_cbf(path):
    """Parse a CBF file into (Model, objsense, obj_offset_sign_info)."""
    lines = []
    with _open(path) as f:
        for raw in f:
            line = raw.split("#")[0].rstrip("\n")
            if line.strip() or not lines or lines[-1] != "":
                lines.append(line.strip())
    it = iter([l for l in lines if l != ""])

    objsense = "MIN"
    nvar = 0
    var_groups = []           # (domain, count, params)
    con_groups = []
    psdvar_sides = []
    psdcon_sides = []
    obj_a = {}
    obj_b = 0.0
    a_coord = []              # (i, j, v)
    b_coord = {}
    h_coord = []              # (con, var, row, col, v)
    d_coord = []              # (con, row, col, v)
    f_coord = []              # (i, psdvar, row, col, v)  A entries vs psd vars
    objf_coord = []           # (psdvar, row, col, v)
    power_params = {}

    def read_domain_list(count_line):
        parts = count_line.split()
        total, ngroups = int(parts[0]), int(parts[1])
        groups = []
        for _ in range(ngroups):
            toks = next(it).split()
            dom = toks[0]
            num = int(toks[1])
            groups.append((dom, num))
        return total, groups

    tok = next(it, None)
    while tok is not None:
        if tok == "VER":
            next(it)
        elif tok == "OBJSENSE":
            objsense = next(it)
        elif tok == "POWCONES" or tok == "POW*CONES":
            hdr = next(it).split()
            nsets, ntotal = int(hdr[0]), int(hdr[1])
            params = []
            for si in range(nsets):
                na = int(next(it))
                alphas = [float(next(it)) for _ in range(na)]
                params.append(alphas)
            power_params[tok] = params
        elif tok == "VAR":
            nvar, var_groups = read_domain_list(next(it))
        elif tok == "INT":
            nint = int(next(it))
            for _ in range(nint):
                next(it)
            if nint:
                warnings.warn("CBF INT block ignored (continuous relaxation)")
        elif tok == "PSDVAR":
            npsd = int(next(it))
            psdvar_sides = [int(next(it)) for _ in range(npsd)]
        elif tok == "PSDCON":
            npsd = int(next(it))
            psdcon_sides = [int(next(it)) for _ in range(npsd)]
        elif tok == "CON":
            _, con_groups = read_domain_list(next(it))
        elif tok == "OBJACOORD":
            nnz = int(next(it))
            for _ in range(nnz):
                j, v = next(it).split()
                obj_a[int(j)] = obj_a.get(int(j), 0.0) + float(v)
        elif tok == "OBJBCOORD":
            obj_b = float(next(it))
        elif tok == "ACOORD":
            nnz = int(next(it))
            for _ in range(nnz):
                i, j, v = next(it).split()
                a_coord.append((int(i), int(j), float(v)))
        elif tok == "BCOORD":
            nnz = int(next(it))
            for _ in range(nnz):
                i, v = next(it).split()
                b_coord[int(i)] = b_coord.get(int(i), 0.0) + float(v)
        elif tok == "HCOORD":
            nnz = int(next(it))
            for _ in range(nnz):
                c_, j, r, cc, v = next(it).split()
                h_coord.append((int(c_), int(j), int(r), int(cc), float(v)))
        elif tok == "DCOORD":
            nnz = int(next(it))
            for _ in range(nnz):
                c_, r, cc, v = next(it).split()
                d_coord.append((int(c_), int(r), int(cc), float(v)))
        elif tok == "FCOORD":
            nnz = int(next(it))
            for _ in range(nnz):
                i, j, r, cc, v = next(it).split()
                f_coord.append((int(i), int(j), int(r), int(cc), float(v)))
        elif tok == "OBJFCOORD":
            nnz = int(next(it))
            for _ in range(nnz):
                j, r, cc, v = next(it).split()
                objf_coord.append((int(j), int(r), int(cc), float(v)))
        else:
            raise ValueError(f"unhandled CBF block: {tok}")
        tok = next(it, None)

    # variable layout: scalar vars then svec coords of each PSD var
    psd_offsets = []
    off = nvar
    for side in psdvar_sides:
        psd_offsets.append(off)
        off += svec_length(side)
    ntot = off

    # objective
    c = np.zeros(ntot)
    for j, v in obj_a.items():
        c[j] = v
    for j, r, cc, v in objf_coord:
        base = psd_offsets[j]
        c[base:base + svec_length(psdvar_sides[j])] += _entry_svec(
            psdvar_sides[j], r, cc, v)
    sign = 1.0
    if objsense == "MAX":
        c = -c
        sign = -1.0

    # scalar constraints matrix (rows = total scalar cons)
    ncon = sum(num for _, num in con_groups)
    Afull = np.zeros((ncon, ntot))
    bfull = np.zeros(ncon)
    for i, j, v in a_coord:
        Afull[i, j] += v
    for i, v in b_coord.items():
        bfull[i] = v
    for i, j, r, cc, v in f_coord:
        base = psd_offsets[j]
        Afull[i, base:base + svec_length(psdvar_sides[j])] += _entry_svec(
            psdvar_sides[j], r, cc, v)

    A_rows, b_eq = [], []
    G_rows, h_rows, cone_list = [], [], []

    # PSD variable cones: svec(Xj) in PosSemidefTri
    for j, side in enumerate(psdvar_sides):
        base = psd_offsets[j]
        L = svec_length(side)
        Gv = np.zeros((L, ntot))
        Gv[:, base:base + L] = -np.eye(L)
        G_rows.append(Gv)
        h_rows.append(np.zeros(L))
        cone_list.append(cones.PosSemidefTri(L))

    # scalar variable domains
    vstart = 0
    for dom, num in var_groups:
        dom = _resolve_pow(dom, power_params)
        idx = np.arange(vstart, vstart + num)
        if dom == "F":
            pass
        elif dom in ("L+", "L-"):
            Gv = np.zeros((num, ntot))
            sgn = -1.0 if dom == "L+" else 1.0
            Gv[np.arange(num), idx] = sgn
            G_rows.append(Gv)
            h_rows.append(np.zeros(num))
            cone_list.append(cones.Nonnegative(num))
        elif dom == "L=":
            Av = np.zeros((num, ntot))
            Av[np.arange(num), idx] = 1.0
            A_rows.append(Av)
            b_eq.append(np.zeros(num))
        else:
            # same coordinate permutation as the constraint branch (EXP
            # domains reorder (x1,x2,x3) -> HypoPerLog's (x3,x2,x1))
            perm = _domain_permutation(dom, num)
            Gv = np.zeros((num, ntot))
            Gv[np.arange(num), idx[perm]] = -1.0
            G_rows.append(Gv)
            h_rows.append(np.zeros(num))
            cone_list.append(_make_cone(dom, num))
        vstart += num

    # scalar constraint domains: rows A_R x + b_R in D
    row = 0
    for dom, num in con_groups:
        dom = _resolve_pow(dom, power_params)
        Ar = Afull[row:row + num, :]
        br = bfull[row:row + num]
        if dom == "F":
            pass
        elif dom == "L=":
            A_rows.append(Ar)
            b_eq.append(-br)
        elif dom in ("L+", "L-"):
            sgn = 1.0 if dom == "L+" else -1.0
            G_rows.append(-sgn * Ar)
            h_rows.append(sgn * br)
            cone_list.append(cones.Nonnegative(num))
        else:
            perm = _domain_permutation(dom, num)
            G_rows.append(-Ar[perm, :])
            h_rows.append(br[perm])
            cone_list.append(_make_cone(dom, num))
        row += num

    # PSD constraints: sum_j x_j H_j + D psd
    hc = 0
    for ci, side in enumerate(psdcon_sides):
        L = svec_length(side)
        Gp = np.zeros((L, ntot))
        hp = np.zeros(L)
        for (c_, j, r, cc, v) in h_coord:
            if c_ == ci:
                Gp[:, j] -= _entry_svec(side, r, cc, v)
        for (c_, r, cc, v) in d_coord:
            if c_ == ci:
                hp += _entry_svec(side, r, cc, v)
        G_rows.append(Gp)
        h_rows.append(hp)
        cone_list.append(cones.PosSemidefTri(L))

    A = np.vstack(A_rows) if A_rows else np.zeros((0, ntot))
    b = np.concatenate(b_eq) if b_eq else np.zeros(0)
    G = np.vstack(G_rows) if G_rows else np.zeros((0, ntot))
    h = np.concatenate(h_rows) if h_rows else np.zeros(0)
    model = Model(c, A, b, G, h, cone_list, obj_offset=sign * obj_b)
    model.obj_sign = sign
    return model


def _entry_svec(side, r, cc, v):
    """svec vector for v * (E_rc + E_cr)/denominator matching CBF symmetric
    coordinate semantics (only lower triangle given; value applies to the
    symmetric entry)."""
    M = np.zeros((side, side))
    M[r, cc] = v
    M[cc, r] = v
    return _svec_np(M)


def _resolve_pow(dom, power_params):
    """Resolve '@k:POW' / '@k:POW*' references to ('POW', alphas, dual)."""
    if isinstance(dom, str) and dom.startswith("@"):
        ref, kind = dom[1:].split(":")
        dual = kind.endswith("*")
        key = "POW*CONES" if dual else "POWCONES"
        alphas = power_params[key][int(ref)]
        return ("POW", tuple(alphas), dual)
    return dom


def _domain_permutation(dom, num):
    if dom in ("EXP", "EXP*"):
        assert num == 3
        return np.array([2, 1, 0])  # (x3, x2, x1) -> HypoPerLog order
    return np.arange(num)


def _make_cone(dom, num):
    if isinstance(dom, tuple) and dom[0] == "POW":
        # CBF power cone: x1^a1 * ... * xk^ak >= |x_{k+1..num}| with the
        # alphas normalized to sum 1 -> GeneralizedPower
        _, alphas, dual = dom
        alphas = np.asarray(alphas, dtype=float)
        alphas = alphas / alphas.sum()
        return cones.GeneralizedPower(alphas, num - len(alphas),
                                      use_dual=dual)
    if dom == "Q":
        return cones.EpiNormEucl(num)
    if dom == "QR":
        return cones.EpiPerSquare(num)
    if dom == "EXP":
        return cones.HypoPerLog(3)
    if dom == "EXP*":
        return cones.HypoPerLog(3, use_dual=True)
    raise ValueError(f"unhandled CBF cone domain {dom}")
