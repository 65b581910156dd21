"""Local CBLIB-style instance set (CBF text generators).

The reference's stepper benchmark pulls 10 diverse CBLIB instances from the
web (`benchmarks/stepper/README.md:8-17`); this environment has no network
egress, so an equivalent local set is generated: 10 deterministic CBF
instances covering the same block/domain diversity (LP rows, equalities,
Q / QR second-order blocks, EXP, POW, PSDCON, PSDVAR, and a mixed
instance). Each instance is constructed around a known feasible point so
the problems are solvable and bounded.

Used by benchmarks/cblib_sweep.py, which parses them through
`hypatia_tpu.interface.cbf.read_cbf` (exercising the full reader) and
solves each with the default configuration.
"""

import numpy as np


def _coords(mat, base_row=0):
    lines = []
    for (i, j), v in np.ndenumerate(mat):
        if v != 0.0:
            lines.append(f"{base_row + i} {j} {float(v)!r}")
    return lines


def _vec_coords(vec, base_row=0):
    lines = []
    for i, v in enumerate(np.asarray(vec)):
        if v != 0.0:
            lines.append(f"{base_row + i} {float(v)!r}")
    return lines


def emit_cbf(nvar, obj, con_blocks, var_blocks=None, psdcon=None,
             psdvar_sides=None, fcoord=None, objsense="MIN"):
    """Assemble CBF v2 text.

    con_blocks: list of (DOMAIN, A_rows (k x nvar), b (k,)) — scalar
    constraint rows A x + b in DOMAIN.
    var_blocks: list of (DOMAIN, count) covering all nvar variables.
    psdcon: list of (side, [(row_mats)]) — for each PSD constraint block,
    a list over variables j of side x side coefficient matrices plus a
    constant matrix as the last entry.
    """
    out = ["VER", "2", ""]
    out += ["OBJSENSE", objsense, ""]
    if psdvar_sides:
        out += ["PSDVAR", str(len(psdvar_sides))]
        out += [str(s) for s in psdvar_sides]
        out.append("")
    if var_blocks is None:
        var_blocks = [("F", nvar)]
    out += ["VAR", f"{nvar} {len(var_blocks)}"]
    out += [f"{dom} {cnt}" for dom, cnt in var_blocks]
    out.append("")
    total_rows = sum(len(b) for _, _, b in con_blocks)
    out += ["CON", f"{total_rows} {len(con_blocks)}"]
    out += [f"{dom} {len(b)}" for dom, _, b in con_blocks]
    out.append("")
    obj = np.asarray(obj)
    nz = [(j, v) for j, v in enumerate(obj) if v != 0.0]
    out += ["OBJACOORD", str(len(nz))]
    out += [f"{j} {float(v)!r}" for j, v in nz]
    out.append("")
    acoords, bcoords = [], []
    base = 0
    for _, A, b in con_blocks:
        A = np.asarray(A)
        acoords += _coords(A, base)
        bcoords += _vec_coords(b, base)
        base += len(b)
    out += ["ACOORD", str(len(acoords))] + acoords + [""]
    if bcoords:
        out += ["BCOORD", str(len(bcoords))] + bcoords + [""]
    if psdcon:
        out += ["PSDCON", str(len(psdcon))]
        out += [str(side) for side, _, _ in psdcon]
        out.append("")
        hco, dco = [], []
        for blk, (side, var_mats, const_mat) in enumerate(psdcon):
            for j, M in enumerate(var_mats):
                M = np.asarray(M)
                for r in range(side):
                    for c in range(r + 1):
                        if M[r, c] != 0.0:
                            hco.append(f"{blk} {j} {r} {c} {float(M[r, c])!r}")
            C = np.asarray(const_mat)
            for r in range(side):
                for c in range(r + 1):
                    if C[r, c] != 0.0:
                        dco.append(f"{blk} {r} {c} {float(C[r, c])!r}")
        out += ["HCOORD", str(len(hco))] + hco + [""]
        if dco:
            out += ["DCOORD", str(len(dco))] + dco + [""]
    if fcoord:
        out += ["FCOORD", str(len(fcoord))] + fcoord + [""]
    return "\n".join(out) + "\n"


def gen_instances():
    """Return dict name -> CBF text for the 10-instance local set."""
    rng = np.random.default_rng(7)
    inst = {}

    # 1. dense LP: min c'x, Ax + b >= 0, x >= 0, bounded via sum x <= B
    n, m = 20, 12
    A = rng.standard_normal((m, n))
    x0 = rng.random(n) + 0.1
    b = -(A @ x0) + rng.random(m)  # A x0 + b >= 0 slack
    c = rng.random(n) + 0.1
    inst["lp_dense"] = emit_cbf(
        n, c, [("L+", A, b)], var_blocks=[("L+", n)])

    # 2. LP with equalities
    n, m, p = 16, 8, 4
    A = rng.standard_normal((m, n))
    E = rng.standard_normal((p, n))
    x0 = rng.random(n) + 0.1
    inst["lp_eq"] = emit_cbf(
        n, rng.random(n) + 0.1,
        [("L+", A, -(A @ x0) + rng.random(m)), ("L=", E, -(E @ x0))],
        var_blocks=[("L+", n)])

    # 3. SOC: min t s.t. (t; F x - g) in Q, sum x = 1, x >= 0
    n = 10
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    g = F @ (np.ones(n) / n) + 0.01 * rng.standard_normal(n)
    nv = n + 1  # x, t  (t is the last variable)
    Aq = np.zeros((n + 1, nv))
    Aq[0, n] = 1.0
    Aq[1:, :n] = F
    bq = np.concatenate([[0.0], -g])
    Asum = np.zeros((1, nv))
    Asum[0, :n] = 1.0
    inst["soc_proj"] = emit_cbf(
        nv, np.eye(nv)[n],
        [("Q", Aq, bq), ("L=", Asum, np.array([-1.0]))],
        var_blocks=[("L+", n), ("F", 1)])

    # 4. rotated SOC: min u s.t. (u, 1, F x - g) in QR, sum x = 1
    Aq = np.zeros((n + 2, nv))
    Aq[0, n] = 1.0
    Aq[2:, :n] = F
    bq = np.concatenate([[0.0], [1.0], -g])
    inst["rsoc_proj"] = emit_cbf(
        nv, np.eye(nv)[n],
        [("QR", Aq, bq), ("L=", Asum, np.array([-1.0]))],
        var_blocks=[("L+", n), ("F", 1)])

    # 5. EXP: entropy maximization  max -sum x log x ~ min sum t_i with
    # (x_i, 1, -t_i)... CBF EXP block (x1,x2,x3): x1 >= x2 exp(x3/x2).
    # Use t_i >= x_i log(x_i / 1): rows (t... build (x1,x2,x3)=(1, x_i, -t_i)?
    # Standard: x log x <= t  <=>  (1, x, -t) no; hypatia HypoPerLog maps
    # EXP (x1,x2,x3): x1 >= x2 e^{x3/x2}.  t_i >= x_i log x_i  <=>
    # 1 >= x_i exp(-t_i / x_i)  <=> rows (1, x_i, -t_i) in EXP.
    k = 6
    nv = 2 * k  # x, t
    blocks = []
    for i in range(k):
        R = np.zeros((3, nv))
        R[1, i] = 1.0          # x2 = x_i
        R[2, k + i] = -1.0     # x3 = -t_i
        b3 = np.array([1.0, 0.0, 0.0])  # x1 = 1
        blocks.append(("EXP", R, b3))
    Asum = np.zeros((1, nv))
    Asum[0, :k] = 1.0
    cobj = np.concatenate([np.zeros(k), np.ones(k)])
    inst["exp_entropy"] = emit_cbf(
        nv, cobj, blocks + [("L=", Asum, np.array([-1.0]))],
        var_blocks=[("L+", k), ("F", k)])

    # 6. EXP mixture: geometric-programming-like
    k = 4
    nv = k + 1  # y, t
    blocks = []
    w = rng.random((k, k))
    for i in range(k):
        R = np.zeros((3, nv))
        R[0, k] = 1.0          # x1 = t
        R[2, :k] = w[i]        # x3 = w_i' y
        b3 = np.array([0.0, 1.0, 0.0])  # x2 = 1
        blocks.append(("EXP", R, b3))
    inst["exp_gp"] = emit_cbf(
        nv, np.eye(nv)[k], blocks,
        var_blocks=[("F", k), ("F", 1)],
    )

    # 7. POW: min -sum z s.t. (x_i, 1, z_i) in POW(0.5, 0.5) => z <= sqrt(x),
    # sum x = 1
    k = 5
    nv = 2 * k
    blocks = []
    for i in range(k):
        R = np.zeros((3, nv))
        R[0, i] = 1.0
        R[2, k + i] = 1.0
        b3 = np.array([0.0, 1.0, 0.0])
        blocks.append(("@0:POW", R, b3))
    Asum = np.zeros((1, nv))
    Asum[0, :k] = 1.0
    inst["pow_sqrt"] = emit_cbf(
        nv, np.concatenate([np.zeros(k), -np.ones(k)]),
        blocks + [("L=", Asum, np.array([-1.0]))],
        var_blocks=[("L+", k), ("F", k)])
    inst["pow_sqrt"] = inst["pow_sqrt"].replace(
        "VER\n2\n\n", "VER\n2\n\nPOWCONES\n1 2\n2\n0.5\n0.5\n\n")

    # 8. PSDCON: nearest-correlation-like: min t s.t.
    # C + sum_j x_j E_j PSD, |x_j| <= t rows
    side = 4
    k = 3
    C = np.eye(side) * 2.0
    mats = []
    for j in range(k):
        M = np.zeros((side, side))
        r, cc = divmod(j, side - 1)
        M[r, r + 1] = M[r + 1, r] = 1.0
        mats.append(M)
    nv = k + 1
    var_mats = [m_ for m_ in mats] + [np.zeros((side, side))]
    rows = []
    for j in range(k):
        R1 = np.zeros((1, nv))
        R1[0, j] = 1.0
        R1[0, k] = 1.0
        rows.append(R1[0])
        R2 = np.zeros((1, nv))
        R2[0, j] = -1.0
        R2[0, k] = 1.0
        rows.append(R2[0])
    inst["psdcon_corr"] = emit_cbf(
        nv, np.eye(nv)[k],
        [("L+", np.asarray(rows), np.zeros(2 * k))],
        var_blocks=[("F", k), ("L+", 1)],
        psdcon=[(side, var_mats, C)])

    # 9. PSDVAR: min <C, X> s.t. tr(X) = 1, X PSD (eigenvalue minimization)
    side = 4
    Csym = rng.standard_normal((side, side))
    Csym = (Csym + Csym.T) / 2
    fco = []
    svlen = side * (side + 1) // 2
    # objective <C, X>: OBJFCOORD block
    objf = []
    for r in range(side):
        for c in range(r + 1):
            v = Csym[r, c]
            if v != 0.0:
                objf.append(f"0 {r} {c} {float(v)!r}")
    trace_rows = []
    for r in range(side):
        trace_rows.append(f"0 0 {r} {r} 1.0")
    text = "\n".join([
        "VER", "2", "",
        "OBJSENSE", "MIN", "",
        "PSDVAR", "1", str(side), "",
        "CON", "1 1", "L= 1", "",
        "OBJFCOORD", str(len(objf))] + objf + ["",
        "FCOORD", str(len(trace_rows))] + trace_rows + ["",
        "BCOORD", "1", "0 -1.0", ""])
    inst["psdvar_eig"] = text + "\n"

    # 10. mixed LP + SOC + EXP
    n = 8
    nv = n + 2  # x, t_soc, t_exp
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    x0 = np.ones(n) / n
    g = F @ x0
    Aq = np.zeros((n + 1, nv))
    Aq[0, n] = 1.0
    Aq[1:, :n] = F
    bq = np.concatenate([[0.0], -g])
    Rexp = np.zeros((3, nv))
    Rexp[0, n + 1] = 1.0
    Rexp[2, :n] = 1.0 / n
    bexp = np.array([0.0, 1.0, 0.0])
    Asum = np.zeros((1, nv))
    Asum[0, :n] = 1.0
    cobj = np.zeros(nv)
    cobj[n] = 1.0
    cobj[n + 1] = 0.5
    inst["mixed_lp_soc_exp"] = emit_cbf(
        nv, cobj,
        [("Q", Aq, bq), ("EXP", Rexp, bexp),
         ("L=", Asum, np.array([-1.0]))],
        var_blocks=[("L+", n), ("F", 2)])

    return inst


def write_all(outdir):
    import os

    os.makedirs(outdir, exist_ok=True)
    paths = []
    for name, text in gen_instances().items():
        path = os.path.join(outdir, f"{name}.cbf")
        with open(path, "w") as f:
            f.write(text)
        paths.append(path)
    return paths


if __name__ == "__main__":
    import sys

    outdir = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/cblib_local"
    for p in write_all(outdir):
        print(p)
