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


def _with_powcones(text, alphas):
    """Insert a POWCONES section after the VER header.

    alphas: list of alpha tuples; cone i is referenced as '@i:POW'."""
    lines = [f"POWCONES\n{len(alphas)} {sum(len(a) for a in alphas)}"]
    for a in alphas:
        lines.append(str(len(a)))
        lines += [repr(float(v)) for v in a]
    return text.replace("VER\n2\n\n", "VER\n2\n\n" + "\n".join(lines)
                        + "\n\n")


def gen_midsize_instances():
    """Mid-size CBF instances modeled on the reference's 10-instance CBLIB
    protocol list (`/root/reference/benchmarks/stepper/README.md:8-17`).

    The real CBLIB files need network downloads (cblib.zib.de) and this
    environment has no egress, so each entry here is a DETERMINISTIC
    SYNTHETIC instance of the same problem class and comparable block
    structure/size as its namesake (portfolio SOCP, truss RSOC, power
    cones, exp-cone relaxations, robust-truss PSD, dense LP).  All are
    built around known strictly feasible points.  The one real CBLIB file
    vendored with the reference (expdesign_D_8_4) is solved alongside by
    benchmarks/cblib_sweep.py.
    """
    rng = np.random.default_rng(42)
    inst = {}

    # --- synth_port_300 (namesake port_12_9_3_a_1: portfolio SOCP) ---
    # min t s.t. (t; F x) in Q(301), sum x = 1, r'x >= r0, x >= 0
    n = 300
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    r = 0.05 + 0.1 * rng.random(n)
    x0 = np.ones(n) / n
    r0 = float(r @ x0) * 0.9
    nv = n + 1
    Aq = np.zeros((n + 1, nv))
    Aq[0, n] = 1.0
    Aq[1:, :n] = F
    Asum = np.zeros((1, nv)); Asum[0, :n] = 1.0
    Aret = np.zeros((1, nv)); Aret[0, :n] = r
    inst["synth_port_300"] = emit_cbf(
        nv, np.eye(nv)[n],
        [("Q", Aq, np.zeros(n + 1)),
         ("L=", Asum, np.array([-1.0])),
         ("L+", Aret, np.array([-r0]))],
        var_blocks=[("L+", n), ("F", 1)])

    # --- synth_classical_50 (namesake classical_20_0) ---
    n = 50
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    mu = 0.02 + 0.1 * rng.random(n)
    nv = n + 1
    Aq = np.zeros((n + 1, nv))
    Aq[0, n] = 1.0
    Aq[1:, :n] = F
    Asum = np.zeros((1, nv)); Asum[0, :n] = 1.0
    cobj = np.concatenate([-mu, [1.0]])
    inst["synth_classical_50"] = emit_cbf(
        nv, cobj,
        [("Q", Aq, np.zeros(n + 1)), ("L=", Asum, np.array([-1.0]))],
        var_blocks=[("L+", n), ("F", 1)])

    # --- synth_tls_150 (namesake tls4: truss least squares, RSOC) ---
    # min sum u_i s.t. (u_i, 1, w_i'x - g_i) in QR, box rows on x
    k, nx = 150, 100
    W = rng.standard_normal((k, nx)) / np.sqrt(nx)
    g = W @ rng.standard_normal(nx) * 0.5
    nv = nx + k
    blocks = []
    for i in range(k):
        R = np.zeros((3, nv))
        R[0, nx + i] = 1.0
        R[2, :nx] = W[i]
        blocks.append(("QR", R, np.array([0.0, 1.0, -g[i]])))
    Abox = np.vstack([np.eye(nx, nv), -np.eye(nx, nv)])
    bbox = np.full(2 * nx, 2.0)
    inst["synth_tls_150"] = emit_cbf(
        nv, np.concatenate([np.zeros(nx), np.ones(k)]),
        blocks + [("L+", Abox, bbox)],
        var_blocks=[("F", nv)])

    # --- synth_ck_25x11 (namesake ck_n25_m10_o1_1: SOC groups) ---
    # 25 blocks Q(11): min sum t_j, (t_j; F_j x - g_j) in Q(11), sum x = 1
    nb_, dsub, nx = 25, 10, 125
    nv = nx + nb_
    blocks = []
    x0 = np.ones(nx) / nx
    for j in range(nb_):
        Fj = rng.standard_normal((dsub, nx)) / np.sqrt(nx)
        gj = Fj @ x0 + 0.01 * rng.standard_normal(dsub)
        R = np.zeros((dsub + 1, nv))
        R[0, nx + j] = 1.0
        R[1:, :nx] = Fj
        blocks.append(("Q", R, np.concatenate([[0.0], -gj])))
    Asum = np.zeros((1, nv)); Asum[0, :nx] = 1.0
    inst["synth_ck_25x11"] = emit_cbf(
        nv, np.concatenate([np.zeros(nx), np.ones(nb_)]),
        blocks + [("L=", Asum, np.array([-1.0]))],
        var_blocks=[("L+", nx), ("F", nb_)])

    # --- synth_rsyn_exp80 (namesake rsyn0805h: exp + LP mix) ---
    # min c'x + sum s_i s.t. (s_i, 1, a_i'x - b_i) in EXP (s_i >= e^{..}),
    # 200 L+ rows, 20 L= rows
    nx, ke, ml, me = 160, 80, 200, 20
    Aex = rng.standard_normal((ke, nx)) / np.sqrt(nx)
    bex = 1.0 + rng.random(ke)
    nv = nx + ke
    blocks = []
    for i in range(ke):
        R = np.zeros((3, nv))
        R[0, nx + i] = 1.0
        R[2, :nx] = Aex[i]
        blocks.append(("EXP", R, np.array([0.0, 1.0, -bex[i]])))
    x0 = 0.5 * np.ones(nx)
    Al = rng.standard_normal((ml, nx)) * 0.3
    bl = -(Al @ x0) + 0.5 + rng.random(ml)
    Alv = np.zeros((ml, nv)); Alv[:, :nx] = Al
    Ae = rng.standard_normal((me, nx)) * 0.3
    Aev = np.zeros((me, nv)); Aev[:, :nx] = Ae
    cobj = np.concatenate([0.01 * rng.random(nx), np.ones(ke)])
    inst["synth_rsyn_exp80"] = emit_cbf(
        nv, cobj,
        blocks + [("L+", Alv, bl), ("L=", Aev, -(Ae @ x0))],
        var_blocks=[("F", nv)])

    # --- synth_3bars_psd24 (namesake 2x3_3bars: robust truss, PSD) ---
    # min c'x s.t. C0 + sum_j x_j M_j PSD (side 24), |x_j| <= 2 rows
    side, k = 24, 20
    C0 = np.eye(side) * 3.0
    mats = []
    for j in range(k):
        v = rng.standard_normal((side,)) / np.sqrt(side)
        M = np.outer(v, v) * (1 if j % 2 else -1)
        mats.append((M + M.T) / 2)
    nv = k
    rows, bs = [], []
    for j in range(k):
        e = np.zeros(nv); e[j] = 1.0
        rows += [e, -e]; bs += [2.0, 2.0]
    inst["synth_3bars_psd24"] = emit_cbf(
        nv, 0.1 + rng.random(k),
        [("L+", np.asarray(rows), np.asarray(bs))],
        var_blocks=[("F", k)],
        psdcon=[(side, mats + [np.zeros((side, side))], C0)])

    # --- synth_hmcr_pow400 (namesake HMCR-n20-m400: power cones) ---
    # max sum z_i: (w_i'x + b_i, 1, z_i) in POW(0.3, 0.7), x box rows
    nx, k = 20, 400
    Wp = rng.standard_normal((k, nx)) / np.sqrt(nx)
    bp = 1.0 + rng.random(k)
    nv = nx + k
    blocks = []
    for i in range(k):
        R = np.zeros((3, nv))
        R[0, :nx] = Wp[i]
        R[2, nx + i] = 1.0
        blocks.append(("@0:POW", R, np.array([bp[i], 1.0, 0.0])))
    Abox = np.vstack([np.eye(nx, nv), -np.eye(nx, nv)])
    inst["synth_hmcr_pow400"] = _with_powcones(emit_cbf(
        nv, np.concatenate([np.zeros(nx), -np.ones(k)]),
        blocks + [("L+", Abox, np.full(2 * nx, 1.0))],
        var_blocks=[("F", nv)]), [(0.3, 0.7)])

    # --- synth_logexpcr_400 (namesake LogExpCR-n100-m400) ---
    # min sum s_i s.t. (s_i, 1, a_i'x - b_i) in EXP, x box rows, n=100
    nx, k = 100, 400
    Ae2 = rng.standard_normal((k, nx)) / np.sqrt(nx)
    be2 = 0.5 + rng.random(k)
    nv = nx + k
    blocks = []
    for i in range(k):
        R = np.zeros((3, nv))
        R[0, nx + i] = 1.0
        R[2, :nx] = Ae2[i]
        blocks.append(("EXP", R, np.array([0.0, 1.0, -be2[i]])))
    Abox = np.vstack([np.eye(nx, nv), -np.eye(nx, nv)])
    inst["synth_logexpcr_400"] = emit_cbf(
        nv, np.concatenate([np.zeros(nx), np.ones(k)]),
        blocks + [("L+", Abox, np.full(2 * nx, 1.0))],
        var_blocks=[("F", nv)])

    # --- synth_stolpe_soc120 (namesake achtziger_stolpe06-6.1flowc) ---
    # min c'cap s.t. (cap_i; f_i) in Q(4) per arc, E f = demand
    narc, dflow = 120, 3
    nv = narc + narc * dflow
    blocks = []
    for i in range(narc):
        R = np.zeros((1 + dflow, nv))
        R[0, i] = 1.0
        for d in range(dflow):
            R[1 + d, narc + i * dflow + d] = 1.0
        blocks.append(("Q", R, np.zeros(1 + dflow)))
    me2 = 40
    f0 = rng.standard_normal(narc * dflow) * 0.2
    E = (rng.random((me2, narc * dflow)) < 0.1).astype(float)
    E *= rng.standard_normal((me2, narc * dflow))
    Ev = np.zeros((me2, nv)); Ev[:, narc:] = E
    inst["synth_stolpe_soc120"] = emit_cbf(
        nv, np.concatenate([0.5 + rng.random(narc), np.zeros(narc * dflow)]),
        blocks + [("L=", Ev, -(E @ f0))],
        var_blocks=[("F", nv)])

    # --- synth_lp_500 (dense-LP filler of the protocol's LP slots) ---
    n, ml, me3 = 500, 250, 50
    dens = (rng.random((ml, n)) < 0.04)
    Al = dens * rng.standard_normal((ml, n))
    x0 = 0.1 + rng.random(n)
    Ae3 = (rng.random((me3, n)) < 0.04) * rng.standard_normal((me3, n))
    inst["synth_lp_500"] = emit_cbf(
        n, 0.1 + rng.random(n),
        [("L+", Al, -(Al @ x0) + 0.1 + rng.random(ml)),
         ("L=", Ae3, -(Ae3 @ x0))],
        var_blocks=[("L+", n)])

    return inst


def write_midsize(outdir):
    import os

    os.makedirs(outdir, exist_ok=True)
    paths = []
    for name, text in gen_midsize_instances().items():
        path = os.path.join(outdir, f"{name}.cbf")
        with open(path, "w") as f:
            f.write(text)
        paths.append(path)
    return paths
