"""Spectral (eigendecomposition-based) derivative utilities.

Safe divided-difference machinery for matrix functions f(A) = Q f(L) Q',
used by the matrix separable-spectral and quantum relative entropy cones.
Autodiff through `eigh` divides by eigenvalue gaps and produces NaN at
degenerate eigenvalues (e.g. at the W = c*I initial points), so these cones
use explicit Daleckii-Krein formulas with first/second divided differences
guarded near coincident eigenvalues — the same approach as the reference's
`Δh/Δ2h` matrices (`matrixcsqr.jl:91-115`) and `Δ2/Δ3` tensors
(`epitrrelentropytri.jl:52-53,221-289`).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _round_robin_rounds(d):
    """Static round-robin tournament schedule: list of rounds, each a list of
    disjoint (p, q) index pairs covering all pairs over (d-1) rounds (d even;
    odd d gets a bye)."""
    m = d if d % 2 == 0 else d + 1
    idx = list(range(m))
    rounds = []
    for _ in range(m - 1):
        pairs = []
        for i in range(m // 2):
            a, b = idx[i], idx[m - 1 - i]
            if a < d and b < d:
                pairs.append((min(a, b), max(a, b)))
        rounds.append(pairs)
        # rotate all but the first element
        idx = [idx[0]] + [idx[-1]] + idx[1:-1]
    return rounds


def jacobi_eigh(A, sweeps: int = 6):
    """Cyclic-by-rounds two-sided Jacobi eigensolver for small symmetric or
    Hermitian matrices. Returns (lam ascending, Q) with A ≈ Q diag(lam) Q'.

    Motivation: the TPU f64 `eigh` is backward-stable but loses relative
    accuracy on the small eigenvalues of ill-conditioned SPD matrices —
    exactly the regime of the quantum relative entropy cone near convergence
    (cond(V) ~ 1/mu). Two-sided Jacobi computes the small eigenvalues of SPD
    matrices to high *relative* accuracy (Demmel-Veselic), which is what the
    barrier oracles' log/divided-difference evaluations need.

    Implementation: parallel-ordering (round-robin) sweeps, each round
    applying all disjoint rotations as ONE orthogonal matrix built by
    scatter, so a round costs two dxd matmuls on the MXU.  The matrix is
    padded to even size (block-diagonal 1 dummy; rotations against it see a
    zero pivot and reduce to the identity exactly), making every round a
    uniform d/2-pair step so the sweep loop is a `lax.scan` — compile cost
    is ONE sweep regardless of sweep count (the remote TPU compiler charges
    heavily per op; a fully unrolled version cost ~36 s to compile for d=4
    at every call site)."""
    d = A.shape[-1]
    dt = A.dtype
    if d == 1:
        return jnp.real(jnp.diagonal(A)), jnp.ones_like(A)
    cplx = jnp.iscomplexobj(A)
    rdt = jnp.finfo(dt).dtype
    m = d if d % 2 == 0 else d + 1
    if m != d:
        pad = jnp.zeros((m, m), dtype=dt).at[:d, :d].set(A)
        A = pad.at[d, d].set(1.0)
    rounds = _round_robin_rounds(m)
    P_sched = np.array([[p for p, _ in pairs] for pairs in rounds])
    Q_sched = np.array([[q for _, q in pairs] for pairs in rounds])
    tiny = jnp.asarray(np.finfo(np.float64).tiny, rdt)

    def one_round(AQ, pq):
        A, Q = AQ
        P, Qi = pq
        app = jnp.real(A[P, P])
        aqq = jnp.real(A[Qi, Qi])
        apq = A[P, Qi]
        mag = jnp.abs(apq)
        # phase u = conj(apq)/|apq| (1 when apq == 0): diag(1, u) makes
        # the 2x2 pivot real positive (for real input u = sign(apq)),
        # then a real Givens rotation zeroes it
        u = jnp.where(mag > tiny,
                      jnp.conj(apq) / jnp.where(mag > tiny, mag, 1.0),
                      jnp.ones_like(apq))
        # symmetric Schur 2x2 (Golub & Van Loan 8.4): zero the (p,q) entry
        do = mag > tiny * jnp.maximum(1.0, jnp.maximum(jnp.abs(app),
                                                       jnp.abs(aqq)))
        tau = (aqq - app) / (2.0 * jnp.where(do, mag, 1.0))
        # large-tau asymptotic t ~ 1/(2 tau): tau^2 overflows the f32-pair
        # f64 emulation on the axon TPU backend (inf arithmetic inside the
        # compensated products yields NaN), so never square a large tau
        big = jnp.abs(tau) > 1e8
        tau_c = jnp.where(big, 1.0, tau)
        t = jnp.sign(tau_c) / (jnp.abs(tau_c)
                               + jnp.sqrt(1.0 + tau_c * tau_c))
        t = jnp.where(big, 0.5 / tau, t)
        t = jnp.where(tau == 0, jnp.ones_like(t), t)  # sign(0)=0 guard
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(do, c, jnp.ones_like(c))
        s = jnp.where(do, s, jnp.zeros_like(s))
        J = jnp.eye(m, dtype=dt)
        J = J.at[(P, P)].set(c.astype(dt))
        J = J.at[(P, Qi)].set(s.astype(dt))
        J = J.at[(Qi, P)].set((-s * u).astype(dt))
        J = J.at[(Qi, Qi)].set((c * u).astype(dt))
        A = J.conj().T @ A @ J
        A = (A + A.conj().T) / 2
        return (A, Q @ J), None

    def one_sweep(AQ, _):
        AQ, _ = jax.lax.scan(one_round, AQ,
                             (jnp.asarray(P_sched), jnp.asarray(Q_sched)))
        return AQ, None

    A0 = A
    (A, Q), _ = jax.lax.scan(one_sweep, (A, jnp.eye(m, dtype=dt)), None,
                             length=sweeps)
    lam = jnp.real(jnp.diagonal(A))[:d]
    Q = Q[:d, :d]
    order = jnp.argsort(lam)
    lam, Q = lam[order], Q[:, order]
    # Ogita-Aishima polish: the rotation cascade accumulates the rounding
    # of the emulated-f64 transcendentals; two quadratically-convergent
    # refinement passes (exact matmuls) restore full f64 residuals
    A_in = A0[:d, :d]
    for _ in range(2):
        lam, Q = refine_eigh_once(A_in, lam, Q)
    return lam, Q


def _eigh_resid(A, lam, Q):
    """Combined decomposition-quality metric: eigen-residual plus
    orthogonality defect (both must be small for the cone oracles)."""
    d = A.shape[-1]
    nrm = jnp.max(jnp.abs(A)) + 1e-300
    r1 = jnp.max(jnp.abs(A @ Q - Q * lam[None, :])) / nrm
    r2 = jnp.max(jnp.abs(Q.conj().T @ Q - jnp.eye(d, dtype=A.dtype)))
    return r1 + r2


def refine_eigh_once(A, lam, Q):
    """One monotone Ogita-Aishima refinement iteration of an approximate
    eigendecomposition (quadratic convergence; built from matmuls and
    gap-guarded divisions only, which stay full-precision on the TPU's
    emulated f64). Eigenvectors within a near-degenerate cluster receive
    only the orthogonality correction (their in-cluster rotation is
    arbitrary, and irrelevant for spectral functions).

    Monotone guard: the refined pair is kept only when it reduces the
    combined residual, so on backends whose `eigh` is already at the
    roundoff floor (CPU LAPACK) this is an exact no-op and cannot degrade
    an optimal decomposition."""
    d = A.shape[-1]
    eye = jnp.eye(d, dtype=A.dtype)
    R = eye - Q.conj().T @ Q
    S = Q.conj().T @ (A @ Q)
    lam_new = jnp.real(jnp.diagonal(S)) / (1.0 - jnp.real(jnp.diagonal(R)))
    li = lam_new[:, None]
    lj = lam_new[None, :]
    gap = lj - li
    scale = jnp.maximum(jnp.abs(li), jnp.abs(lj)) + 1e-300
    ok = jnp.abs(gap) > jnp.sqrt(jnp.finfo(lam_new.dtype).eps) * scale
    E_off = (S + lj * R) / jnp.where(ok, gap, 1.0)
    E = jnp.where(ok, E_off, R / 2.0)
    E = jnp.where(jnp.eye(d, dtype=bool), jnp.real(jnp.diagonal(R))[None, :] / 2.0,
                  E)
    Q_new = Q + Q @ E.astype(A.dtype)
    better = _eigh_resid(A, lam_new, Q_new) < _eigh_resid(A, lam, Q)
    lam_out = jnp.where(better, lam_new, lam)
    Q_out = jnp.where(better, Q_new, Q)
    return lam_out, Q_out


def eigh_refined(A, iters: int = 2):
    """eigh polished by Ogita-Aishima refinement iterations.

    The TPU f64 eigh is less accurate than LAPACK (enough to stall
    interior-point convergence at mu ~ 1e-6 in the quantum relative
    entropy cone); each refinement pass reduces both the orthogonality
    and eigenvector-residual error quadratically using only exact
    primitives."""
    lam, Q = jnp.linalg.eigh(A)
    for _ in range(iters):
        lam, Q = refine_eigh_once(A, lam, Q)
    return lam, Q


def fdd1(f_vals, f_der1, lam):
    """First divided difference matrix D[i,j] = (f(li)-f(lj))/(li-lj),
    D[i,i] = f'(li), with a safe switch to the midpoint derivative for
    near-coincident eigenvalues."""
    li = lam[:, None]
    lj = lam[None, :]
    diff = li - lj
    denom_ok = jnp.abs(diff) > jnp.sqrt(jnp.finfo(lam.dtype).eps) * (
        jnp.maximum(jnp.abs(li), jnp.abs(lj)) + 1e-300)
    safe_diff = jnp.where(denom_ok, diff, 1.0)
    quotient = (f_vals[:, None] - f_vals[None, :]) / safe_diff
    mid = 0.5 * (f_der1[:, None] + f_der1[None, :])
    return jnp.where(denom_ok, quotient, mid)


def fdd2_tensor(f_vals, f_der1, f_der2, lam):
    """Second divided difference tensor F2[i,j,k] = f[li, lj, lk]
    (fully symmetric), built from the first-divided-difference matrix via
    f[a,b,c] = (f[a,b] - f[b,c])/(a - c) with safe near-coincident limits."""
    d1 = fdd1(f_vals, f_der1, lam)
    li = lam[:, None, None]
    lk = lam[None, None, :]
    diff = li - lk  # (i, 1, k)
    denom_ok = jnp.abs(diff) > jnp.sqrt(jnp.finfo(lam.dtype).eps) * (
        jnp.maximum(jnp.abs(li), jnp.abs(lk)) + 1e-300)
    safe_diff = jnp.where(denom_ok, diff, 1.0)
    # (f[i,j] - f[j,k]) / (i - k)
    num = d1[:, :, None] - d1.T[None, :, :]
    generic = num / safe_diff
    # near li ~= lk use the limit f[a, lj, a] = d/da f[a, lj]
    # (= f''(a)/2 when lj ~= a as well)
    fallback = _fdd1_partial(f_vals, f_der1, f_der2, lam)  # (i, j)
    fallback = jnp.broadcast_to(fallback[:, :, None], generic.shape)
    return jnp.where(denom_ok, generic, fallback)


def fdd3_tensor(f2, f_der3, lam):
    """Third divided difference tensor F3[i,j,k,l] = f[li, lj, lk, ll]
    (fully symmetric), built from the second-divided-difference tensor via
    exact recurrences with a guarded fallback cascade (the same cascade as
    the reference's Δ4_ij, `epitrrelentropytri.jl:538-573`):

      generic            (f2[i,j,k] - f2[j,k,l]) / (li - ll)
      li ~= ll           (f2[i,j,l] - f2[j,k,l]) / (li - lk)
      li ~= ll ~= lk     (f2[i,k,l] - f2[j,k,l]) / (li - lj)
      all coincident     f'''(li) / 6

    Each alternative is an exact divided-difference recurrence (symmetry of
    the arguments lets any pair be the dividing pair), so correctness only
    needs the dividing pair to be separated.
    """
    rteps = jnp.sqrt(jnp.finfo(lam.dtype).eps)
    li = lam[:, None, None, None]
    lj = lam[None, :, None, None]
    lk = lam[None, None, :, None]
    ll = lam[None, None, None, :]

    def sep(a, b):
        return jnp.abs(a - b) > rteps * (jnp.maximum(jnp.abs(a), jnp.abs(b))
                                         + 1e-300)

    def safe(a, b, ok):
        return jnp.where(ok, a - b, 1.0)

    ok_il = sep(li, ll)
    ok_ik = sep(li, lk)
    ok_ij = sep(li, lj)

    # (i,j,k) - (j,k,l) over (li - ll)
    generic = (f2[:, :, :, None] - f2[None, :, :, :]) / safe(li, ll, ok_il)
    # (i,j,l) - (j,k,l) over (li - lk)
    alt1 = (f2[:, :, None, :] - f2[None, :, :, :]) / safe(li, lk, ok_ik)
    # (i,k,l) - (j,k,l) over (li - lj)
    alt2 = (f2[:, None, :, :] - f2[None, :, :, :]) / safe(li, lj, ok_ij)
    # all-coincident limit f'''/6
    limit = jnp.broadcast_to((f_der3 / 6.0)[:, None, None, None],
                             generic.shape)
    return jnp.where(ok_il, generic,
                     jnp.where(ok_ik, alt1,
                               jnp.where(ok_ij, alt2, limit)))


def _fdd1_partial(f_vals, f_der1, f_der2, lam):
    """g[i,j] = f[li, lj, li] = d/da f[a, lj] | a=li
    = (f'(li)(li-lj) - (f(li)-f(lj))) / (li-lj)^2, -> f''(li)/2 as lj->li."""
    li = lam[:, None]
    lj = lam[None, :]
    diff = li - lj
    denom_ok = jnp.abs(diff) > (jnp.finfo(lam.dtype).eps ** 0.25) * (
        jnp.maximum(jnp.abs(li), jnp.abs(lj)) + 1e-300)
    safe_diff = jnp.where(denom_ok, diff, 1.0)
    generic = (f_der1[:, None] * safe_diff
               - (f_vals[:, None] - f_vals[None, :])) / safe_diff**2
    limit = jnp.broadcast_to(0.5 * f_der2[:, None], generic.shape)
    return jnp.where(denom_ok, generic, limit)


def _fdd1_deriv(f_vals, f_der1, f_der2, lam):
    return _fdd1_partial(f_vals, f_der1, f_der2, lam)


def frechet(Q, dd1, B):
    """Fréchet derivative Df(A)[B] = Q (dd1 ∘ (Q' B Q)) Q' for A = Q L Q'."""
    Bt = Q.conj().T @ B @ Q
    return Q @ (dd1 * Bt) @ Q.conj().T


def svec_rotation(Q, svec_fn, smat_fn, n):
    """Materialize the orthogonal matrix R with R @ svec(B) = svec(Q' B Q).

    R is (n, n) for svec length n; cost O(n d^3) — done once per point.
    """
    eye = jnp.eye(n, dtype=jnp.real(Q).dtype)

    def col(e):
        B = smat_fn(e)
        return svec_fn(Q.conj().T @ B @ Q)

    return jax.vmap(col)(eye).T  # columns are rotated basis vectors
