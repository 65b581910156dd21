"""Dense linear-algebra building blocks for the TPU compute path.

TPU/XLA supports f64 cholesky, eigh, qr and matmul, but NOT f64 LU
(LuDecomposition is f32-only), so:

- SPD solves go through Cholesky with an escalating diagonal-shift recovery,
  the functional analog of the reference's factorization fallback chain
  Cholesky -> Bunch-Kaufman -> shifted (`src/linearalgebra/dense.jl:194-215`).
- General square solves (naive/symindef system solvers) go through QR.

All functions are pure and jit/vmap friendly; failure is propagated as NaN and
handled by `where`-style masking in callers.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from hypatia_tpu.ops import blocked


import contextlib
import contextvars
import os

# Blocked factorizations are scoped, not global: XLA's native
# cholesky/triangular_solve serialize over vmap batch axes on TPU, so
# vmapped contexts (line-search candidate checks, the batched-instance
# solve body) opt in via `with blocked_scope():`. Unbatched factorizations
# keep the native kernels — the blocked implementations inline O(n) unrolled
# steps into the program (8k HLO lines at n=128), which multiplies the
# remote-compile cost of every solver program if used unconditionally.
_BLOCKED = contextvars.ContextVar("use_blocked", default=False)


@contextlib.contextmanager
def blocked_scope(enable=True):
    """Scope the blocked (vmap-vectorizing) factorizations to traces
    performed inside the with-block."""
    token = _BLOCKED.set(bool(enable))
    try:
        yield
    finally:
        _BLOCKED.reset(token)


def _use_blocked():
    if os.environ.get("HYPATIA_TPU_NO_BLOCKED"):
        return False
    if os.environ.get("HYPATIA_TPU_FORCE_BLOCKED"):
        return jax.default_backend() != "cpu"
    return _BLOCKED.get() and jax.default_backend() != "cpu"


def in_blocked_scope():
    """Whether an enclosing blocked_scope has enabled the blocked kernels
    (used to keep inner policy scopes from disabling an outer opt-in)."""
    return _BLOCKED.get()


def _vmapped(x):
    """True if `x` is (wrapped around) a vmap batching tracer.

    The Pallas dd kernel is a per-matrix program; vmapped lanes must keep
    the blocked (vmap-vectorizing) kernels.  A value produced inside
    `jax.vmap` carries a BatchTracer somewhere in its tracer stack — walk
    it (grad/jvp wrap BatchTracers in JVPTracers exposing `.primal`)."""
    from jax._src.interpreters import batching

    seen = 0
    while isinstance(x, jax.core.Tracer) and seen < 16:
        if isinstance(x, batching.BatchTracer):
            return True
        x = getattr(x, "primal", getattr(x, "val", None))
        seen += 1
    return False


def _use_pallas_dd(A):
    """Default-on policy for the fused 2xf32 Pallas factorization on TPU:
    unbatched real matrices (vmapped lanes keep the blocked kernels; the
    Pallas kernel is per-matrix). Kill switch HYPATIA_TPU_NO_PALLAS_DD."""
    if os.environ.get("HYPATIA_TPU_NO_PALLAS_DD"):
        return False
    if _vmapped(A):
        return False  # vmapped lanes keep the blocked kernels
    dev = jax.config.jax_default_device
    if dev is not None and dev.platform != "tpu":
        return False  # inside a `with jax.default_device(cpu)` scope
    # n >= 96: at small sizes the pad-to-128 pallas call (plus the unused
    # inverse for chol-only callers, and lost XLA fusion) measurably LOSES
    # to the blocked kernels inside cone-oracle chains — doptimaldesign
    # 44.4 vs 69.5 it/s, polymin 39.3 vs 58.7 (solve A/B, round 3); at
    # Schur sizes it wins big (linearopt 113.5 -> 198.3).
    # n <= 1536: the measured regime cap — the panel recursion inlines
    # O((n/256)^2) dd kernel calls + f64 (f32x3-emulated) MXU updates into
    # the program, and remote-compile wall grows superlinearly (observed
    # >1h for a Schur-1584 model, r4); above the cap XLA's native chol
    # compiles in seconds and its runtime cost is amortized by the
    # n^3 work at those sizes.
    return (jax.default_backend() == "tpu"
            and not jnp.iscomplexobj(A) and A.ndim == 2
            and A.dtype == jnp.float64
            and 96 <= A.shape[-1] <= 1536)


def _auto_blocked_any(A):
    """Auto-dispatch policy for ALL real factorizations on accelerator
    backends (not just the Schur): measured on TPU v5e, XLA's native
    kernels have a ~0.3-0.5 ms latency floor that grows with size
    (chol: 0.46/0.63/1.37/3.04/7.2 ms at n=8/16/32/64/128) while the
    blocked kernels run 2-8x faster at every size (0.06/0.0/0.44/1.16/2.3)
    — benchmarks/smallfact_r3.py, blocked_fresh_r3.py. Cone-oracle chains
    (matrix cones' point_aux) are the dominant per-iteration cost on the
    non-LP configs, so the policy covers them too. Opt out with
    HYPATIA_TPU_NO_AUTO_BLOCKED (scoped opt-ins still apply)."""
    if os.environ.get("HYPATIA_TPU_NO_BLOCKED"):
        return False
    if os.environ.get("HYPATIA_TPU_NO_AUTO_BLOCKED"):
        return False
    dev = jax.config.jax_default_device
    if dev is not None and dev.platform == "cpu":
        return False  # inside a `with jax.default_device(cpu)` scope
    return (jax.default_backend() != "cpu"
            and not jnp.iscomplexobj(A) and A.shape[-1] <= 512)


def solve_tri(L, B, lower=True, trans=False):
    """Triangular solve wrapper (unit_diagonal=False).

    trans=True solves with the (conjugate, for complex) transpose of L.
    """
    if trans:
        tr = 2 if jnp.iscomplexobj(L) else 1
    else:
        tr = 0
    return jsl.solve_triangular(L, B, lower=lower, trans=tr)


def cholesky(A):
    """Lower Cholesky, dispatched by measured TPU latency: fused Pallas dd
    kernel for unbatched real f64 (0.067 ms at n=128), matmul-only blocked
    implementation inside blocked scopes / auto policy (vectorizes under
    vmap; XLA's native kernel serializes over batch axes on TPU), LAPACK
    elsewhere."""
    if _use_pallas_dd(A):
        from hypatia_tpu.ops import pallas_dd

        return blocked.blocked_chol_and_inv(
            A, base=256, base_case=pallas_dd.dd_chol_and_tri_inv)[0] \
            if A.shape[-1] > 256 else pallas_dd.dd_chol_and_tri_inv(A)[0]
    if (_use_blocked() or _auto_blocked_any(A)) \
            and not jnp.iscomplexobj(A):
        return blocked.blocked_cholesky(A)
    return jnp.linalg.cholesky(A)


def chol_ok(L):
    """True if a Cholesky factor is finite (factorization succeeded)."""
    return jnp.all(jnp.isfinite(L))


# trace-time override for cholesky_shifted's retry count; the line search
# sets it to 1 (via Cone.point_aux_light / chol_tries) so candidate checks
# pay for a single factorization — a shift-needing trial point is simply
# infeasible. A ContextVar (not a module global) so concurrent traces in
# other threads are unaffected.
import contextlib
import contextvars

_CHOL_TRIES = contextvars.ContextVar("chol_tries", default=4)


@contextlib.contextmanager
def chol_tries(n: int):
    """Scope cholesky_shifted's default retry count to `n` for traces
    performed inside the with-block."""
    token = _CHOL_TRIES.set(int(n))
    try:
        yield
    finally:
        _CHOL_TRIES.reset(token)


def cholesky_shifted(A, num_tries: int = None):
    """Cholesky of symmetric A with escalating diagonal shift on failure.

    Returns (L, ok). Mirrors `posdef_fact_copy!` recovery
    (`src/linearalgebra/dense.jl:194-215`): on factorization failure, retry
    with ``A + shift*I`` for escalating shifts.

    The retries live inside a ``lax.cond`` so the common case (first
    factorization succeeds) pays for exactly ONE cholesky on device —
    a measured ~4x cut of the dominant per-iteration cost on TPU, where
    cholesky is a sequential blocked kernel (~7 ms at n=256). Under vmap
    the cond lowers to a select (both branches run for all lanes), which
    matches the old always-run-4 behavior.
    """
    if num_tries is None:
        num_tries = _CHOL_TRIES.get()
    d = A.shape[-1]
    if d == 0:  # zero-variable models (e.g. pure feasibility problems)
        return A, jnp.asarray(True)
    # route through the module dispatcher (pallas-dd / blocked / native)
    chol = cholesky
    L0 = chol(A)
    ok0 = chol_ok(L0)
    if num_tries <= 1:
        return L0, ok0

    eps = jnp.finfo(A.dtype).eps

    def fallback(_):
        diag_max = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(A))), 1.0)

        def try_shift(carry, i):
            L, ok = carry
            shift = diag_max * eps * (100.0 ** i.astype(A.dtype))
            Ls = chol(A + shift * jnp.eye(d, dtype=A.dtype))
            oks = chol_ok(Ls)
            take = (~ok) & oks
            L = jnp.where(take, Ls, L)
            ok = ok | oks
            return (L, ok), None

        init = (L0, ok0)
        (L, ok), _ = jax.lax.scan(try_shift, init,
                                  jnp.arange(1, num_tries))
        return L, ok

    return jax.lax.cond(ok0, lambda _: (L0, ok0), fallback, None)


def auto_blocked_schur(A):
    """Policy: use the blocked factorization kernels for the (unbatched)
    Schur factorization on accelerator backends.

    Measured on TPU v5e (f64, fresh-input chained timing,
    benchmarks/blocked_fresh_r3.py): XLA's native chol(128)+inverse is
    8.7 ms — a latency-bound sequential kernel, value-independent — while
    the blocked base-16 combined kernel is 3.6 ms. Enabled for real dtypes
    up to 512 (larger sizes unmeasured and compile-heavy); kill switch
    HYPATIA_TPU_NO_BLOCKED, force with HYPATIA_TPU_FORCE_BLOCKED.
    """
    if os.environ.get("HYPATIA_TPU_NO_BLOCKED"):
        return False
    if jax.default_backend() == "cpu":
        return bool(os.environ.get("HYPATIA_TPU_FORCE_BLOCKED"))
    return (not jnp.iscomplexobj(A)) and A.shape[-1] <= 512


def cholesky_shifted_and_inv(A, num_tries: int = None):
    """(L, A^-1, ok) with the shifted-retry recovery of cholesky_shifted.

    Inside blocked scopes (or under auto_blocked_schur policy via an
    enclosing blocked_scope) the combined blocked kernel produces the
    factor and the triangular inverse in one recursion — cheaper than
    chol followed by a separate inverse (3.6 vs ~5+ ms at n=128 on TPU).
    """
    if num_tries is None:
        num_tries = _CHOL_TRIES.get()
    d = A.shape[-1]
    if d == 0:
        return A, A, jnp.asarray(True)

    if _use_pallas_dd(A):
        # fused 2xf32 double-single Pallas kernel — the measured-fastest
        # TPU factorization by a wide margin (n=128: 0.067 ms vs 3.5 ms
        # blocked vs 8.7 ms native; ~1e-13 factor accuracy, refinement
        # covers the rest — BASELINE.md Pallas memo). Above the panel
        # size: Pallas panels + XLA f64 (f32x3-emulated) MXU updates.
        from hypatia_tpu.ops import pallas_dd

        def fact(M):
            L, X = blocked.blocked_chol_and_inv(
                M, base=256, base_case=pallas_dd.dd_chol_and_tri_inv)
            return L, X.swapaxes(-1, -2) @ X
    elif _use_blocked() and not jnp.iscomplexobj(A):
        def fact(M):
            L, Li = blocked.blocked_chol_and_inv(M)
            return L, Li.swapaxes(-1, -2) @ Li
    else:
        def fact(M):
            L = jnp.linalg.cholesky(M)
            return L, chol_inverse(L)

    L0, inv0 = fact(A)
    ok0 = chol_ok(L0)
    if num_tries <= 1:
        return L0, inv0, ok0

    eps = jnp.finfo(A.dtype).eps

    def fallback(_):
        diag_max = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(A))), 1.0)

        def try_shift(carry, i):
            L, inv, ok = carry
            shift = diag_max * eps * (100.0 ** i.astype(A.dtype))
            Ls, invs = fact(A + shift * jnp.eye(d, dtype=A.dtype))
            oks = chol_ok(Ls)
            take = (~ok) & oks
            L = jnp.where(take, Ls, L)
            inv = jnp.where(take, invs, inv)
            ok = ok | oks
            return (L, inv, ok), None

        (L, inv, ok), _ = jax.lax.scan(try_shift, (L0, inv0, ok0),
                                       jnp.arange(1, num_tries))
        return L, inv, ok

    return jax.lax.cond(ok0, lambda _: (L0, inv0, ok0), fallback, None)


def tri_inverse(L, lower=True):
    """Explicit triangular inverse (blocked matmul-only on accelerator
    backends for real dtypes; one wide triangular solve elsewhere)."""
    if (_use_blocked() or _auto_blocked_any(L)) \
            and not jnp.iscomplexobj(L):
        if lower:
            return blocked.blocked_tri_inverse(L)
        return jnp.swapaxes(
            blocked.blocked_tri_inverse(jnp.swapaxes(L, -1, -2)), -1, -2)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return solve_tri(L, eye, lower=lower)


def tri_solve(L, B, trans=False):
    """Dispatched lower-triangular solve (blocked substitution kernel
    inside blocked scopes for real dtypes, XLA native otherwise)."""
    # auto policy only for WIDE right-hand sides: the blocked substitution
    # is n sequential steps regardless of width, a win over the native
    # kernel only when many columns amortize it (scoped opt-ins apply
    # unconditionally — vmapped lanes need the vectorizing kernels)
    wide = B.ndim >= 2 and B.shape[-1] >= 16
    if (_use_blocked() or (wide and _auto_blocked_any(L))) \
            and not jnp.iscomplexobj(L):
        one_d = B.ndim == L.ndim - 1
        Bm = B[..., None] if one_d else B
        X = blocked.blocked_tri_solve(L, Bm, trans=trans)
        return X[..., 0] if one_d else X
    return solve_tri(L, B, lower=True, trans=trans)


def cho_solve(L, B):
    """Solve A X = B given lower Cholesky factor L of A.

    Inside blocked_scope the two triangular solves run as the blocked
    SUBSTITUTION kernels (backward stable, vmap-vectorizing) instead of
    XLA's sequential triangular_solve."""
    wide = B.ndim >= 2 and B.shape[-1] >= 16
    if (_use_blocked() or (wide and _auto_blocked_any(L))) \
            and not jnp.iscomplexobj(L):
        one_d = B.ndim == L.ndim - 1
        Bm = B[..., None] if one_d else B
        Y = blocked.blocked_tri_solve(L, Bm)
        X = blocked.blocked_tri_solve(L, Y, trans=True)
        return X[..., 0] if one_d else X
    Y = solve_tri(L, B, lower=True, trans=False)
    return solve_tri(L, Y, lower=True, trans=True)


def chol_inverse(L):
    """A^-1 from the lower Cholesky factor, via one batched triangular
    solve against I.

    On TPU, triangular solves with thin right-hand sides are latency-bound
    sequential loops; computing the explicit inverse once per factorization
    turns every subsequent solve into an MXU matmul (the iterative
    refinement in the direction solver absorbs the small accuracy loss of
    the explicit-inverse form).
    """
    if (_use_blocked() or _auto_blocked_any(L)) \
            and not jnp.iscomplexobj(L):
        Li = blocked.blocked_tri_inverse(L)
    else:
        # broadcast to L's batch shape: jsl.solve_triangular's sharding
        # rule rejects a 2-D RHS against a batched triangular factor
        eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
        Li = solve_tri(L, eye, lower=True)
    return jnp.swapaxes(Li.conj(), -1, -2) @ Li


def posdef_solve(A, B, num_tries: int = 4):
    """Solve SPD system A X = B with shifted-Cholesky recovery."""
    L, ok = cholesky_shifted(A, num_tries)
    return cho_solve(L, B), ok


def qr_solve(A, b):
    """Solve general square A x = b via QR (f64-safe on TPU; no LU needed)."""
    Q, R = jnp.linalg.qr(A)
    return solve_tri(R, Q.T @ b, lower=False)


def sym_solve(A, b):
    """Solve symmetric (possibly indefinite) A x = b.

    Uses QR on TPU-compatible path (no f64 LU / Bunch-Kaufman on TPU). The
    reference uses LAPACK sytrf (`src/linearalgebra/dense.jl:36-44`).
    """
    return qr_solve(A, b)
