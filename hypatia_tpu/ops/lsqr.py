"""LSQR (Paige & Saunders) least-squares solver as a jittable while_loop.

TPU-native replacement for the reference's indirect initial-point path
(`src/Solvers/process.jl:86-95, 209-211`, IterativeSolvers.lsqr): finds the
minimum-norm least-squares solution of ``min ||A x - b||`` using only
matvecs — no host QR of the stacked [A; G], which is the setup bottleneck
for large models.

Works with an explicit matrix or a (matvec, rmatvec, n) triple.
"""

import jax
import jax.numpy as jnp


def lsqr(A, b, iter_lim=None, atol=1e-10, btol=1e-10):
    """Solve min ||A x - b||_2 by LSQR. Returns x.

    A may be a 2-D array or a tuple (matvec, rmatvec, n).
    """
    if isinstance(A, tuple):
        matvec, rmatvec, n = A
    else:
        matvec = lambda v: A @ v
        rmatvec = lambda v: A.T @ v
        n = A.shape[1]
    m = b.shape[0]
    if iter_lim is None:
        iter_lim = 2 * max(m, n)
    dt = b.dtype
    eps = jnp.finfo(dt).eps

    beta0 = jnp.linalg.norm(b)
    u0 = jnp.where(beta0 > 0, 1.0, 0.0) * b / jnp.maximum(beta0, eps)
    v_raw = rmatvec(u0)
    alpha0 = jnp.linalg.norm(v_raw)
    v0 = v_raw / jnp.maximum(alpha0, eps)

    state = dict(
        x=jnp.zeros(n, dtype=dt),
        u=u0, v=v0, w=v0,
        alpha=alpha0, beta=beta0,
        phibar=beta0, rhobar=alpha0,
        anorm=jnp.zeros((), dtype=dt),
        it=jnp.zeros((), dtype=jnp.int32),
        done=(beta0 == 0) | (alpha0 == 0),
    )

    def cond(s):
        return (~s["done"]) & (s["it"] < iter_lim)

    def body(s):
        # bidiagonalization step
        u = matvec(s["v"]) - s["alpha"] * s["u"]
        beta = jnp.linalg.norm(u)
        u = u / jnp.maximum(beta, eps)
        v = rmatvec(u) - beta * s["v"]
        alpha = jnp.linalg.norm(v)
        v = v / jnp.maximum(alpha, eps)

        # orthogonal transformation (plane rotation)
        rho = jnp.sqrt(s["rhobar"] ** 2 + beta**2)
        c = s["rhobar"] / rho
        sn = beta / rho
        theta = sn * alpha
        rhobar = -c * alpha
        phi = c * s["phibar"]
        phibar = sn * s["phibar"]

        x = s["x"] + (phi / rho) * s["w"]
        w = v - (theta / rho) * s["w"]

        anorm = jnp.sqrt(s["anorm"] ** 2 + s["alpha"] ** 2 + beta**2)
        # stopping: ||A' r|| <= atol * ||A|| * ||r||  or  ||r|| small
        arnorm = phibar * alpha * jnp.abs(c)
        done = (phibar <= btol * s["beta"] + atol * anorm
                * jnp.linalg.norm(x)) | (
                    arnorm <= atol * anorm * jnp.maximum(phibar, eps))
        return dict(x=x, u=u, v=v, w=w, alpha=alpha, beta=s["beta"],
                    phibar=phibar, rhobar=rhobar, anorm=anorm,
                    it=s["it"] + 1, done=done)

    out = jax.lax.while_loop(cond, body, state)
    return out["x"]
