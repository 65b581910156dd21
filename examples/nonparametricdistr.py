"""Nonparametric distribution estimation with spectral objectives.

min f(p)  s.t.  sum p = d,  A p = b (prior equalities),
optional g(D p) <= k spectral constraints; f, g separable spectral
functions (negative entropy / log / inverse). Boyd & Vandenberghe §7.2.
Parity: `examples/nonparametricdistr/JuMP.jl` (native re-formulation; the
"homog spectral" epigraph (epi, 1, p) uses the perspective cone with v=1).
"""

import numpy as np

from hypatia_tpu import Model, cones


_SSF = {
    "entropy": cones.NegEntropySSF,
    "neglog": cones.NegLogSSF,
    "inv": cones.InvSSF,
}


def build(d: int = 6, obj: str = "entropy", con: str = None, seed: int = 1):
    assert d >= 2
    rng = np.random.default_rng(seed)
    p0 = rng.random(d)
    p0 *= d / p0.sum()

    # vars (epi, p)
    n = 1 + d
    c = np.concatenate([[1.0], np.zeros(d)])
    Arows = [np.concatenate([[0.0], np.ones(d)])[None, :]]
    brows = [np.array([float(d)])]
    Ap = rng.standard_normal((max(1, d // 3), d))
    Arows.append(np.hstack([np.zeros((Ap.shape[0], 1)), Ap]))
    brows.append(Ap @ p0)
    A = np.vstack(Arows)
    b = np.concatenate(brows)

    G_rows, h_rows, cone_list = [], [], []
    # objective epigraph: (epi, 1, p) in vector sep-spectral cone
    G1 = np.zeros((2 + d, n))
    G1[0, 0] = -1.0
    G1[2:, 1:] = -np.eye(d)
    h1 = np.concatenate([[0.0, 1.0], np.zeros(d)])
    G_rows.append(G1)
    h_rows.append(h1)
    cone_list.append(
        cones.EpiPerSepSpectralVector(_SSF[obj](), d))

    if con:
        import jax.numpy as jnp  # noqa: F401

        D = rng.random((d, d))
        h_fn = _SSF[con]()
        val_p0 = float(np.asarray(h_fn.h_val(jnp.asarray(D @ p0))))
        G2 = np.zeros((2 + d, n))
        G2[2:, 1:] = -D
        h2 = np.concatenate([[val_p0, 1.0], np.zeros(d)])
        G_rows.append(G2)
        h_rows.append(h2)
        cone_list.append(cones.EpiPerSepSpectralVector(h_fn, d))

    G = np.vstack(G_rows)
    h = np.concatenate(h_rows)
    return Model(c, A, b, G, h, cone_list)


MINIMAL = [dict(d=4), dict(d=4, obj="neglog", con="entropy")]
FAST = [dict(d=15, obj="inv"), dict(d=15, obj="entropy", con="neglog")]
BENCH = [dict(d=300)]
