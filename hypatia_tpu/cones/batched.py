"""BatchedCone: vmap a run of structurally-identical cones as one cone.

SURVEY.md §7 design stance: "group the k cones by (type, dim) ... replaces
Julia's per-cone dynamic dispatch and the cone_idxs ragged layout". Models
with many identical small cones (CBLIB exponential-cone instances have
hundreds of HypoPerLog(3) blocks) would otherwise trace every oracle once
per cone — program size and sequential device work scale with the cone
count. A BatchedCone presents `count` adjacent same-structure cones as a
single cone of dim `count*d` whose oracles are `jax.vmap` over the
sub-cone axis; the per-primitive-cone line-search semantics (sz windows,
dder3 identity gates, proximity aggregation) are preserved via
`sz_parts`/`nu_parts`/`adj_gated_val`/`get_proxsqr` overrides.

Grouping happens at StepContext construction (`Solver.load`), never in the
Model itself, so preprocessing/rescaling granularity is unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hypatia_tpu.cones.base import Cone


def _vm(fn, *args):
    return jax.vmap(fn)(*args)


class BatchedCone(Cone):
    """`count` copies of `base` over contiguous svec slices."""

    def __init__(self, base: Cone, count: int):
        assert count >= 1
        super().__init__(base.dim * count, base.use_dual)
        self.base = base
        self.count = int(count)
        self.has_dder3 = base.has_dder3
        self.has_sqrt_oracles = base.has_sqrt_oracles

    def params_key(self):
        return ("batched", self.count, self.base.struct_key())

    def __repr__(self):
        return f"BatchedCone({self.base!r} x {self.count})"

    # -- shape helpers ------------------------------------------------------

    def _split(self, v):
        return v.reshape(self.count, self.base.dim)

    def _split2(self, arr):
        # (count*d, k) -> (count, d, k)
        return arr.reshape(self.count, self.base.dim, arr.shape[-1])

    def _flat(self, v2):
        return v2.reshape(self.dim)

    # -- static structure ---------------------------------------------------

    @property
    def nu(self):
        return self.base.nu * self.count

    def nu_parts(self):
        return np.tile(self.base.nu_parts(), self.count)

    def init_point(self):
        return np.tile(np.asarray(self.base.init_point()), self.count)

    # -- oracles (vmapped) ---------------------------------------------------

    def barrier(self, s):
        return jnp.sum(_vm(self.base.barrier, self._split(s)))

    def feas(self, s):
        return jnp.all(_vm(self.base.feas, self._split(s)))

    def dual_feas(self, z):
        return jnp.all(_vm(self.base.dual_feas, self._split(z)))

    def point_aux(self, s):
        return _vm(self.base.point_aux, self._split(s))

    def point_aux_light(self, s):
        # base.point_aux_light already scopes chol_tries(1) at trace time
        return jax.vmap(self.base.point_aux_light)(self._split(s))

    def _get_aux(self, s, aux):
        return self.point_aux(s) if aux is None else aux

    def grad(self, s, aux=None):
        aux = self._get_aux(s, aux)
        return self._flat(
            jax.vmap(lambda sk, ak: self.base.grad(sk, ak))(
                self._split(s), aux))

    def _prod(self, name, s, arr, aux):
        aux = self._get_aux(s, aux)
        fn = getattr(self.base, name)
        one_d = arr.ndim == 1
        a = arr[:, None] if one_d else arr
        out = jax.vmap(lambda sk, ak, vk: fn(sk, vk, ak))(
            self._split(s), aux, self._split2(a))
        out = out.reshape(self.dim, a.shape[-1])
        return out[:, 0] if one_d else out

    def hess_prod(self, s, arr, aux=None):
        return self._prod("hess_prod", s, arr, aux)

    def inv_hess_prod(self, s, arr, aux=None):
        return self._prod("inv_hess_prod", s, arr, aux)

    def sqrt_hess_prod(self, s, arr, aux=None):
        return self._prod("sqrt_hess_prod", s, arr, aux)

    def inv_sqrt_hess_prod(self, s, arr, aux=None):
        return self._prod("inv_sqrt_hess_prod", s, arr, aux)

    def _block_diag(self, blocks):
        out = jnp.zeros((self.dim, self.dim), dtype=blocks.dtype)
        d = self.base.dim
        for i in range(self.count):
            out = out.at[i * d:(i + 1) * d, i * d:(i + 1) * d].set(blocks[i])
        return out

    def hess(self, s, aux=None):
        aux = self._get_aux(s, aux)
        blocks = jax.vmap(lambda sk, ak: self.base.hess(sk, ak))(
            self._split(s), aux)
        return self._block_diag(blocks)

    def inv_hess(self, s, aux=None):
        aux = self._get_aux(s, aux)
        blocks = jax.vmap(lambda sk, ak: self.base.inv_hess(sk, ak))(
            self._split(s), aux)
        return self._block_diag(blocks)

    def dder3(self, s, d, aux=None):
        aux = self._get_aux(s, aux)
        return self._flat(
            jax.vmap(lambda sk, dk, ak: self.base.dder3(sk, dk, ak))(
                self._split(s), self._split(d), aux))

    # -- line-search / stepper semantics (per-sub-cone granularity) ---------

    def sz_parts(self, primal, dual):
        return jnp.sum(self._split(primal) * self._split(dual), axis=1)

    def get_proxsqr(self, s, z, irtmu, aux=None, use_max_prox=True):
        aux = self._get_aux(s, aux)
        proxs = jax.vmap(
            lambda sk, zk, ak: self.base.get_proxsqr(
                sk, zk, irtmu, ak, use_max_prox))(
            self._split(s), self._split(z), aux)
        return jnp.max(proxs) if use_max_prox else jnp.sum(proxs)

    def check_numerics(self, s, z, aux=None):
        aux = self._get_aux(s, aux)
        oks = jax.vmap(lambda sk, zk, ak: self.base.check_numerics(
            sk, zk, ak))(self._split(s), self._split(z), aux)
        return jnp.all(oks)

    def adj_gated_val(self, s_scal, prim_dir, irtrtmu, centering, aux=None):
        aux = self._get_aux(s_scal, aux)
        vals = jax.vmap(
            lambda sk, dk, ak: self.base.adj_gated_val(
                sk, dk, irtrtmu, centering, ak))(
            self._split(s_scal), self._split(prim_dir), aux)
        return self._flat(vals)


def sort_perm_for_grouping(cones, cone_idxs):
    """Permutation layer for NON-adjacent identical cones: a stable sort of
    the cone list by first appearance of each structure key, so that
    interleaved same-structure cones (common in CBLIB-style models:
    exp, lin, exp, lin, ...) become adjacent and groupable.

    Returns ``(order, perm_q)`` — the cone reordering and the induced
    permutation of the q conic rows — or ``None`` when sorting would not
    reduce the grouped cone count (already adjacent, or all distinct).
    The solver applies ``perm_q`` to G/h (an equivalent model) and its
    inverse to the z/s results; the line-search and proximity semantics
    are order-invariant (conjunctions and max/sum reductions).
    """
    n = len(cones)
    keys = [c.struct_key() for c in cones]
    first = {}
    keyed = []
    for i, k in enumerate(keys):
        if k not in first:
            first[k] = len(first)
        keyed.append((first[k], i))
    order = [i for _, i in sorted(keyed)]
    if order == list(range(n)):
        return None

    def n_groups(seq):
        g, prev = 0, None
        for i in seq:
            if keys[i] != prev:
                g += 1
                prev = keys[i]
        return g

    if n_groups(order) >= n_groups(range(n)):
        return None
    perm_q = np.concatenate([
        np.arange(cone_idxs[i][0], cone_idxs[i][0] + cones[i].dim)
        for i in order])
    return order, perm_q


def group_cones(cones, cone_idxs, min_group=2):
    """Merge adjacent runs of structurally-identical cones into
    BatchedCones. Returns (new_cones, new_cone_idxs). Only runs of length
    >= min_group are merged; everything else passes through unchanged."""
    new_cones, new_idxs = [], []
    i = 0
    n = len(cones)
    while i < n:
        j = i + 1
        key = cones[i].struct_key()
        while j < n and cones[j].struct_key() == key:
            j += 1
        run = j - i
        start = cone_idxs[i][0]
        if run >= min_group:
            new_cones.append(BatchedCone(cones[i], run))
            new_idxs.append((start, cones[i].dim * run))
        else:
            for k in range(i, j):
                new_cones.append(cones[k])
                new_idxs.append(cone_idxs[k])
        i = j
    return tuple(new_cones), tuple(new_idxs)
