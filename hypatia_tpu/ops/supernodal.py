"""Host-side symbolic supernodal Cholesky analysis.

The reference's supernodal sparse-PSD cone delegates symbolic analysis to
CHOLMOD (`src/Cones/possemideftrisparse/cholmodimpl.jl:49-184`): fill-reducing
ordering, elimination tree, supernode partition, per-supernode row structures
and relative indices into the parent's frontal matrix.  On TPU there is no
CHOLMOD; this module performs the same analysis in pure numpy at model-build
time.  Everything here is *static* problem structure: the resulting index
arrays are closed over as constants in the jitted oracles, so the numeric
recursions unroll into static-shape dense block operations (gathers +
small MXU matmuls) — the TPU-idiomatic equivalent of CHOLMOD's supernodal
frontal kernels.

Conventions: 0-based indices; lower-triangular pattern (row >= col) with all
diagonal entries present.
"""

import numpy as np


def _column_structures(side, adj_below):
    """Elimination tree + filled column structures.

    ``adj_below[j]`` is the set of pattern rows strictly below the diagonal
    in column j (after permutation, symmetrized).  Returns ``parent`` (etree,
    -1 at roots) and ``struct`` (sorted below-diagonal row structure of each
    column of the Cholesky factor, i.e. with fill).
    """
    struct = [None] * side
    parent = np.full(side, -1, dtype=int)
    children = [[] for _ in range(side)]
    for j in range(side):
        s = set(adj_below[j])
        for c in children[j]:
            s.update(r for r in struct[c] if r > j)
        struct[j] = np.array(sorted(s), dtype=int)
        if struct[j].size:
            parent[j] = struct[j][0]
            children[parent[j]].append(j)
    return parent, struct


def _postorder(side, parent):
    """Postorder permutation of the elimination forest (children before
    parents, children visited in ascending order).  Returns ``order`` with
    ``order[new] = old``."""
    children = [[] for _ in range(side)]
    roots = []
    for j in range(side):
        if parent[j] < 0:
            roots.append(j)
        else:
            children[parent[j]].append(j)
    order = []
    for root in roots:
        stack = [(root, iter(children[root]))]
        while stack:
            node, it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                order.append(node)
                stack.pop()
            else:
                stack.append((nxt, iter(children[nxt])))
    return np.array(order, dtype=int)


class SupernodalStructure:
    """Static supernodal elimination structure of a sparse SPD pattern.

    Attributes (all numpy, fixed at construction):
      - ``perm``/``iperm``: fill-reducing + postorder column permutation
        (``perm[new] = old``).
      - ``num_super``, ``supers`` (num_super+1 start columns), ``super_map``.
      - per supernode k: ``num_cols[k]`` (nn), ``num_rows[k]`` (nj, >= nn),
        ``J_rows[k]`` (global permuted row indices: the supernode's columns
        followed by the sorted below-diagonal structure),
        ``parent[k]``/``children[k]`` (supernode tree),
        ``rel_idx[k]`` (positions of the below rows inside the parent's
        ``J_rows`` — the extend-add scatter map).
      - pattern-entry map ``ent_super/ent_row/ent_col/ent_offdiag/
        ent_swapped``: for each lower-triangle pattern entry, its frontal
        block coordinates (row index within ``J_rows``, column within the
        supernode) and whether the permutation transposed it (needed for the
        complex case).
    """

    def __init__(self, side, row_idxs, col_idxs, perm=None,
                 relax=(16, 0.3)):
        row_idxs = np.asarray(row_idxs, dtype=int)
        col_idxs = np.asarray(col_idxs, dtype=int)
        assert np.all(row_idxs >= col_idxs)
        self.side = int(side)
        nent = len(row_idxs)

        # -- ordering: reverse Cuthill-McKee (scipy) unless given ----------
        if perm is None:
            try:
                import scipy.sparse as sp
                from scipy.sparse.csgraph import reverse_cuthill_mckee
                ones = np.ones(nent)
                A = sp.coo_matrix((ones, (row_idxs, col_idxs)),
                                  shape=(side, side)).tocsr()
                A = A + A.T
                perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                                  dtype=int)
            except Exception:  # pragma: no cover - scipy always present
                perm = np.arange(side)
        else:
            perm = np.asarray(perm, dtype=int)
            assert perm.shape == (side,)

        def analyze(perm):
            iperm = np.empty(side, dtype=int)
            iperm[perm] = np.arange(side)
            adj_below = [set() for _ in range(side)]
            for r, c in zip(row_idxs, col_idxs):
                pr, pc = iperm[r], iperm[c]
                if pr == pc:
                    continue
                lo, hi = (pr, pc) if pr < pc else (pc, pr)
                adj_below[lo].add(hi)
            parent, struct = _column_structures(side, adj_below)
            return iperm, parent, struct

        iperm, parent, struct = analyze(perm)
        # compose with the etree postorder so supernode columns are
        # contiguous and ascending order is a valid postorder, then redo
        # the (isomorphic) symbolic analysis in the final ordering
        post = _postorder(side, parent)
        perm = perm[post]
        iperm, parent, struct = analyze(perm)
        self.perm, self.iperm = perm, iperm

        # -- supernode partition (maximal: merge j into j-1's supernode
        #    when parent(j-1) == j and struct(j-1) == {j} ∪ struct(j)) ------
        starts = [0]
        for j in range(1, side):
            if not (parent[j - 1] == j
                    and len(struct[j - 1]) == len(struct[j]) + 1):
                starts.append(j)
        starts.append(side)

        # -- relaxed amalgamation (CHOLMOD-style): merge a supernode into
        #    the immediately-following one when that supernode is its
        #    elimination-tree parent and the explicit zeros introduced stay
        #    bounded. Fewer, denser frontal blocks: ~linearly fewer
        #    trace-time units (compile cost) and MXU-friendlier matmuls;
        #    the oracles stay exact (the recursions are exact on any
        #    structure containing the Cholesky fill).
        relax_min = int(relax[0]) if relax else 16
        relax_frac = float(relax[1]) if relax else 0.3

        def below_union(j0, j1):
            s = set()
            for j in range(j0, j1):
                s.update(r for r in struct[j] if r >= j1)
            return sorted(s)

        def block_waste(j0, j1):
            nn = j1 - j0
            nj = nn + len(below_union(j0, j1))
            block = nj * nn - nn * (nn - 1) // 2
            actual = sum(1 + len(struct[j]) for j in range(j0, j1))
            return (block - actual) / max(block, 1), nn

        changed = True
        while changed:
            changed = False
            i = 0
            while i + 2 < len(starts):
                j0, j1, j2 = starts[i], starts[i + 1], starts[i + 2]
                # next segment must be this one's etree parent
                bel = below_union(j0, j1)
                if bel and j1 <= bel[0] < j2:
                    waste, nn = block_waste(j0, j2)
                    if nn <= relax_min or waste <= relax_frac:
                        del starts[i + 1]
                        changed = True
                        continue
                i += 1

        self.supers = np.array(starts, dtype=int)
        self.num_super = len(starts) - 1
        super_map = np.empty(side, dtype=int)
        for k in range(self.num_super):
            super_map[starts[k]:starts[k + 1]] = k
        self.super_map = super_map

        self.num_cols = np.diff(self.supers)
        self.J_rows = []
        self.parent = np.full(self.num_super, -1, dtype=int)
        for k in range(self.num_super):
            j0, j1 = starts[k], starts[k + 1]
            below = np.array(below_union(j0, j1), dtype=int)
            J = np.concatenate([np.arange(j0, j1), below])
            self.J_rows.append(J)
            if below.size:
                self.parent[k] = super_map[below[0]]
        self.num_rows = np.array([len(J) for J in self.J_rows], dtype=int)

        self.children = [[] for _ in range(self.num_super)]
        for k in range(self.num_super):
            if self.parent[k] >= 0:
                assert self.parent[k] > k
                self.children[self.parent[k]].append(k)

        # positions of each supernode's below rows in the parent's J_rows
        self.rel_idx = []
        for k in range(self.num_super):
            nn = self.num_cols[k]
            below = self.J_rows[k][nn:]
            if below.size == 0:
                self.rel_idx.append(np.zeros(0, dtype=int))
                continue
            par = self.parent[k]
            pos = {r: i for i, r in enumerate(self.J_rows[par])}
            rel = np.array([pos[r] for r in below], dtype=int)
            self.rel_idx.append(rel)

        # -- pattern-entry -> frontal block coordinates ---------------------
        row_pos = [{r: i for i, r in enumerate(J)} for J in self.J_rows]
        ent_super = np.empty(nent, dtype=int)
        ent_row = np.empty(nent, dtype=int)
        ent_col = np.empty(nent, dtype=int)
        ent_offdiag = np.empty(nent, dtype=bool)
        ent_swapped = np.empty(nent, dtype=bool)
        for i, (r, c) in enumerate(zip(row_idxs, col_idxs)):
            pr, pc = iperm[r], iperm[c]
            swapped = pr < pc
            if swapped:
                pr, pc = pc, pr
            k = super_map[pc]
            ent_super[i] = k
            ent_row[i] = row_pos[k][pr]
            ent_col[i] = pc - starts[k]
            ent_offdiag[i] = r != c
            ent_swapped[i] = swapped
        self.ent_super = ent_super
        self.ent_row = ent_row
        self.ent_col = ent_col
        self.ent_offdiag = ent_offdiag
        self.ent_swapped = ent_swapped

    def fill_nnz(self):
        """Below-diagonal nonzeros of the factor (a cost diagnostic)."""
        return int(sum(nj * nn - nn * (nn + 1) // 2
                       for nj, nn in zip(self.num_rows, self.num_cols)))


class LevelSchedule:
    """Level-bucketed execution schedule over a SupernodalStructure.

    The per-supernode numeric recursions unroll at trace time, so program
    size (and remote-compile cost) scales with the supernode count.  This
    schedule groups supernodes by elimination-tree LEVEL (all supernodes in
    a level are mutually independent: children complete at strictly lower
    levels) and, within a level, by identical frontal shape (nj, nn) — each
    (level, shape) group executes as ONE vmapped kernel, so program size
    scales with the number of distinct (level, shape) groups instead.

    Precomputed index arrays (all numpy, trace-time constants):
      - groups: list of (level, nj, nn, member_ids) in execution order
        (ascending level; reverse order is valid for backward passes)
      - group_of / slot_of: supernode -> (group index, position in stack)
      - per group: padded pattern-entry scatter maps (ent_slot/row/col/mask)
      - edges: per (child group, parent group) pair, stacked
        (child_slot, parent_slot, rel_idx rows) for the extend-add
    """

    def __init__(self, S: "SupernodalStructure", sup_entries):
        self.S = S
        K = S.num_super
        level = np.zeros(K, dtype=int)
        for k in range(K):  # postorder: children first
            for c in S.children[k]:
                level[k] = max(level[k], level[c] + 1)
        self.level = level

        buckets = {}
        for k in range(K):
            key = (int(level[k]), int(S.num_rows[k]), int(S.num_cols[k]))
            buckets.setdefault(key, []).append(k)
        self.groups = [(lv, nj, nn, np.array(members, dtype=int))
                       for (lv, nj, nn), members in
                       sorted(buckets.items())]
        self.group_of = np.empty(K, dtype=int)
        self.slot_of = np.empty(K, dtype=int)
        for gi, (_, _, _, members) in enumerate(self.groups):
            for slot, k in enumerate(members):
                self.group_of[k] = gi
                self.slot_of[k] = slot

        # padded pattern-entry maps per group (entry counts vary per
        # member; pad with masked writes to position (0, 0))
        self.entry_maps = []
        for _, nj, nn, members in self.groups:
            emax = max((len(sup_entries[k]) for k in members), default=0)
            g = len(members)
            eslot = np.zeros((g, emax), dtype=int)
            erow = np.zeros((g, emax), dtype=int)
            ecol = np.zeros((g, emax), dtype=int)
            eoffd = np.zeros((g, emax), dtype=bool)
            eswap = np.zeros((g, emax), dtype=bool)
            emask = np.zeros((g, emax), dtype=bool)
            eidx = np.zeros((g, emax), dtype=int)  # global entry index
            for i, k in enumerate(members):
                ent = sup_entries[k]
                m = len(ent)
                eidx[i, :m] = ent
                erow[i, :m] = S.ent_row[ent]
                ecol[i, :m] = S.ent_col[ent]
                emask[i, :m] = True
            self.entry_maps.append(dict(idx=eidx, row=erow, col=ecol,
                                        mask=emask))

        # extend-add edges: (child group, parent group) -> stacked indices
        edges = {}
        for k in range(K):
            p = S.parent[k]
            if p < 0:
                continue
            key = (int(self.group_of[k]), int(self.group_of[p]))
            edges.setdefault(key, []).append(k)
        self.edges = []
        for (gc, gp), childs in sorted(edges.items()):
            rel = np.stack([S.rel_idx[k] for k in childs])  # (e, na_c)
            self.edges.append(dict(
                child_group=gc, parent_group=gp,
                child_slots=np.array([self.slot_of[k] for k in childs]),
                parent_slots=np.array([self.slot_of[S.parent[k]]
                                       for k in childs]),
                rel=rel,
            ))
        # edges grouped by parent group (forward) and by child group
        # (backward)
        self.edges_into = {}
        self.edges_from = {}
        for e in self.edges:
            self.edges_into.setdefault(e["parent_group"], []).append(e)
            self.edges_from.setdefault(e["child_group"], []).append(e)

    def num_groups(self):
        return len(self.groups)
