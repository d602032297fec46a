"""PRESC: Schur-complement preconditioner with *local* Schur deflation.

(reference: src/preconditioners/presc.c + presc_eigsolve.c — the experimental
sibling of LORASC.) The apply is the same forward/backward block sweep with a
low-rank separator correction as LORASC (reference: presc.c:441-585 is
structurally identical to lorasc.c:368-618); what differs is the deflation
eigenproblem (reference: presc.h:18-21):

* SSLOC:  S u = λ Sloc u, Sloc = blockdiag of EXACT local Schur complements
          Sloc_p = Agg_pp − Agi_p Aii_p⁻¹ Aig_p — the reference computes
          these with the direct solver's partial-factorisation Schur feature
          (reference: mkl_pardiso_solver.c:131-141 iparm[35]=2); here they
          are assembled by batched solves (direct/schur.py role, host-side).
* SALOC:  S u = λ Aloc u, Aloc = blockdiag(Agg_pp).

Note: the reference allocates but never assigns PRESC's sigma weights (the
code is experimental); this implementation adopts LORASC's correction
σᵢ = (tol − λᵢ)/λᵢ so the preconditioner is well defined.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from prealps_tpu.core.partition import BlockArrowStruct, block_arrow_structure, permute
from prealps_tpu.direct.subdomain import DenseCholesky, build_block_solver
from prealps_tpu.ops.formats import csr_to_ell
from prealps_tpu.precond.lorasc import Lorasc, schur_complement_dense

import jax.numpy as jnp


def separator_owners(ap: sp.csr_matrix, arrow: BlockArrowStruct) -> np.ndarray:
    """Assign each separator row to the part it is most strongly coupled to
    (deterministic; ties broken toward the lower part id).

    (reference: the ODB structure keeps each rank's separator rows local —
    preAlps_utils.c:521 blockDiagODBStructCreate; here ownership is recovered
    from the coupling pattern.)
    """
    ni, n = arrow.sep_start, arrow.n
    k = arrow.nparts
    off = arrow.interior_offsets
    owners = np.zeros(n - ni, dtype=np.int64)
    agi = ap[ni:, :ni].tocsr()
    for i in range(n - ni):
        cols = agi.indices[agi.indptr[i]: agi.indptr[i + 1]]
        if cols.size == 0:
            owners[i] = 0
            continue
        parts = np.searchsorted(off, cols, side="right") - 1
        counts = np.bincount(parts, minlength=k)
        owners[i] = int(np.argmax(counts))
    return owners


def local_schur_complements(ap: sp.csr_matrix, arrow: BlockArrowStruct, sep_owner):
    """Exact local Schur complements Sloc_p (dense), separator grouped by
    owner. Returns (blocks list, sep_offsets)."""
    ni = arrow.sep_start
    off = arrow.interior_offsets
    k = arrow.nparts
    blocks = []
    sep_counts = np.bincount(sep_owner, minlength=k)
    sep_off = np.concatenate([[0], np.cumsum(sep_counts)])
    for p in range(k):
        rows = np.flatnonzero(sep_owner == p) + ni
        i0, i1 = int(off[p]), int(off[p + 1])
        agg_pp = ap[rows][:, rows].toarray()
        if rows.size == 0:
            blocks.append(np.zeros((0, 0)))
            continue
        aig_p = ap[i0:i1, rows]
        agi_p = ap[rows, i0:i1]
        aii_p = ap[i0:i1, i0:i1].tocsc()
        if i1 > i0 and aig_p.nnz:
            w = spla.spsolve(aii_p, aig_p.tocsc())
            if sp.issparse(w):
                w = w.toarray()
            w = np.atleast_2d(np.asarray(w))
            if w.shape[0] != i1 - i0:
                w = w.T
            s = agg_pp - agi_p @ w
        else:
            s = agg_pp
        blocks.append(0.5 * (s + s.T))
    return blocks, sep_off


def local_schur_complements_banded(
    ap: sp.csr_matrix, arrow: BlockArrowStruct, sep_owner, dtype=np.float64
):
    """Exact local Schur complements via the batched block-banded PARTIAL
    factorization on device (direct/banded.py::block_banded_schur — the
    at-scale analog of MKL-PARDISO iparm[35]=2 / MUMPS listvar_schur,
    reference: mkl_pardiso_solver.c:131-141, presc.c:239-241).

    Per part: rows laid out [interior (RCM), pad, separator, pad], the
    leading blocks eliminated by the banded recursion, one dense Schur on
    the trailing block. Identity padding rows decouple, so the extracted
    sep×sep window is exactly S_loc. Same return contract as
    local_schur_complements.
    """
    import jax.numpy as jnp

    from prealps_tpu.core.partition import rcm_order
    from prealps_tpu.direct.banded import block_banded_schur

    ni_all = arrow.sep_start
    off = arrow.interior_offsets
    k = arrow.nparts
    sep_counts = np.bincount(sep_owner, minlength=k)
    sep_off = np.concatenate([[0], np.cumsum(sep_counts)])

    # per-part rows + pinned ordering [interior-RCM ∥ separator]
    part_rows, perms, ni_p, ns_p = [], [], [], []
    for p in range(k):
        srows = np.flatnonzero(sep_owner == p) + ni_all
        i0, i1 = int(off[p]), int(off[p + 1])
        irows = np.arange(i0, i1)
        sub_i = ap[irows][:, irows]
        pi = rcm_order(sub_i) if irows.size > 2 else np.arange(irows.size)
        part_rows.append(np.concatenate([irows[pi], srows]))
        ni_p.append(irows.size)
        ns_p.append(srows.size)
    ni_max, ns_max = max(ni_p), max(max(ns_p), 1)

    # uniform positions: interior i -> i, separator j -> ni_max + j; measure
    # the bandwidth on these (the pad gap counts toward the band)
    bw = 1
    for p in range(k):
        rows = part_rows[p]
        pos = np.concatenate([
            np.arange(ni_p[p]), ni_max + np.arange(ns_p[p])
        ])
        sub = ap[rows][:, rows].tocoo()
        if sub.nnz:
            bw = max(bw, int(np.abs(pos[sub.row] - pos[sub.col]).max()))

    # choose bs with the Schur window inside the trailing block:
    # n_schur = nblk*bs − ni_max must satisfy ns_max ≤ n_schur ≤ bs
    bs = -(-max(bw, ns_max) // 8) * 8
    while True:
        nblk = ni_max // bs + 1
        n_schur = nblk * bs - ni_max
        if n_schur >= ns_max and n_schur <= bs and bs >= bw:
            break
        bs += 8
    rows_padded = nblk * bs

    d = np.zeros((k, nblk, bs, bs), dtype=dtype)
    e = np.zeros((k, nblk, bs, bs), dtype=dtype)
    for p in range(k):
        rows = part_rows[p]
        pos = np.concatenate([
            np.arange(ni_p[p]), ni_max + np.arange(ns_p[p])
        ])
        sub = ap[rows][:, rows].tocoo()
        r, c = pos[sub.row], pos[sub.col]
        rb, cb = r // bs, c // bs
        same = rb == cb
        np.add.at(d[p], (rb[same], r[same] % bs, c[same] % bs),
                  sub.data[same])
        # only the lower couplings: A is symmetric, so each upper entry's
        # partner appears separately in the COO (double-adding would split
        # the coupling across E and Eᵀ twice)
        low = rb == cb + 1
        np.add.at(e[p], (rb[low], r[low] % bs, c[low] % bs), sub.data[low])
        filled = np.concatenate([
            np.arange(ni_p[p]), ni_max + np.arange(ns_p[p])
        ])
        padr = np.setdiff1d(np.arange(rows_padded), filled)
        d[p, padr // bs, padr % bs, padr % bs] = 1.0

    schur, bad = block_banded_schur(jnp.asarray(d), jnp.asarray(e), n_schur)
    if bool(bad):
        raise RuntimeError("banded partial factorization failed (not SPD?)")
    schur = np.asarray(schur, dtype=np.float64)
    # extract each part's sep×sep window: sep rows sit at window positions
    # [ni_max + j] − (rows_padded − n_schur)
    base = ni_max - (rows_padded - n_schur)
    blocks = []
    for p in range(k):
        s = schur[p, base: base + ns_p[p], base: base + ns_p[p]]
        blocks.append(0.5 * (s + s.T))
    return blocks, sep_off


def build_presc(
    a: sp.spmatrix,
    nparts: int = 8,
    deflation_tol: float = 1e-2,
    max_deflation: int = 64,
    eigs_kind: str = "ssloc",        # ssloc | saloc
    eig_method: str = "direct",      # direct | lanczos
    schur_method: str = "dense",     # dense (host spsolve) | banded (device
                                     # partial factorization, the at-scale path)
    lanczos_ncv: int | None = None,
    arrow: BlockArrowStruct | None = None,
    dtype=None,
):
    """Build PRESC for A (original ordering). Returns (precond, arrow’) where
    arrow’ carries the final permutation (separator regrouped by owner)."""
    a = sp.csr_matrix(a)
    dtype = np.dtype(dtype) if dtype is not None else a.dtype
    if arrow is None:
        arrow = block_arrow_structure(a, nparts)
    ap = permute(a, arrow.perm)
    ni, n = arrow.sep_start, arrow.n

    # regroup separator rows by owning part (ODB-style locality)
    owner = separator_owners(ap, arrow)
    sep_order = np.argsort(owner, kind="stable")
    perm2 = np.concatenate([np.arange(ni), ni + sep_order])
    ap = permute(ap, perm2)
    arrow = BlockArrowStruct(
        perm=arrow.perm[perm2],
        interior_offsets=arrow.interior_offsets,
        sep_start=ni,
        n=n,
        part=arrow.part,
    )
    owner = owner[sep_order]

    aii = ap[:ni, :ni].tocsr()
    aig = ap[:ni, ni:].tocsr()
    agi = ap[ni:, :ni].tocsr()
    agg = ap[ni:, ni:].tocsr()

    aii_solver = build_block_solver(aii, arrow.interior_offsets, dtype=dtype)
    agg_solver = DenseCholesky.build(agg, dtype=dtype)

    s_dense = schur_complement_dense(aii, aig, agi, agg)
    if eigs_kind == "ssloc":
        if schur_method == "banded":
            blocks, sep_off = local_schur_complements_banded(
                ap, arrow, owner, dtype=np.float64)
        else:
            blocks, sep_off = local_schur_complements(ap, arrow, owner)
        b_dense = scipy.linalg.block_diag(*[b for b in blocks if b.size])
    elif eigs_kind == "saloc":
        sep_counts = np.bincount(owner, minlength=arrow.nparts)
        sep_off = np.concatenate([[0], np.cumsum(sep_counts)])
        b_blocks = [
            agg[sep_off[p]: sep_off[p + 1], sep_off[p]: sep_off[p + 1]].toarray()
            for p in range(arrow.nparts)
        ]
        b_dense = scipy.linalg.block_diag(*[b for b in b_blocks if b.size])
    else:
        raise ValueError(f"unknown eigs_kind {eigs_kind!r}")

    # B must be SPD; guard small indefiniteness from disconnected parts
    b_dense = b_dense + 1e-12 * np.eye(b_dense.shape[0]) * max(b_dense.diagonal().max(), 1)
    if eig_method == "direct":
        lam, vecs = scipy.linalg.eigh(s_dense, b_dense)
    elif eig_method == "lanczos":
        # matrix-free generalized Lanczos on OP = B⁻¹S in the B-inner product
        # (the PARPACK mode-2 role, reference: presc_eigsolve.c pdsaupd loop)
        import jax

        from prealps_tpu.ops.lanczos import lanczos_gen

        ng = s_dense.shape[0]
        b_j = jnp.asarray(b_dense)
        b_chol = np.linalg.cholesky(b_dense)
        binv_s = jnp.asarray(
            np.linalg.solve(b_chol.T, np.linalg.solve(b_chol, s_dense))
        )
        ncv = lanczos_ncv or min(ng, 2 * max_deflation + 1)
        res_l = jax.jit(
            lambda: lanczos_gen(
                lambda v: binv_s @ v, lambda v: b_j @ v, ng, ncv,
                dtype=jnp.float64,
            )
        )()
        lam, vecs = np.asarray(res_l.eigvalues), np.asarray(res_l.eigvectors)
    else:
        raise ValueError(f"unknown eig_method {eig_method!r}")

    sel = np.flatnonzero(lam <= deflation_tol)[:max_deflation]
    if sel.size == 0:
        e_mat = np.zeros((n - ni, 1))
        sigma = np.zeros((1,))
    else:
        e_mat = vecs[:, sel]
        lam_sel = lam[sel]
        sigma = (deflation_tol - lam_sel) / lam_sel

    precond = Lorasc(
        aii_solver=aii_solver,
        agg_solver=agg_solver,
        aig=csr_to_ell(aig, dtype=dtype),
        agi=csr_to_ell(agi, dtype=dtype),
        e_mat=jnp.asarray(e_mat, dtype=dtype),
        sigma=jnp.asarray(sigma, dtype=dtype),
        ni=ni,
        ng=n - ni,
    )
    return precond, arrow
