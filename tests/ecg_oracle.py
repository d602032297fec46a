"""NumPy oracle of the reference ECG algorithm (float64, exact semantics).

A faithful re-statement — NOT a copy — of the reference's solver loop
(reference: src/solvers/ecg.c:289-527 _preAlps_ECGIterateOmin/Odir driven by
the RCI loop of examples/test_ecg_prealps_op.c:203-221), used as the parity
oracle for golden iteration counts: the JAX solver must land in the same
iteration-count band on the reference's deterministic configs (LFAT5 e=2,
elasticity3d e=4; reference: README.md:53-59).

Algorithm per reference iteration (no adaptive reduction):

  init:   normb = ||b||, R = split(b), P = M⁻¹R, AP = A·P
  rci 0:  C = (AP)ᵀP → U = chol(C) → P ← P U⁻¹, AP ← AP U⁻¹ (A-CholQR)
          alpha = PᵀR;  X += P·alpha;  R −= AP·alpha;  iter += 1
  check:  res = ||R||_F;  stop if res ≤ tol·normb or iter ≥ maxiter
  rci 1:  omin: Z = M⁻¹R;  beta = (AP)ᵀZ;  Z −= P·beta;        P ← Z
          odir: Z = M⁻¹AP; beta = ([AP AP_prev])ᵀZ; Z −= [P P_prev]·beta;
                P_prev ← P, AP_prev ← AP, P ← Z
  then AP = A·P and repeat.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def contiguous_split(b: np.ndarray, t: int) -> np.ndarray:
    """R0 with row i of b in column (i*t)//n — the same contiguous split the
    JAX solver uses (the reference splits by rank, ecg.c:201; with contiguous
    rank row-panels the two coincide up to panel rounding)."""
    n = b.shape[0]
    r = np.zeros((n, t))
    cols = (np.arange(n) * t) // n
    r[np.arange(n), cols] = b
    return r


def block_jacobi_oracle(a: sp.spmatrix, offsets: np.ndarray):
    """Exact dense-Cholesky block-Jacobi apply over contiguous row blocks
    (reference: src/preconditioners/block_jacobi.c — per-rank PARDISO
    Cholesky of the local diagonal block)."""
    import scipy.linalg

    a = sp.csr_matrix(a)
    factors = []
    for i in range(len(offsets) - 1):
        r0, r1 = int(offsets[i]), int(offsets[i + 1])
        factors.append(scipy.linalg.cho_factor(a[r0:r1, r0:r1].toarray()))

    def apply(v):
        out = np.empty_like(v)
        for i in range(len(offsets) - 1):
            r0, r1 = int(offsets[i]), int(offsets[i + 1])
            out[r0:r1] = scipy.linalg.cho_solve(factors[i], v[r0:r1])
        return out

    return apply


def ecg_oracle(
    a: sp.spmatrix,
    b: np.ndarray,
    t: int,
    tol: float = 1e-5,
    maxiter: int = 10000,
    variant: str = "odir",
    m_apply=None,
    split=None,
    adaptive: bool = False,
):
    """Run the reference ECG algorithm in float64 numpy.

    adaptive=True restates the reference's ADAPT_BS dynamic search-direction
    reduction for odir (-r 1; reference ecg.c:444-497): an SVD rank test on
    alpha against tol·‖b‖/√nrhs, then rotation of the direction block onto
    the significant left-singular directions and truncation t → t1 (the
    reference realises the rotation as geqrf/ormqr of the 'O'-overwritten U;
    the span — and therefore the iteration algebra — is identical).

    Returns dict(x, iters, res, normb, history, bs_history).
    """
    a = sp.csr_matrix(a).astype(np.float64)
    n = a.shape[0]
    if m_apply is None:
        m_apply = lambda v: v
    if adaptive and variant != "odir":
        raise ValueError("ADAPT_BS oracle covers the odir branch "
                         "(reference ecg.c:190 allows ORTHODIR/_FUSED only)")
    normb = float(np.linalg.norm(b))
    nrhs = t
    red_tol = tol * normb / np.sqrt(nrhs)

    r = contiguous_split(b, t) if split is None else split(b, t)
    p = m_apply(r)
    ap = a @ p
    x = np.zeros((n, t))
    p_prev = np.zeros((n, 0))
    ap_prev = np.zeros((n, 0))

    history = []
    bs_history = []
    it = 0
    while True:
        # --- rci 0: A-CholQR + alpha + X,R update (ecg.c:309-339/425-505) ---
        c = ap.T @ p
        try:
            u = np.linalg.cholesky(0.5 * (c + c.T)).T  # upper
        except np.linalg.LinAlgError:
            break  # "P^tAP is not spd!" — reference aborts (ecg.c:320)
        p = np.linalg.solve(u.T, p.T).T       # P U⁻¹ (right upper solve)
        ap = np.linalg.solve(u.T, ap.T).T
        alpha = p.T @ r
        if adaptive:
            # SVD rank test (ecg.c:445-466): keep the leading singular
            # directions with sigma > tol·normb/sqrt(nrhs)
            u_svd, sig, _ = np.linalg.svd(alpha)   # u_svd: (bs, bs)
            t1 = 0
            for sv in sig:
                if sv > red_tol:
                    t1 += 1
                else:
                    break
            bs = alpha.shape[0]
            if 0 < t1 < nrhs and t1 < bs:
                # rotate onto the leading directions and truncate
                # (ecg.c:468-497 geqrf/ormqr realisation of the same span)
                alpha = (u_svd.T @ alpha)[:t1]
                p = (p @ u_svd)[:, :t1]
                ap = (ap @ u_svd)[:, :t1]
        bs_history.append(p.shape[1])
        x = x + p @ alpha
        r = r - ap @ alpha
        it += 1
        # --- stopping criterion (ecg.c:223-261) ---
        res = float(np.sqrt(np.sum(r * r)))
        history.append(res)
        if res <= tol * normb or it >= maxiter:
            break
        # --- rci 1: new search directions ---
        if variant == "omin":
            z = m_apply(r)
            beta = ap.T @ z
            z = z - p @ beta
            p_new = z
        elif variant == "odir":
            z = m_apply(ap)
            beta1 = ap.T @ z
            beta2 = ap_prev.T @ z
            z = z - p @ beta1 - p_prev @ beta2
            p_prev, ap_prev = p, ap
            p_new = z
        else:
            raise ValueError(variant)
        p = p_new
        ap = a @ p

    return {
        "x": x.sum(axis=1),
        "iters": it,
        "res": res,
        "normb": normb,
        "history": np.asarray(history),
        "bs_history": np.asarray(bs_history),
    }
