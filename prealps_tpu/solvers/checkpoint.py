"""Solver-state checkpoint / resume.

The reference has NO checkpointing (SURVEY.md §5: fail-fast only); this is a
deliberate addition the functional design makes trivial: the ECG state is one
pytree {X, R, V, AV, Z, mask, it, res, …}, snapshotted every k iterations to
a .npz and restorable into a fresh process. Orbax is used when available for
async multi-host checkpoints; the .npz path has zero dependencies.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prealps_tpu.solvers.ecg import (
    ECGOptions,
    ECGResult,
    _State,
    ecg_finalize,
    ecg_init,
    ecg_run,
)


def save_state(path: str, state: _State, normb) -> None:
    flat, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path,
        normb=np.asarray(normb),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )


def load_state(path: str):
    data = np.load(path)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files) - 1)]
    fields = _State._fields
    state = _State(*leaves[: len(fields)])
    return state, jnp.asarray(data["normb"])


def ecg_solve_checkpointed(
    a_apply,
    m_apply,
    b: jax.Array,
    opts: ECGOptions,
    checkpoint_path: str,
    every: int = 100,
    axis_name=None,
    split_assign=None,
    resume: bool = True,
    on_chunk: Optional[Callable[[int, float], None]] = None,
) -> ECGResult:
    """Chunked solve: run `every` iterations at a time, snapshotting state to
    `checkpoint_path` between chunks; resumes from an existing snapshot."""
    if m_apply is None:
        m_apply = lambda v: v
    if resume and os.path.exists(checkpoint_path):
        state, normb = load_state(checkpoint_path)
    else:
        state, normb = ecg_init(a_apply, m_apply, b, opts, axis_name, split_assign)

    run = jax.jit(
        lambda s, nb: ecg_run(
            a_apply, m_apply, s, nb, opts, axis_name, max_steps=every
        )
    )
    tol_abs = float(opts.tol) * float(normb)
    prev_it = int(state.it)
    while True:
        state = run(state, normb)
        it = int(state.it)
        res = float(state.res)
        save_state(checkpoint_path, state, normb)
        if on_chunk is not None:
            on_chunk(it, res)
        if res <= tol_abs or it >= opts.maxiter or bool(state.breakdown):
            break
        if float(jnp.sum(state.mask)) <= 0:
            break
        # the stall guard (opts.stall_window) can stop ecg_run's while_loop
        # with none of the conditions above met; without this check the outer
        # loop would re-run the identical stalled state forever
        if opts.stall_window > 0 and int(state.stall) >= opts.stall_window:
            break
        if it == prev_it:
            break  # no progress across a chunk: avoid an infinite loop
        prev_it = it
    return ecg_finalize(state, normb, opts.layout)
