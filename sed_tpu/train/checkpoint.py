"""Orbax checkpointing of {step, params, batch_stats, opt_state}.

Replaces the reference's ``torch.save({'iteration', 'model',
'optimizer'})`` best-checkpoint scheme (``pytorch/main_strong.py:326-334``).
Reference ``.pth`` files remain loadable through
``sed_tpu.compat.torch_loader``.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state) -> None:
    """Save a SedTrainState to ``path`` (an Orbax directory)."""
    path = os.path.abspath(path)
    payload = {
        'step': int(state.step),
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def restore_checkpoint(path: str, state):
    """Restore a SedTrainState saved by ``save_checkpoint``; the given
    state supplies the tree structure/shardings."""
    path = os.path.abspath(path)
    template = {
        'step': int(state.step),
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return state.replace(
        step=restored['step'],
        params=restored['params'],
        batch_stats=restored['batch_stats'],
        opt_state=restored['opt_state'])


def load_variables(path: str, like_variables: Optional[dict] = None) -> dict:
    """Load checkpoint variables for inference: supports both Orbax dirs
    and reference ``.pth`` files."""
    if path.endswith('.pth'):
        from sed_tpu.compat.torch_loader import load_checkpoint_variables
        variables, _ = load_checkpoint_variables(path)
        return variables
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    out = {'params': restored['params']}
    if restored.get('batch_stats') is not None:
        out['batch_stats'] = restored['batch_stats']
    return out
