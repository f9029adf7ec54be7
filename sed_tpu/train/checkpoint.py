"""Orbax checkpointing of {step, params, batch_stats, opt_state}.

Replaces the reference's ``torch.save({'iteration', 'model',
'optimizer'})`` best-checkpoint scheme (``pytorch/main_strong.py:326-334``).
Reference ``.pth`` files remain loadable through
``sed_tpu.compat.torch_loader``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import orbax.checkpoint as ocp


def _is_orbax_checkpoint(path: str) -> bool:
    """True when ``path`` holds an actual saved checkpoint (not just any
    non-empty directory) — StandardCheckpointer always writes these
    metadata files at the checkpoint root."""
    return any(os.path.exists(os.path.join(path, name))
               for name in ('_CHECKPOINT_METADATA', '_METADATA',
                            'manifest.ocdbt'))


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


def save_best_checkpoint(ckpt_dir: str, state) -> str:
    """Save a step-tagged best checkpoint (``ckpt_dir/iter_<step>``) and
    update the ``BEST`` marker.

    The reference overwrites one fixed-name ``.pth`` per run
    (``pytorch/main_strong.py:326-334``); keeping the lineage step-tagged
    lets ``--resume_iteration N`` restore the checkpoint *at* N instead of
    whatever was best last.
    """
    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f'iter_{step}')
    save_checkpoint(path, state)
    with open(os.path.join(ckpt_dir, 'BEST'), 'w') as f:
        f.write(str(step))
    return path


def best_checkpoint_path(ckpt_dir: str) -> Optional[str]:
    """Resolve the best checkpoint inside a lineage directory.

    Prefers the ``BEST`` marker; falls back to the highest ``iter_*``
    subdir, then to ``ckpt_dir`` itself when it is an old-style flat
    Orbax checkpoint.
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    marker = os.path.join(ckpt_dir, 'BEST')
    if os.path.isfile(marker):
        with open(marker) as f:
            return os.path.join(ckpt_dir, f'iter_{int(f.read().strip())}')
    if os.path.isdir(ckpt_dir):
        iters = sorted(
            (int(d[len('iter_'):]) for d in os.listdir(ckpt_dir)
             if d.startswith('iter_') and d[len('iter_'):].isdigit()))
        if iters:
            return os.path.join(ckpt_dir, f'iter_{iters[-1]}')
        if _is_orbax_checkpoint(ckpt_dir):  # old-style flat Orbax dir
            return ckpt_dir
    return None


def resume_checkpoint_path(ckpt_dir: str, iteration: int) -> str:
    """Path of the checkpoint saved at exactly ``iteration`` — the
    ``--resume_iteration N`` contract (``pytorch/main_strong.py:205-213``).
    Raises with the available iterations when N was never saved."""
    path = os.path.join(os.path.abspath(ckpt_dir), f'iter_{iteration}')
    if os.path.isdir(path):
        return path
    have = sorted(int(d[len('iter_'):]) for d in
                  (os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else [])
                  if d.startswith('iter_') and d[len('iter_'):].isdigit())
    if not have and _is_orbax_checkpoint(ckpt_dir):
        # old-style flat Orbax dir (pre step-tagged lineage): the single
        # saved state is the only resume candidate, like the reference's
        # single best_*.pth.  A directory with neither iter_* children
        # nor Orbax metadata (a typo'd / junk path) falls through to the
        # clear FileNotFoundError instead.
        logging.warning(
            'resume: %s is a legacy flat checkpoint with no iteration '
            'lineage — ignoring the requested iteration %d and restoring '
            'the single saved state', ckpt_dir, iteration)
        return os.path.abspath(ckpt_dir)
    raise FileNotFoundError(
        f'no checkpoint at iteration {iteration} in {ckpt_dir}; '
        f'saved iterations: {have}')


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
