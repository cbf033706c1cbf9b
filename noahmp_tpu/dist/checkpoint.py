"""Sharded checkpoint/restore of the prognostic state.

The reference *declares* restart files but never implements them
(run/case.nml:4,10-11; core/module_noahmp_engine.f90 stubs).  Here the
sharded state pytree is serialized with orbax (async-capable, works for
multi-host sharded arrays); the single-host npz path lives in
driver/io.py.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

try:
    import orbax.checkpoint as ocp
    HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is present in this image
    HAVE_ORBAX = False

if HAVE_ORBAX:
    # In a REAL multi-process job (jax.distributed initialized),
    # orbax's save path asks jax's PreemptionSyncManager whether a
    # preemption sync point was reached.  jax 0.9's nanobind
    # PreemptionSyncManager rejects the call orbax 0.11 makes
    # (TypeError: incompatible function arguments) and the whole save
    # crashes — found by the 2-process CPU SPMD run
    # (scripts/mp_spmd_cpu.py); single-process runs never enter this
    # branch.  Preemption-triggered early checkpointing is an
    # optimization, not correctness: degrade to "no preemption
    # signal" instead of failing the save.
    try:
        from jax.experimental import multihost_utils as _jmhu

        _orig_rpsp = _jmhu.reached_preemption_sync_point

        def _safe_reached_preemption_sync_point(step_id):
            try:
                return _orig_rpsp(step_id)
            except TypeError:
                return False

        _jmhu.reached_preemption_sync_point = \
            _safe_reached_preemption_sync_point
    except Exception:  # pragma: no cover
        pass

from ..state import State


class CheckpointManager:
    """Thin orbax wrapper keyed by step number."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        if not HAVE_ORBAX:
            raise RuntimeError("orbax-checkpoint is not available")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: State, wait: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                template: Optional[State] = None) -> State:
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints in {self.directory}")
        if template is not None:
            target = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=x.sharding)
                if hasattr(x, "sharding") else x, template)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(target))
        return self._mgr.restore(step)

    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
