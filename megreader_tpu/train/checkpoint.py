"""Checkpoint save/restore (reference: training/checkpoint.py +
training/model_saver.py [U]; SURVEY.md §5.4).

Primary format is orbax (sharded, async-capable, multi-host-safe); a plain
msgpack fallback (flax.serialization) covers minimal environments. Resume
restores step + params + optimizer + batch stats — strictly more than the
reference's weights-level resume.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
from flax import serialization

from ..core.registry import register
from .train_step import TrainState


@register
class CheckpointManager:
    def __init__(
        self,
        workspace: str,
        keep: int = 5,
        save_every_steps: int = 1000,
        use_orbax: bool = True,
        async_save: bool = True,
    ):
        self.dir = os.path.join(workspace, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self.keep = keep
        self.save_every_steps = save_every_steps
        self._mgr = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._mgr = ocp.CheckpointManager(
                    os.path.abspath(self.dir),
                    options=ocp.CheckpointManagerOptions(
                        max_to_keep=keep,
                        enable_async_checkpointing=async_save,
                    ),
                )
            except Exception:
                self._mgr = None  # msgpack fallback

    # -- msgpack fallback ---------------------------------------------------
    def _msgpack_path(self, step: int) -> str:
        return os.path.join(self.dir, f"state_{step:08d}.msgpack")

    def save(self, state: TrainState, step: Optional[int] = None, force: bool = False):
        step = int(state.step) if step is None else step
        if not force and self.save_every_steps and step % self.save_every_steps != 0:
            return False
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            self._mgr.save(step, args=ocp.args.StandardSave(state))
            return True
        with open(self._msgpack_path(step), "wb") as f:
            f.write(serialization.to_bytes(state))
        self._prune()
        return True

    def _prune(self):
        ckpts = sorted(
            f for f in os.listdir(self.dir) if re.match(r"state_\d+\.msgpack", f)
        )
        for f in ckpts[: -self.keep]:
            os.remove(os.path.join(self.dir, f))

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        ckpts = sorted(
            f for f in os.listdir(self.dir) if re.match(r"state_\d+\.msgpack", f)
        )
        return int(re.findall(r"\d+", ckpts[-1])[0]) if ckpts else None

    def restore(self, target: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.latest_step()
        if step is None:
            return target
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            return self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        with open(self._msgpack_path(step), "rb") as f:
            return serialization.from_bytes(target, f.read())

    def restore_variables(self, variables: Any, step: Optional[int] = None) -> Any:
        """Restore inference variables (params [+ batch_stats]) from a
        training checkpoint, ignoring optimizer state.

        Inference/eval surfaces must not depend on how a model was trained:
        a checkpoint written under a different optimizer config (e.g. adamw
        vs sgd, or with/without MultiSteps) has a different ``opt_state``
        tree, and a full TrainState restore refuses it. Partial restore of
        the params/batch_stats subtrees is robust to that drift.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            return variables
        target = {"params": variables["params"]}
        if "batch_stats" in variables:
            target["batch_stats"] = variables["batch_stats"]
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            out = self._mgr.restore(
                step, args=ocp.args.PyTreeRestore(item=target, partial_restore=True)
            )
            return {**variables, **{k: out[k] for k in target}}
        with open(self._msgpack_path(step), "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        return {
            **variables,
            **{
                k: serialization.from_state_dict(target[k], raw[k])
                for k in target
            },
        }

    def restore_variables_host(
        self, variables: Any, step: Optional[int] = None
    ) -> Any:
        """Like restore_variables, but restores to HOST numpy arrays with
        explicit RestoreArgs — required when this process runs on a
        different platform than the one that saved (an orbax checkpoint's
        saved shardings name devices a CPU-only process can't rebuild)."""
        import numpy as np

        step = step if step is not None else self.latest_step()
        if step is None:
            return variables
        if self._mgr is None:
            return self.restore_variables(variables, step=step)
        import orbax.checkpoint as ocp

        target = {"params": variables["params"]}
        if "batch_stats" in variables:
            target["batch_stats"] = variables["batch_stats"]
        target = jax.tree.map(np.asarray, target)
        out = self._mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item=target,
                restore_args=jax.tree.map(
                    lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target
                ),
                partial_restore=True,
            ),
        )
        return {**variables, **{k: out[k] for k in target}}

    def wait(self):
        if self._mgr is not None:
            self._mgr.wait_until_finished()
