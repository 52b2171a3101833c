"""Trainer: the epoch loop (reference: trainer.py [U], SURVEY.md §2.1/§3.1).

restore -> for epoch: for batch: device_put(sharded) -> jitted train step
(fwd+bwd+update in one XLA program) -> log -> periodic validate -> periodic
save. Device ingest (normalize/augment) happens inside the step via the
model's batch prep; host only decodes and stacks.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import register
from ..parallel.mesh import is_primary, make_mesh, shard_batch
from ..utils.signal_monitor import SignalMonitor
from .checkpoint import CheckpointManager
from .logger import Logger
from .train_step import OptimizerConfig, create_train_state, make_eval_step, make_train_step


def _device_batch(batch: Dict, mesh) -> Dict:
    arrs = {
        k: v
        for k, v in batch.items()
        if isinstance(v, (np.ndarray, jax.Array)) and not isinstance(v, list)
    }
    if mesh is not None:
        return shard_batch(arrs, mesh)
    return arrs


@register
class Trainer:
    def __init__(
        self,
        model,
        loader,
        optimizer: Optional[OptimizerConfig] = None,
        workspace: str = "/tmp/megreader_tpu_exp",
        epochs: int = 10,
        log_every: int = 50,
        validate_every_steps: int = 0,
        validate_fn: Optional[Callable] = None,
        checkpoint: Optional[CheckpointManager] = None,
        signal_monitor: Optional[SignalMonitor] = None,
        use_mesh: bool = True,
        prepare_batch: Optional[Callable[[Dict], Dict]] = None,
        seed: int = 0,
        debug_nans: bool = False,
        fuse_prepare: bool = True,
    ):
        self.model = model
        self.loader = loader
        self.optimizer = optimizer or OptimizerConfig()
        self.epochs = epochs
        self.log_every = log_every
        self.validate_every_steps = validate_every_steps
        self.validate_fn = validate_fn
        self.workspace = workspace
        self.logger = Logger(workspace)
        self.checkpoint = checkpoint or CheckpointManager(workspace)
        self.signal_monitor = signal_monitor or SignalMonitor()
        self.mesh = make_mesh() if use_mesh else None
        self.prepare_batch = prepare_batch
        # Step-aware prepare fns (e.g. device augmentation keyed by the
        # training step) declare a ``step`` parameter; plain fns don't.
        self._prepare_wants_step = False
        if prepare_batch is not None:
            import inspect

            try:
                self._prepare_wants_step = (
                    "step" in inspect.signature(prepare_batch).parameters
                )
            except (TypeError, ValueError):
                pass
        self.seed = seed
        #: optional debug mode (SURVEY.md §5.2): raise on any NaN produced
        #: inside jitted code. Costly — for debugging runs only.
        self.debug_nans = debug_nans
        #: trace prepare_batch INTO the jitted train step (pure-jax prepare
        #: fns only — all Experiment-built ones are): one XLA program per
        #: batch instead of several dispatches, and XLA fuses ingest into
        #: the forward pass.
        self.fuse_prepare = fuse_prepare and prepare_batch is not None

    def _prepare(self, batch: Dict, step: int) -> Dict:
        if self.prepare_batch is None:
            return batch
        if self._prepare_wants_step:
            return self.prepare_batch(batch, step=step)
        return self.prepare_batch(batch)

    def train(self, resume: bool = True):
        if self.debug_nans:
            jax.config.update("jax_debug_nans", True)
        tx = self.optimizer.make()
        sched = self.optimizer.make_schedule()

        first = next(iter(self.loader))
        first = self._prepare(first, 0)
        rng = jax.random.PRNGKey(self.seed)
        state = create_train_state(self.model, rng, _device_batch(first, None), tx)
        if resume:
            state = self.checkpoint.restore(state)
            if int(state.step) > 0:
                self.logger.info(f"resumed at step {int(state.step)}")

        step_fn = make_train_step(
            self.model, tx, mesh=self.mesh,
            prepare=self.prepare_batch if self.fuse_prepare else None,
            prepare_wants_step=self._prepare_wants_step,
        )
        step = int(state.step)
        # ``epochs`` is a TOTAL budget: resume extends the workspace toward
        # epochs * steps_per_epoch, it does not re-run ``epochs`` on top of
        # the restored step (re-invoking a cached harness used to silently
        # retrain; the reference restores its epoch counter the same way).
        try:
            target_steps = self.epochs * len(self.loader)
        except TypeError:
            target_steps = None
        if target_steps is not None and step >= target_steps:
            self.logger.info(
                f"already at step {step} >= target {target_steps}: no training"
            )
            self.checkpoint.wait()
            return state
        t_log = time.time()
        n_since = 0
        stop = False

        def do_step(db, epoch):
            nonlocal state, step, n_since, t_log, stop
            state, metrics = step_fn(state, db)
            step += 1
            n_since += db["image"].shape[0]
            if target_steps is not None and step >= target_steps:
                stop = True

            if step % self.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                self.logger.add_scalars(step, metrics)
                dt = time.time() - t_log
                self.logger.report(epoch, step, float(sched(step)), n_since / max(dt, 1e-6))
                t_log, n_since = time.time(), 0
                if self.signal_monitor.should_stop():
                    self.logger.info("signal file detected: saving and stopping")
                    stop = True

            if (
                self.validate_every_steps
                and self.validate_fn
                and step % self.validate_every_steps == 0
            ):
                val_metrics = self.validate_fn(self.model, state)
                self.logger.metrics(step, val_metrics)

            self.checkpoint.save(state, step)

        for epoch in range(self.epochs):
            if stop or (target_steps is not None and step >= target_steps):
                break
            # Pipeline: enqueue the NEXT batch's host->device transfer before
            # dispatching the step on the current one — the async dispatch
            # overlaps H2D with device compute (the tunnel transfer is the
            # bottleneck for detection-sized batches).
            pending = None
            for batch in self.loader:
                if not self.fuse_prepare:
                    batch = self._prepare(batch, step)
                db = _device_batch(batch, self.mesh)
                if pending is not None:
                    do_step(pending, epoch)
                pending = db
                if stop:
                    break
            if pending is not None and not stop:
                do_step(pending, epoch)

        self.checkpoint.save(state, step, force=True)
        self.checkpoint.wait()
        self.logger.info(f"training done at step {step}")
        return state
