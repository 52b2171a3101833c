"""Jitted train/eval steps + optimizer construction.

The reference's hot loop (``trainer.train_step`` [U], SURVEY.md §3.1) is
forward -> backward -> all-reduce (DDP hooks) -> SGD step, one CUDA stream.
Here the whole step is ONE jitted SPMD program: loss+grad+optimizer update
compiled together, gradients reduced by XLA collectives implied by the
sharding (batch on 'data', params replicated), buffers donated so params
update in place.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.registry import register


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@register
class OptimizerConfig:
    """YAML-constructible optimizer + schedule (reference: training/ [U])."""

    def __init__(
        self,
        name: str = "sgd",
        lr: float = 0.007,
        momentum: float = 0.9,
        weight_decay: float = 1e-4,
        schedule: str = "poly",  # 'constant' | 'poly' | 'cosine' | 'warmup_cosine'
        total_steps: int = 100_000,
        warmup_steps: int = 0,
        power: float = 0.9,
        grad_clip: Optional[float] = None,
        accumulate_steps: int = 1,
    ):
        self.name = name
        self.lr = lr
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.schedule = schedule
        self.total_steps = total_steps
        self.warmup_steps = warmup_steps
        self.power = power
        self.grad_clip = grad_clip
        self.accumulate_steps = accumulate_steps

    def make_schedule(self) -> optax.Schedule:
        if self.schedule == "constant":
            base = optax.constant_schedule(self.lr)
        elif self.schedule == "poly":
            # The reference's DecayLearningRate: lr * (1 - step/total)^power
            base = optax.polynomial_schedule(
                init_value=self.lr,
                end_value=0.0,
                power=self.power,
                transition_steps=self.total_steps,
            )
        elif self.schedule in ("cosine", "warmup_cosine"):
            base = optax.cosine_decay_schedule(self.lr, self.total_steps)
        else:
            raise ValueError(f"unknown schedule {self.schedule!r}")
        if self.warmup_steps > 0 or self.schedule == "warmup_cosine":
            warm = max(self.warmup_steps, 1)
            base = optax.join_schedules(
                [optax.linear_schedule(0.0, self.lr, warm), base], [warm]
            )
        return base

    def make(self) -> optax.GradientTransformation:
        sched = self.make_schedule()
        if self.name == "sgd":
            tx = optax.chain(
                optax.add_decayed_weights(self.weight_decay),
                optax.sgd(sched, momentum=self.momentum),
            )
        elif self.name in ("adam", "adamw"):
            tx = optax.adamw(sched, weight_decay=self.weight_decay)
        else:
            raise ValueError(f"unknown optimizer {self.name!r}")
        if self.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), tx)
        if self.accumulate_steps > 1:
            tx = optax.MultiSteps(tx, self.accumulate_steps)
        return tx


def create_train_state(model, rng, sample_batch, tx) -> TrainState:
    variables = model.init(rng, sample_batch["image"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    model, tx, mesh: Optional[Mesh] = None, donate: bool = True,
    prepare=None, prepare_wants_step: bool = False,
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """Compile the full train step. With a mesh: batch sharded on 'data',
    state replicated — XLA inserts the gradient all-reduce over ICI.

    ``prepare``: optional pure-jax batch transform (device augmentation, GT
    rasterization, normalize) traced INTO the step — the whole
    ingest+forward+backward+update pipeline becomes ONE XLA program per
    batch. Besides letting XLA fuse ingest into the forward pass, this cuts
    per-batch dispatches, which dominate on high-RTT links (the axon dev
    tunnel). ``prepare_wants_step`` passes ``step=state.step`` (traced) for
    step-keyed augmentation streams.
    """

    def step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        if prepare is not None:
            batch = (
                prepare(batch, step=state.step)
                if prepare_wants_step
                else prepare(batch)
            )

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            loss, (metrics, new_model_state) = model.loss(variables, batch, train=True)
            return loss, (metrics, new_model_state)

        (loss, (metrics, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh: Optional[Mesh] = None):
    def step(state: TrainState, batch: Dict) -> Dict:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        loss, (metrics, _) = model.loss(variables, batch, train=False)
        return metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step, in_shardings=(repl, data), out_shardings=repl)
    return jax.jit(step)
