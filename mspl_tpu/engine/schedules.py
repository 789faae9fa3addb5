"""Learning-rate schedules (reference `utilities/lr_scheduler.py`,
SURVEY.md §2 "LR schedulers": poly decay, step, cyclic, hybrid = cyclic
restarts followed by linear decay), expressed as optax step→lr schedules.

Schedules are defined per-step; `steps_per_epoch` converts the reference's
per-epoch semantics.
"""

from __future__ import annotations

import optax


def poly_schedule(base_lr: float, total_steps: int, power: float = 0.9):
    def fn(step):
        frac = optax.schedules.polynomial_schedule(  # guard against step>total
            init_value=1.0, end_value=0.0, power=1.0, transition_steps=total_steps
        )(step)
        return base_lr * (frac ** power)

    return fn


def step_schedule(base_lr: float, step_size: int, gamma: float = 0.5):
    return optax.exponential_decay(
        init_value=base_lr, transition_steps=step_size, decay_rate=gamma,
        staircase=True,
    )


def cyclic_schedule(base_lr: float, max_lr: float, cycle_len: int):
    """Triangular cyclic LR between base_lr and max_lr with period cycle_len."""
    def fn(step):
        pos = (step % cycle_len) / max(cycle_len - 1, 1)
        tri = 1.0 - abs(2.0 * pos - 1.0)  # 0 -> 1 -> 0 over the cycle
        return base_lr + (max_lr - base_lr) * tri

    return fn


def hybrid_schedule(base_lr: float, max_lr: float, cycle_len: int,
                    cycle_steps: int, total_steps: int):
    """Cyclic restarts for `cycle_steps`, then linear decay to 0 (the
    reference's 'hybrid' policy)."""
    cyc = cyclic_schedule(base_lr, max_lr, cycle_len)
    lin = optax.linear_schedule(
        init_value=max_lr, end_value=0.0,
        transition_steps=max(total_steps - cycle_steps, 1),
    )

    def fn(step):
        import jax.numpy as jnp

        return jnp.where(step < cycle_steps, cyc(step), lin(step - cycle_steps))

    return fn


def build_schedule(
    name: str,
    base_lr: float,
    total_steps: int,
    steps_per_epoch: int = 1,
    power: float = 0.9,
    step_epochs: int = 30,
    gamma: float = 0.5,
    max_lr: float = None,
    cycle_epochs: int = 5,
    cycle_frac: float = 0.5,
):
    """Build a step→lr schedule by registry name (SCHEDULER_NAMES)."""
    max_lr = max_lr if max_lr is not None else base_lr * 5.0
    if name == "poly":
        return poly_schedule(base_lr, total_steps, power)
    if name == "step":
        return step_schedule(base_lr, step_epochs * steps_per_epoch, gamma)
    if name == "cyclic":
        return cyclic_schedule(base_lr, max_lr, cycle_epochs * steps_per_epoch)
    if name == "hybrid":
        return hybrid_schedule(
            base_lr, max_lr, cycle_epochs * steps_per_epoch,
            int(total_steps * cycle_frac), total_steps,
        )
    if name == "linear":
        return optax.linear_schedule(base_lr, 0.0, total_steps)
    if name == "fixed":
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown scheduler '{name}'")
