"""Learning-rate schedules.

Replaces reference: ModelComponents/learning_rate_schedulers.py (the AIAYN
warmup/decay schedule — whose reference implementation contains scoping bugs,
learning_rate_schedulers.py:28-30 — and the Keras ``CosineDecayRestarts`` the
reference notebooks actually train with: ``CosineDecayRestarts(1e-3, 4000,
m_mul=.95, alpha=.1)``, DETR_COCO.ipynb cell 26).

All schedules are jnp-traceable step -> lr functions usable inside optax.
"""

from __future__ import annotations

import jax.numpy as jnp


def aiayn_schedule(d_model: int, warmup_steps: int = 4000,
                   scale: float = 1.0, cycle_steps: int = 0):
    """'Attention Is All You Need' schedule:
    ``lr = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)``, with the
    reference's optional cyclic restart (step wraps every ``cycle_steps``)."""

    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype")
                           else jnp.float32(step), 1.0)
        if cycle_steps:
            step = jnp.mod(step - 1.0, jnp.float32(cycle_steps)) + 1.0
        return scale * d_model ** -0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5)

    return schedule


def cosine_decay_restarts(initial_lr: float, first_decay_steps: int,
                          t_mul: float = 2.0, m_mul: float = 1.0,
                          alpha: float = 0.0):
    """Keras ``CosineDecayRestarts`` semantics (SGDR, Loshchilov & Hutter):
    each restart period is ``t_mul`` times longer and ``m_mul`` times
    shallower; floor at ``alpha * initial_lr``."""

    def schedule(step):
        p = jnp.asarray(step, jnp.float32) / float(first_decay_steps)
        if t_mul == 1.0:
            i_restart = jnp.floor(p)
            t = p - i_restart
        else:
            i_restart = jnp.floor(
                jnp.log1p(p * (t_mul - 1.0)) / jnp.log(t_mul))
            sum_r = (t_mul ** i_restart - 1.0) / (t_mul - 1.0)
            t = (p - sum_r) / t_mul ** i_restart
        m_fac = m_mul ** i_restart
        cosine_decayed = 0.5 * m_fac * (1.0 + jnp.cos(jnp.pi * t))
        decayed = (1.0 - alpha) * cosine_decayed + alpha
        return initial_lr * decayed

    return schedule


def constant(lr: float):
    return lambda step: jnp.float32(lr)


def make_schedule(name: str, learning_rate: float, warmup_steps: int,
                  d_model: int = 256):
    if name == "cosine_restarts":
        # reference notebook defaults (DETR_COCO.ipynb cell 26)
        return cosine_decay_restarts(learning_rate, warmup_steps,
                                     t_mul=2.0, m_mul=0.95, alpha=0.1)
    if name == "aiayn":
        return aiayn_schedule(d_model, warmup_steps)
    if name == "constant":
        return constant(learning_rate)
    raise ValueError(f"unknown schedule '{name}'")
