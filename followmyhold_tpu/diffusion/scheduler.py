"""FOHO flow-matching Euler scheduler with REVERSED sigmas (0 -> 1).

Functional JAX port of the reference FlowMatchEulerDiscreteScheduler
(third_party_patches/hy3dgen/shapegen/schedulers.py). Unlike diffusers'
stateful class, the schedule is a static pytree and every step variant is a
pure function of (schedule, step_index, model_output, sample):

- step            (schedulers.py:235-319): prev = x + (sig[i+1]-sig[i])*eps,
                   pred_x1 = x + (1-sig[i])*eps; caller bumps the index.
- step_no_update  (schedulers.py:325-408): same but meant for the recursive
                   guidance loops where the index is NOT advanced.
- step_final      (schedulers.py:411-493): pred_x1 only.

Sigma construction parity (schedulers.py:75-88, 191-208):
  sigmas = linspace(sigma_max..sigma_min over N) with the shift transform
  shift*s / (1 + (shift-1)*s), then a trailing 1.0 is appended; timesteps =
  sigmas * num_train_timesteps. FOHO passes sigmas=linspace(0,1,N) explicitly
  (pipelines.py:946, 1187), which this module's make_schedule reproduces when
  `sigmas` is given.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class FlowMatchSchedule(NamedTuple):
    sigmas: jnp.ndarray      # [N+1] (trailing 1.0 appended)
    timesteps: jnp.ndarray   # [N] = sigmas[:-1] * num_train_timesteps
    num_train_timesteps: int


def make_schedule(
    num_inference_steps: Optional[int] = None,
    num_train_timesteps: int = 1000,
    shift: float = 1.0,
    sigmas: Optional[np.ndarray] = None,
) -> FlowMatchSchedule:
    """set_timesteps parity (schedulers.py:171-211)."""
    if sigmas is None:
        # default path: derive sigmas from the training schedule's extremes
        base = np.linspace(1, num_train_timesteps, num_train_timesteps,
                           dtype=np.float32) / num_train_timesteps
        base = shift * base / (1 + (shift - 1) * base)
        sigma_max, sigma_min = float(base[0]), float(base[-1])
        t = np.linspace(sigma_max * num_train_timesteps,
                        sigma_min * num_train_timesteps, num_inference_steps)
        sigmas = t / num_train_timesteps

    sigmas = np.asarray(sigmas, np.float32)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    timesteps = sigmas * num_train_timesteps
    sigmas_full = np.concatenate([sigmas, np.ones(1, np.float32)])
    return FlowMatchSchedule(
        sigmas=jnp.asarray(sigmas_full),
        timesteps=jnp.asarray(timesteps),
        num_train_timesteps=num_train_timesteps,
    )


def step(
    schedule: FlowMatchSchedule,
    step_index,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (prev_sample, pred_x1). fp32 internally (schedulers.py:292-309)."""
    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    sigma = schedule.sigmas[step_index]
    sigma_next = schedule.sigmas[step_index + 1]
    prev = x + (sigma_next - sigma) * eps
    pred_x1 = x + (1.0 - sigma) * eps
    return prev.astype(model_output.dtype), pred_x1.astype(model_output.dtype)


# step_no_update is numerically identical to step; the distinction in the
# reference is only whether the internal index advances (callers here own the
# index explicitly).
step_no_update = step


def step_final(
    schedule: FlowMatchSchedule,
    step_index,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """Clean-sample estimate pred_x1 = x + (1-sigma)*eps (schedulers.py:481)."""
    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    sigma = schedule.sigmas[step_index]
    return (x + (1.0 - sigma) * eps).astype(model_output.dtype)


def scale_noise(
    schedule: FlowMatchSchedule,
    step_index,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward process z_t = sigma*noise + (1-sigma)*x (schedulers.py:161)."""
    sigma = schedule.sigmas[step_index]
    return sigma * noise + (1.0 - sigma) * sample
