"""DDIM diffusion process as pure JAX functions.

Re-implements the semantics of the reference ``DDIMDiffusionModel``
(/root/reference/dquartic/model/model.py:151-406) in functional form:

  * :meth:`DDIMProcess.q_sample`       — forward noising (model.py:225-242)
  * :meth:`DDIMProcess.ddim_step`      — one deterministic (eta=0) reverse
    step (model.py:244-291)
  * :meth:`DDIMProcess.sample`         — the full reverse pass, compiled as
    ONE ``lax.scan`` program instead of the reference's Python loop of
    synchronous model calls (model.py:293-324)
  * :meth:`DDIMProcess.train_loss`     — the training objective
    (model.py:326-406)

Deliberate fixes relative to the reference (documented, parity-preserving
at the reference's shipped batch_size=1 configuration):

  * The loss is reduced **per sample** then weighted by the per-timestep
    SNR weight and averaged, implementing the intent of model.py:399-404.
    The reference computes a scalar MSE and re-broadcasts the weight,
    which only backpropagates correctly at batch_size=1; at batch_size=1
    both formulations produce the identical scalar.
  * The MS1 pseudo-chromatogram consistency loss uses ``max`` *values*
    (the reference's ``torch.max(x, dim=-1)`` returns a (values, indices)
    namedtuple and would crash if ``ms1_loss_weight > 0`` — model.py:366-371),
    and compares per-RT projections elementwise rather than broadcasting a
    scalar (model.py:369-371 relies on batch-size-1 broadcasting).
  * ``parity_neighbor_stepping=True`` (default) reproduces the reference
    quirk of stepping to ``alpha_bars[t-1]`` even when the sub-sampled
    DDIM stride is > 1 (model.py:283-289). Set it to False for the
    textbook DDIM update targeting the actual next sub-sampled timestep.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule

# A denoiser: (x_t, t, init_cond, attn_cond) -> prediction (eps or x0).
# Parameters are expected to be bound by the caller (e.g. functools.partial
# over a flax ``apply``), keeping this module free of any framework coupling.
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]], jnp.ndarray]


def normalize_to_neg_one_to_one(x: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] -> [-1, 1] (reference model.py:89-99)."""
    return x * 2.0 - 1.0


def unnormalize_to_zero_to_one(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1] (reference model.py:102-112)."""
    return (x + 1.0) * 0.5


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape for broadcasting.

    Equivalent to the reference ``extract`` helper (model.py:131-148).
    ``t`` has shape (b,); the result has shape (b, 1, ..., 1) with ``ndim``
    total dimensions.
    """
    out = jnp.take(table, t, axis=0)
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def sample_timesteps(num_timesteps: int, num_steps: int) -> np.ndarray:
    """The reverse-pass timestep sequence, T-1 .. 0.

    Matches ``torch.linspace(T-1, 0, num_steps, dtype=long)``
    (reference model.py:313): computed in float then truncated.
    """
    return np.linspace(num_timesteps - 1, 0, num_steps).astype(np.int32)


@dataclasses.dataclass(frozen=True)
class DDIMProcess:
    """Deterministic (eta=0) DDIM forward/reverse process.

    All heavy arrays live in ``schedule`` as host numpy constants; methods
    are pure and jit-safe (no Python control flow on traced values).
    """

    schedule: DiffusionSchedule
    auto_normalize: bool = True
    ms1_loss_weight: float = 0.0
    parity_neighbor_stepping: bool = True
    # Clamp the per-step x0 estimate to the normalized [-1, 1] range (the
    # standard "clip_denoised" of DDPM/DDIM codebases, e.g. lucidrains'
    # clip_x_start). The reference omits it (model.py:271-280) and its
    # reverse pass is numerically explosive: at t~999 the cosine
    # schedule's alpha_bar ~ 1e-5 amplifies any eps-prediction error
    # ~300x into x0, and the iteration compounds it (measured: a trained
    # model's 50-step samples reach |x| ~ 60 unclipped vs staying in
    # range clipped, BENCH_NOTES.md). clip_denoised=False restores exact
    # reference behavior.
    clip_denoised: bool = True

    # ------------------------------------------------------------------ #
    # normalization                                                      #
    # ------------------------------------------------------------------ #

    def normalize(self, x: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
        if x is None:
            return None
        return normalize_to_neg_one_to_one(x) if self.auto_normalize else x

    def unnormalize(self, x: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
        if x is None:
            return None
        return unnormalize_to_zero_to_one(x) if self.auto_normalize else x

    # ------------------------------------------------------------------ #
    # forward process                                                    #
    # ------------------------------------------------------------------ #

    def q_sample(self, x_0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Sample q(x_t | x_0) = sqrt(ab_t) x0 + sqrt(1-ab_t) eps.

        ``x_0`` is assumed already normalized; ``t`` has shape (b,).
        (reference model.py:225-242)
        """
        ab = jnp.asarray(self.schedule.alpha_bars)
        sqrt_ab = jnp.sqrt(_extract(ab, t, x_0.ndim)).astype(x_0.dtype)
        sqrt_1mab = jnp.sqrt(1.0 - _extract(ab, t, x_0.ndim)).astype(x_0.dtype)
        return sqrt_ab * x_0 + sqrt_1mab * noise

    # ------------------------------------------------------------------ #
    # reverse process                                                    #
    # ------------------------------------------------------------------ #

    def ddim_step(
        self,
        denoise_fn: DenoiseFn,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        t_prev: jnp.ndarray,
        init_cond: Optional[jnp.ndarray],
        attn_cond: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One reverse step x_t -> x_{t_prev} (reference model.py:244-291).

        ``t`` is a scalar int32 (traced); ``t_prev`` the next timestep in
        the sub-sampled sequence (ignored when ``parity_neighbor_stepping``).
        Returns (x_prev, eps_pred).
        """
        ab = jnp.asarray(self.schedule.alpha_bars)
        batch = x_t.shape[0]
        t_vec = jnp.full((batch,), t, dtype=jnp.int32)

        alpha_bar_t = ab[t].astype(x_t.dtype)
        sqrt_ab_t = jnp.sqrt(alpha_bar_t)
        sqrt_1mab_t = jnp.sqrt(1.0 - alpha_bar_t)

        # The denoiser may compute in bf16; the DDIM algebra (and the scan
        # carry) stays in the state dtype.
        pred = denoise_fn(x_t, t_vec, init_cond, attn_cond).astype(x_t.dtype)
        if self.schedule.pred_type == "eps":
            eps_pred = pred
            x0_pred = (x_t - sqrt_1mab_t * eps_pred) / sqrt_ab_t
        elif self.schedule.pred_type == "x0":
            x0_pred = pred
            eps_pred = (x_t - sqrt_ab_t * x0_pred) / sqrt_1mab_t
        else:
            raise ValueError(f"Unknown pred_type: {self.schedule.pred_type!r}")

        if self.clip_denoised:
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
            # re-derive eps consistent with the clamped x0 (lucidrains'
            # convention) so the reconstruction stays on-manifold
            eps_pred = (x_t - sqrt_ab_t * x0_pred) / jnp.maximum(sqrt_1mab_t, 1e-8)

        if self.parity_neighbor_stepping:
            prev_idx = jnp.maximum(t - 1, 0)
        else:
            prev_idx = jnp.maximum(t_prev, 0)
        alpha_bar_prev = ab[prev_idx].astype(x_t.dtype)
        x_prev_inner = jnp.sqrt(alpha_bar_prev) * x0_pred + jnp.sqrt(1.0 - alpha_bar_prev) * eps_pred
        x_prev = jnp.where(t > 0, x_prev_inner, x0_pred)
        return x_prev, eps_pred

    def sample(
        self,
        denoise_fn: DenoiseFn,
        x_t: jnp.ndarray,
        ms2_cond: Optional[jnp.ndarray] = None,
        ms1_cond: Optional[jnp.ndarray] = None,
        num_steps: int = 1000,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full reverse pass as a single ``lax.scan`` (reference model.py:293-324).

        Returns ``(x_0_hat, pred_noise)`` in data space. When ``ms2_cond``
        is given, ``pred_noise`` follows the reference's output convention
        ``unnormalize(ms2_cond) - x_0_hat`` — i.e. the removed interference
        signal (model.py:321-323).
        """
        ms2_n = self.normalize(ms2_cond)
        ms1_n = self.normalize(ms1_cond)

        steps = sample_timesteps(self.schedule.num_timesteps, num_steps)
        # Pair each timestep with its successor in the sub-sampled sequence.
        steps_prev = np.concatenate([steps[1:], np.array([-1], dtype=np.int32)])
        ts = jnp.asarray(np.stack([steps, steps_prev], axis=1))

        def body(carry, t_pair):
            x, _ = carry
            t, t_prev = t_pair[0], t_pair[1]
            x_next, eps = self.ddim_step(denoise_fn, x, t, t_prev, ms2_n, ms1_n)
            return (x_next, eps), None

        (x_final, eps_final), _ = jax.lax.scan(body, (x_t, jnp.zeros_like(x_t)), ts)

        x_out = self.unnormalize(x_final)
        pred_noise = self.unnormalize(eps_final)
        if ms2_cond is not None:
            pred_noise = self.unnormalize(ms2_n) - x_out
        return x_out, pred_noise

    # ------------------------------------------------------------------ #
    # training objective                                                 #
    # ------------------------------------------------------------------ #

    def train_loss(
        self,
        denoise_fn: DenoiseFn,
        rng: jax.Array,
        x_0: jnp.ndarray,
        ms2_cond: Optional[jnp.ndarray] = None,
        ms1_cond: Optional[jnp.ndarray] = None,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, dict]:
        """Diffusion training loss (reference model.py:326-406).

        Draws t ~ U[0, T) and eps ~ N(0, I) from ``rng``, noises the
        normalized target, runs the denoiser, and returns
        ``(scalar_loss, aux)`` where aux holds the per-sample loss and t.
        """
        t_rng, noise_rng = jax.random.split(rng)
        batch = x_0.shape[0]
        t = jax.random.randint(t_rng, (batch,), 0, self.schedule.num_timesteps)

        x_0n = self.normalize(x_0)
        if noise is None:
            noise = jax.random.normal(noise_rng, x_0.shape, dtype=x_0n.dtype)
        else:
            noise = self.normalize(noise)
        ms2_n = self.normalize(ms2_cond)
        ms1_n = self.normalize(ms1_cond)

        x_t = self.q_sample(x_0n, t, noise)
        pred = denoise_fn(x_t, t, ms2_n, ms1_n)

        if self.schedule.pred_type == "eps":
            target = noise
            denoised = x_t - pred  # reference model.py:367 uses x_t - eps_pred
        elif self.schedule.pred_type == "x0":
            target = x_0n
            denoised = pred
        else:
            raise ValueError(f"Unknown pred_type: {self.schedule.pred_type!r}")

        # Per-sample MSE (intent of model.py:361, 391-393).
        sq = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
        primary = jnp.mean(sq.reshape(batch, -1), axis=1)

        if self.ms1_loss_weight > 0.0 and ms1_n is not None:
            additional = self._ms1_sic_loss(denoised, ms1_n)
            per_sample = (1.0 - self.ms1_loss_weight) * primary + self.ms1_loss_weight * additional
        else:
            per_sample = primary

        weight = _extract(jnp.asarray(self.schedule.loss_weight), t, 1)
        per_sample = per_sample * weight
        loss = jnp.mean(per_sample)
        aux = {"per_sample_loss": per_sample, "t": t, "primary_loss": jnp.mean(primary)}
        return loss, aux

    @staticmethod
    def _ms1_sic_loss(denoised: jnp.ndarray, ms1: jnp.ndarray) -> jnp.ndarray:
        """MS1 pseudo-chromatogram consistency loss (model.py:364-371, fixed).

        Projects the denoised MS2 map along m/z with sum/mean/max, compares
        each (max-normalized, per sample) to the same projection of the MS1
        condition, elementwise over RT.
        """
        batch = denoised.shape[0]
        eps = 1e-12

        def proj(x, fn):
            if x.ndim == 2:  # (b, rt) 1-D chromatogram: already a projection
                return x
            return fn(x, axis=-1)

        total = jnp.zeros((batch,), dtype=jnp.float32)
        for fn in (jnp.sum, jnp.mean, jnp.max):
            sic = proj(denoised, fn).astype(jnp.float32)
            ms1_sic = proj(ms1, fn).astype(jnp.float32)
            sic_n = sic / (jnp.max(jnp.abs(sic), axis=-1, keepdims=True) + eps)
            ms1_n = ms1_sic / (jnp.max(jnp.abs(ms1_sic), axis=-1, keepdims=True) + eps)
            total = total + jnp.mean(jnp.square(sic_n - ms1_n), axis=-1)
        return total
