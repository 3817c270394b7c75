"""Oracle-denoiser probe: the DDIM reverse pass is exact.

Anchors the key diagnosis behind the flat deconvolution cosine at small
training budgets (BENCH_NOTES.md round 4): an ORACLE eps-denoiser — one
that returns the exact noise implied by x_t and the true target — pushed
through the full 50-step ``DDIMProcess.sample`` path (the same jitted
program the predict CLI runs, reference model.py:293-324) must recover
the target at cosine ~1.0. If it does, the sampler math, normalization
and conditioning plumbing are all correct, and any reconstruction gap in
a trained run is attributable to the denoiser's training scale, not the
stack.

Runs on CPU in seconds: `python scripts/probe_sampler_oracle.py`.
Checks both stepping modes (the reference's alpha_bars[t-1] neighbor
quirk, model.py:283-289, and the textbook sub-sampled update).
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RT, MZ = 34, 256


def main():
    import jax
    import jax.numpy as jnp

    from dquartic_tpu.core import DDIMProcess, make_schedule

    rng = np.random.default_rng(3)
    # sparse structured target + interferer, like the data-gen windows
    t_ax = np.arange(RT)
    target = np.zeros((RT, MZ), np.float32)
    other = np.zeros((RT, MZ), np.float32)
    for W in (target, other):
        for _ in range(4):
            prof = np.exp(-0.5 * ((t_ax - rng.uniform(3, RT - 3)) / rng.uniform(1.2, 2.5)) ** 2)
            spec = np.zeros(MZ, np.float32)
            spec[rng.integers(4, MZ - 4, 8)] = rng.lognormal(0, 0.8, 8)
            W += np.outer(prof, spec).astype(np.float32)
    lo = min(target.min(), other.min())
    hi = max(target.max(), other.max())
    target = (target - lo) / (hi - lo)
    other = (other - lo) / (hi - lo)
    mix = 0.5 * target + 0.5 * other
    x0 = jnp.asarray(target)[None]
    mixture = jnp.asarray(mix)[None]
    ms1 = jnp.asarray(target.sum(axis=1) / target.sum(axis=1).max())[None]

    schedule = make_schedule(num_timesteps=1000, schedule_type="cosine", pred_type="eps")
    ab = jnp.asarray(schedule.alpha_bars)

    results = {}
    for neighbor in (False, True):
        process = DDIMProcess(schedule=schedule, parity_neighbor_stepping=neighbor)
        x0n = process.normalize(x0)

        def oracle(x_t, t_vec, init_cond, attn_cond):
            # exact eps implied by x_t and the true (normalized) target:
            # eps = (x_t - sqrt(ab_t) * x0) / sqrt(1 - ab_t)
            a = ab[t_vec[0]]
            return (x_t - jnp.sqrt(a) * x0n) / jnp.sqrt(1.0 - a)

        noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape, jnp.float32)
        out, _ = jax.jit(
            lambda n: process.sample(oracle, n, mixture, ms1, num_steps=50)
        )(noise)
        a = np.asarray(out, np.float64).ravel()
        b = np.asarray(x0, np.float64).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        results["neighbor" if neighbor else "proper"] = cos
        print(f"stepping={'neighbor(parity)' if neighbor else 'proper'}: "
              f"oracle 50-step cosine(sample, target) = {cos:.6f}")

    assert all(c > 0.9999 for c in results.values()), results
    print("OK: sampler math is exact under an oracle denoiser")


if __name__ == "__main__":
    main()
