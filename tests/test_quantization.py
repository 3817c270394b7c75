"""Int8 weight-only quantization tests: round-trip accuracy, size
reduction, model output drift, and checkpoint serialization."""

import jax
import jax.numpy as jnp
import numpy as np

from dquartic_tpu.models import UNet1d
from dquartic_tpu.ops.quantization import (
    dequantize_params,
    quantize_params,
    quantized_nbytes,
    stochastic_round_to_int8,
)

TINY = dict(
    dim=8,
    channels=1,
    dim_mults=(1, 2),
    conditional=True,
    init_cond_channels=1,
    attn_cond_channels=1,
    downsample_dim=64,
    simple=True,
)


_INIT_CACHE = []


def _init():
    # one jitted (persistently cached) init shared across this module's
    # tests: eager init was ~3 s per test on the 1-core host
    if not _INIT_CACHE:
        model = UNet1d(**TINY)
        x = jnp.ones((1, 4, 64))
        t = jnp.zeros((1,), jnp.int32)
        ac = jnp.ones((1, 4))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, x, ac)
        _INIT_CACHE.append((model, params, (x, t, x, ac)))
    return _INIT_CACHE[0]


_JAPPLY_CACHE = []


def _japply():
    # likewise: ONE jitted apply traced once for the whole module
    if not _JAPPLY_CACHE:
        model, _, _ = _init()
        _JAPPLY_CACHE.append(jax.jit(model.apply))
    return _JAPPLY_CACHE[0]


def test_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 64, 128)).astype(np.float32))
    q = quantize_params({"k": {"w": w}}, min_size=1)
    deq = dequantize_params(q)["k"]["w"]
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    # per-channel symmetric int8: max error is scale/2 = absmax/254
    assert err <= float(jnp.max(jnp.abs(w))) / 127.0


def test_small_leaves_passthrough():
    tree = {"a": {"bias": jnp.ones((8,)), "big": jnp.ones((128, 64))}}
    q = quantize_params(tree, min_size=1000)
    assert "bias" in q["a"] and "big::q_values" in q["a"]
    deq = dequantize_params(q)
    assert set(deq["a"]) == {"bias", "big"}


def test_model_size_shrinks_and_output_close():
    model, params, args = _init()
    q = quantize_params(params, min_size=1024)
    raw = quantized_nbytes(params)
    packed = quantized_nbytes(q)
    assert packed < raw * 0.65  # bottleneck weights dominate -> big shrink

    deq = dequantize_params(q)
    japply = _japply()
    out_ref = japply(params, *args)
    out_q = japply(deq, *args)
    ref = np.asarray(out_ref)
    rel = np.abs(np.asarray(out_q) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05


def test_apply_quantized_lazy_dequant():
    """apply_quantized runs the model straight off the int8 tree (jitted),
    matching explicit dequantize-then-apply bit for bit."""
    import jax

    from dquartic_tpu.ops.quantization import apply_quantized

    model, params, args = _init()
    q = quantize_params(params, min_size=1024)
    out_explicit = _japply()(dequantize_params(q), *args)
    out_lazy = jax.jit(lambda qp, *a: apply_quantized(model, qp, *a))(q, *args)
    np.testing.assert_allclose(
        np.asarray(out_lazy), np.asarray(out_explicit), rtol=1e-5, atol=1e-5
    )


def test_quantized_checkpoint_roundtrip(tmp_path):
    from dquartic_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    _, params, _ = _init()
    q = quantize_params(params, min_size=1024)
    path = str(tmp_path / "q.ckpt")
    save_checkpoint(path, {"qparams": q})
    loaded = load_checkpoint(path)
    deq_a = dequantize_params(q)
    deq_b = dequantize_params(loaded["qparams"])
    for a, b in zip(jax.tree_util.tree_leaves(deq_a), jax.tree_util.tree_leaves(deq_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stochastic_rounding_unbiased():
    x = jnp.full((1000, 8), 0.25)  # scale = 0.25/127... frac constant
    qs = []
    for i in range(20):
        q, s = stochastic_round_to_int8(x, jax.random.PRNGKey(i))
        qs.append(np.asarray(q, np.float32) * np.asarray(s))
    mean = np.mean(qs)
    assert abs(mean - 0.25) < 0.01


def test_quantized_params_through_sampler():
    """int8-dequantized weights drive the compiled DDIM sampler and stay
    close to the f32 result."""
    import jax
    from dquartic_tpu.core import DDIMProcess, make_schedule
    from dquartic_tpu.infer import DDIMSampler

    model, params, (x, t, ic, ac) = _init()
    process = DDIMProcess(schedule=make_schedule(10, "cosine", "eps"))
    sampler = DDIMSampler(model, process)
    noise = jax.random.normal(jax.random.PRNGKey(0), x.shape)

    out_ref, _ = sampler.sample(params, noise, x, ac, num_steps=3)
    deq = dequantize_params(quantize_params(params, min_size=1024))
    out_q, _ = sampler.sample(deq, noise, x, ac, num_steps=3)

    ref = np.asarray(out_ref)
    dq = np.asarray(out_q)
    rel = np.abs(dq - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1
