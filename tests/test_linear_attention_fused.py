"""Fused Pallas linear-attention kernel vs the jnp reference and vs the
flax LinearAttention module (values + gradients, interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dquartic_tpu.models.attention import LinearAttention
from dquartic_tpu.ops.linear_attention import (
    fused_linear_attention,
    linear_attention_reference,
)


def make_weights(C=8, heads=4, dim_head=32, seed=0):
    rng = np.random.default_rng(seed)
    H = heads * dim_head
    w_qkv = jnp.asarray(rng.normal(size=(C, 3 * H)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b_out = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    return w_qkv, w_out, b_out, g


@pytest.mark.parametrize("N", [64, 512, 700, 1025])
def test_fused_matches_reference(N):
    C, heads, dim_head = 8, 4, 32
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, N, C)).astype(np.float32))
    out_ref = linear_attention_reference(x, w_qkv, w_out, b_out, g, heads, dim_head)
    out = fused_linear_attention(x, w_qkv, w_out, b_out, g, heads, dim_head)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-4, atol=2e-5)


def test_reference_matches_module():
    """The jnp reference (= the fused kernel's oracle and backward) must
    equal the flax module with the same weights."""
    C, heads, dim_head = 8, 4, 32
    H = heads * dim_head
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head)
    m = LinearAttention(dim=C, heads=heads, dim_head=dim_head)
    params = {
        "params": {
            "to_qkv": {"kernel": w_qkv[None]},
            "to_out_conv": {"kernel": w_out[None], "bias": b_out},
            "to_out_norm": {"g": g},
        }
    }
    x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 100, C)).astype(np.float32))
    out_mod = m.apply(params, x)
    out_ref = linear_attention_reference(x, w_qkv, w_out, b_out, g, heads, dim_head)
    np.testing.assert_allclose(np.asarray(out_mod), np.asarray(out_ref), rtol=2e-4, atol=2e-5)


def test_fused_gradients():
    C, heads, dim_head = 4, 2, 16
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head, seed=3)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 96, C)).astype(np.float32))

    def loss_fused(x, wq, wo, bo, gg):
        return jnp.sum(fused_linear_attention(x, wq, wo, bo, gg, heads, dim_head) ** 2)

    def loss_ref(x, wq, wo, bo, gg):
        return jnp.sum(
            linear_attention_reference(x, wq, wo, bo, gg, heads, dim_head) ** 2
        )

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_out, b_out, g)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_out, b_out, g)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fused_bf16():
    C, heads, dim_head = 8, 4, 32
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 300, C)).astype(np.float32))
    out32 = fused_linear_attention(x, w_qkv, w_out, b_out, g, heads, dim_head)
    out16 = fused_linear_attention(
        x.astype(jnp.bfloat16), w_qkv, w_out, b_out, g, heads, dim_head
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), rtol=5e-2, atol=5e-2
    )


@pytest.mark.parametrize("N", [64, 512, 700, 1025])
@pytest.mark.parametrize("C", [4, 8, 16])
def test_transposed_matches_reference(N, C):
    """The lane-dense transposed kernel (the in-model TPU default) against
    the jnp oracle, across the channel counts the canonical net uses."""
    from dquartic_tpu.ops.linear_attention import fused_linear_attention_t

    heads, dim_head = 4, 32
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, N, C)).astype(np.float32))
    out_ref = linear_attention_reference(x, w_qkv, w_out, b_out, g, heads, dim_head)
    out = fused_linear_attention_t(x, w_qkv, w_out, b_out, g, heads, dim_head)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-4, atol=5e-5)


def test_transposed_gradients():
    from dquartic_tpu.ops.linear_attention import fused_linear_attention_t

    C, heads, dim_head = 4, 2, 16
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head, seed=7)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(1, 96, C)).astype(np.float32))

    def loss_t(x, wq, wo, bo, gg):
        return jnp.sum(fused_linear_attention_t(x, wq, wo, bo, gg, heads, dim_head) ** 2)

    def loss_ref(x, wq, wo, bo, gg):
        return jnp.sum(
            linear_attention_reference(x, wq, wo, bo, gg, heads, dim_head) ** 2
        )

    gt = jax.grad(loss_t, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_out, b_out, g)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_out, b_out, g)
    for a, b in zip(gt, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_transposed_bf16():
    from dquartic_tpu.ops.linear_attention import fused_linear_attention_t

    C, heads, dim_head = 8, 4, 32
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head)
    x = jnp.asarray(np.random.default_rng(10).normal(size=(1, 300, C)).astype(np.float32))
    out32 = fused_linear_attention_t(x, w_qkv, w_out, b_out, g, heads, dim_head)
    out16 = fused_linear_attention_t(
        x.astype(jnp.bfloat16), w_qkv, w_out, b_out, g, heads, dim_head
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), rtol=5e-2, atol=5e-2
    )


def test_module_pallas_t_impl_matches_xla(monkeypatch):
    """LinearAttention(impl='pallas_t') (interpret mode off-TPU) equals the
    module's XLA path with identical params."""
    monkeypatch.setenv("DQUARTIC_LINATTN_MIN_SEQ", "1")  # don't fall back at short N
    C, heads, dim_head = 8, 4, 32
    x = jnp.asarray(np.random.default_rng(11).normal(size=(2, 256, C)).astype(np.float32))
    m_x = LinearAttention(dim=C, heads=heads, dim_head=dim_head, impl="xla")
    params = m_x.init(jax.random.PRNGKey(0), x)
    m_p = LinearAttention(dim=C, heads=heads, dim_head=dim_head, impl="pallas_t")
    out_x = m_x.apply(params, x)
    out_p = m_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=5e-5)


@pytest.mark.parametrize("N", [512, 700])
@pytest.mark.parametrize("C", [4, 16])
def test_fused_prenorm_residual_forward(N, C):
    """The prenorm+residual-fused kernel == x + attn(RMSNorm(x)) oracle."""
    from dquartic_tpu.ops.linear_attention import (
        fused_linear_attention_t,
        linear_attention_nr_reference,
    )

    heads, dim_head = 4, 32
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head)
    g_pre = jnp.asarray(np.random.default_rng(7).normal(size=(C,)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(8).normal(size=(2, N, C)).astype(np.float32))
    out_ref = linear_attention_nr_reference(
        x, w_qkv, w_out, b_out, g, g_pre, heads, dim_head
    )
    out = fused_linear_attention_t(
        x, w_qkv, w_out, b_out, g, heads, dim_head, g_pre=g_pre, residual=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("N,C,block_n", [(1100, 4, 512), (2048, 16, 512), (1500, 8, 1024)])
def test_pipelined_kernel_exact_vs_plain(N, C, block_n):
    """The 2-stage software pipeline (stash k/q pre-activations, drain one
    block behind) computes the same dots in the same order as the plain
    static-shift kernel — outputs must agree EXACTLY, and both must match
    the XLA oracle. Covers padded tails (N % block_n != 0) and the
    phase-1 out-map shift."""
    from dquartic_tpu.ops.linear_attention import (
        _fused_forward_single_t,
        linear_attention_nr_reference,
    )

    heads, dim_head = 4, 32
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head, seed=21)
    g_pre = jnp.asarray(np.random.default_rng(22).normal(size=(C,)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(23).normal(size=(2, N, C)).astype(np.float32))
    y_plain = _fused_forward_single_t(
        x, w_qkv, w_out, b_out, g, heads, dim_head, block_n, None,
        g_pre=g_pre, residual=True, pipeline=False,
    )
    y_pipe = _fused_forward_single_t(
        x, w_qkv, w_out, b_out, g, heads, dim_head, block_n, None,
        g_pre=g_pre, residual=True, pipeline=True,
    )
    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_pipe))
    out_ref = linear_attention_nr_reference(
        x, w_qkv, w_out, b_out, g, g_pre, heads, dim_head
    )
    np.testing.assert_allclose(
        np.asarray(y_pipe), np.asarray(out_ref), rtol=3e-4, atol=3e-5
    )


@pytest.mark.parametrize("N", [256, 700])
def test_fused_prenorm_residual_gradients(N, monkeypatch):
    """Kernel backward of the prenorm+residual variant vs jax.vjp of the
    composed XLA oracle — all six gradients, incl. dg_pre and the
    residual path through dx."""
    from dquartic_tpu.ops.linear_attention import (
        fused_linear_attention_t,
        linear_attention_nr_reference,
    )

    C, heads, dim_head = 8, 2, 16
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head, seed=9)
    g_pre = jnp.asarray(
        np.random.default_rng(10).normal(size=(C,)).astype(np.float32)
    )
    x = jnp.asarray(np.random.default_rng(11).normal(size=(2, N, C)).astype(np.float32))

    def loss_fused(x, wq, wo, bo, gg, gp):
        return jnp.sum(
            fused_linear_attention_t(
                x, wq, wo, bo, gg, heads, dim_head, g_pre=gp, residual=True
            ) ** 2
        )

    def loss_ref(x, wq, wo, bo, gg, gp):
        return jnp.sum(
            linear_attention_nr_reference(x, wq, wo, bo, gg, gp, heads, dim_head) ** 2
        )

    monkeypatch.setenv("DQUARTIC_LINATTN_BWD", "kernel")
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, w_qkv, w_out, b_out, g, g_pre
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, w_qkv, w_out, b_out, g, g_pre
    )
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_fused_prenorm_residual_bf16_padded_tail():
    from dquartic_tpu.ops.linear_attention import (
        fused_linear_attention_t,
        linear_attention_nr_reference,
    )

    C, heads, dim_head = 8, 4, 32
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head)
    g_pre = jnp.asarray(np.random.default_rng(12).normal(size=(C,)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(13).normal(size=(1, 777, C)).astype(np.float32))
    out_ref = linear_attention_nr_reference(
        x, w_qkv, w_out, b_out, g, g_pre, heads, dim_head
    )
    out16 = fused_linear_attention_t(
        x.astype(jnp.bfloat16), w_qkv, w_out, b_out, g, heads, dim_head,
        g_pre=g_pre, residual=True,
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out_ref), rtol=5e-2, atol=5e-2
    )


def test_explicit_impl_ignores_min_seq_floor(monkeypatch):
    """An explicit module-level impl= must engage the kernel even below
    the auto-dispatch min_seq floor (advisor round 2: the floor previously
    silently overrode impl='pallas_t' at short N)."""
    import dquartic_tpu.ops.linear_attention as la

    called = {}
    real = la.fused_linear_attention_t

    def spy(*args, **kwargs):
        called["t"] = True
        return real(*args, **kwargs)

    monkeypatch.setattr(la, "fused_linear_attention_t", spy)
    monkeypatch.delenv("DQUARTIC_LINATTN_MIN_SEQ", raising=False)
    C, heads, dim_head = 8, 2, 16
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 128, C)).astype(np.float32))
    m = LinearAttention(dim=C, heads=heads, dim_head=dim_head, impl="pallas_t")
    params = m.init(jax.random.PRNGKey(0), x)
    m.apply(params, x)  # N=128 < 2048 default floor
    assert called.get("t"), "explicit impl='pallas_t' fell back to XLA"

    # auto dispatch below the floor must still resolve to XLA
    called.clear()
    m_auto = LinearAttention(dim=C, heads=heads, dim_head=dim_head, impl="auto")
    m_auto.apply(params, x)
    assert "t" not in called or jax.default_backend() == "tpu"


def _bwd_truth_f64(x, w_qkv, w_out, b_out, g, dy, heads, dh):
    """Float64 numpy oracle for the linear-attention backward (validated
    against a float64 jax.vjp to 1e-14; the *f32* XLA vjp deviates from
    this truth by up to ~5e-3 — near-cancelling softmax terms — so tests
    anchor on this instead)."""
    B, N, C = x.shape
    H = heads * dh
    w64 = w_qkv.astype(np.float64)
    wq, wk, wv = w64[:, :H].T, w64[:, H : 2 * H].T, w64[:, 2 * H :].T
    wo = w_out.astype(np.float64)
    mask = (np.arange(H)[:, None] // dh == np.arange(H)[None] // dh).astype(np.float64)
    s = dh**-0.5
    dx = np.zeros((B, C, N))
    dwq = np.zeros((C, H)); dwk = np.zeros((C, H)); dwv = np.zeros((C, H))
    dwo = np.zeros((H, C)); db = np.zeros(C); dg = np.zeros(C)
    for bi in range(B):
        xt = x[bi].astype(np.float64).T
        dyt = dy[bi].astype(np.float64).T
        q = wq @ xt; k = wk @ xt; v = wv @ xt
        p = np.zeros_like(q)
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            e = np.exp(q[sl] - q[sl].max(0, keepdims=True))
            p[sl] = e / e.sum(0, keepdims=True)
        qn = p * s
        kn = np.exp(k - k.max(1, keepdims=True)); kn = kn / kn.sum(1, keepdims=True)
        ctx = (kn @ v.T) * mask
        o = ctx.T @ qn
        u = wo.T @ o + b_out.astype(np.float64)[:, None]
        r = np.maximum(np.sqrt((u**2).sum(0, keepdims=True)), 1e-12)
        yh = u / r
        dyh = dyt * (g.astype(np.float64)[:, None] * C**0.5)
        dg += (dyt * yh).sum(1) * C**0.5
        du = (dyh - yh * (dyh * yh).sum(0, keepdims=True)) / r
        db += du.sum(1)
        dwo += o @ du.T
        do = wo @ du
        dctx = (qn @ do.T) * mask
        dqs = (ctx @ do) * s
        dq = np.zeros_like(q)
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            th = (dqs[sl] * p[sl]).sum(0, keepdims=True)
            dq[sl] = p[sl] * (dqs[sl] - th)
        dwq += xt @ dq.T
        dkn = dctx @ v; dv = dctx.T @ kn
        T = (kn * dkn).sum(1, keepdims=True)
        dk = kn * dkn - kn * T
        dwk += xt @ dk.T; dwv += xt @ dv.T
        dx[bi] = wq.T @ dq + wk.T @ dk + wv.T @ dv
    return (
        np.swapaxes(dx, 1, 2),
        np.concatenate([dwq, dwk, dwv], -1),
        dwo,
        db,
        dg,
    )


@pytest.mark.parametrize("B,N,C,heads,dh", [(2, 96, 4, 2, 16), (1, 700, 8, 4, 32), (2, 513, 16, 4, 32)])
def test_backward_kernel_matches_f64_truth(B, N, C, heads, dh):
    """The streamed Pallas backward against the float64 oracle. The f32
    computation carries ~5e-3 intrinsic gradient noise (so does the f32
    XLA vjp — measured identically), hence the 1e-2 tolerance."""
    from dquartic_tpu.ops.linear_attention import _fused_backward_t

    H = heads * dh
    rng = np.random.default_rng(42)
    x = rng.normal(size=(B, N, C))
    w_qkv = rng.normal(size=(C, 3 * H)) * 0.1
    w_out = rng.normal(size=(H, C)) * 0.1
    b_out = rng.normal(size=(C,)) * 0.1
    g = rng.normal(size=(C,))
    dy = rng.normal(size=(B, N, C))

    truth = _bwd_truth_f64(x, w_qkv, w_out, b_out, g, dy, heads, dh)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    got = _fused_backward_t(
        f32(x), f32(w_qkv), f32(w_out), f32(b_out), f32(g), f32(dy), heads, dh, 512
    )
    for name, a, b in zip(["dx", "dw_qkv", "dw_out", "db", "dg"], got, truth):
        scale = np.max(np.abs(b)) + 1e-9
        err = np.max(np.abs(np.asarray(a, np.float64) - b)) / scale
        assert err < 1e-2, f"{name}: relerr {err:.2e}"


def test_backward_kernel_through_grad():
    """jax.grad through the public fused op (kernel fwd + kernel bwd) vs
    grad through the XLA reference — both f32, 1e-2 band."""
    from dquartic_tpu.ops.linear_attention import fused_linear_attention_t

    C, heads, dh = 4, 2, 16
    w_qkv, w_out, b_out, g = make_weights(C, heads, dh, seed=3)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 600, C)).astype(np.float32))

    def loss_k(x, wq, wo, bo, gg):
        return jnp.sum(fused_linear_attention_t(x, wq, wo, bo, gg, heads, dh) ** 2)

    def loss_r(x, wq, wo, bo, gg):
        return jnp.sum(linear_attention_reference(x, wq, wo, bo, gg, heads, dh) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_out, b_out, g)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_out, b_out, g)
    for a, b in zip(gk, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-2, f"relerr {err:.2e}"


def test_backward_kernel_bf16_close_to_f32():
    """bf16 kernel grads track the f32 kernel grads (the training config
    computes in bf16; grads should agree to bf16 resolution)."""
    from dquartic_tpu.ops.linear_attention import _fused_backward_t

    B, N, C, heads, dh = 2, 300, 8, 4, 32
    H = heads * dh
    rng = np.random.default_rng(7)
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    w_qkv = (rng.normal(size=(C, 3 * H)) * 0.1).astype(np.float32)
    w_out = (rng.normal(size=(H, C)) * 0.1).astype(np.float32)
    b_out = (rng.normal(size=(C,)) * 0.1).astype(np.float32)
    g = rng.normal(size=(C,)).astype(np.float32)
    dy = rng.normal(size=(B, N, C)).astype(np.float32)

    a32 = [jnp.asarray(t) for t in (x, w_qkv, w_out, b_out, g)]
    g32 = _fused_backward_t(*a32, jnp.asarray(dy), heads, dh, 512)
    g16 = _fused_backward_t(
        jnp.asarray(x, jnp.bfloat16), *a32[1:], jnp.asarray(dy, jnp.bfloat16),
        heads, dh, 512,
    )
    assert g16[0].dtype == jnp.bfloat16  # dx in the compute dtype
    for a, b in zip(g16, g32):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        err = float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)))) / scale
        assert err < 5e-2, f"relerr {err:.2e}"


def test_backward_kernel_padded_tail():
    """N that doesn't divide block_n: the padded columns must contribute
    exactly nothing to any gradient (compare against the same inputs
    zero-extended to a block multiple)."""
    from dquartic_tpu.ops.linear_attention import _fused_backward_t

    B, N, C, heads, dh = 1, 130, 4, 2, 16
    H = heads * dh
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    w_qkv = jnp.asarray((rng.normal(size=(C, 3 * H)) * 0.1).astype(np.float32))
    w_out = jnp.asarray((rng.normal(size=(H, C)) * 0.1).astype(np.float32))
    b_out = jnp.asarray((rng.normal(size=(C,)) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    got = _fused_backward_t(x, w_qkv, w_out, b_out, g, dy, heads, dh, 128)
    truth = _bwd_truth_f64(
        np.asarray(x), np.asarray(w_qkv), np.asarray(w_out),
        np.asarray(b_out), np.asarray(g), np.asarray(dy), heads, dh,
    )
    for name, a, b in zip(["dx", "dw_qkv", "dw_out", "db", "dg"], got, truth):
        scale = np.max(np.abs(b)) + 1e-9
        err = np.max(np.abs(np.asarray(a, np.float64) - b)) / scale
        assert err < 1e-2, f"{name}: relerr {err:.2e}"


@pytest.mark.parametrize("N", [64, 700, 1025])
def test_single_call_matches_two_call(N):
    from dquartic_tpu.ops.linear_attention import (
        _fused_forward,
        _fused_forward_single,
    )

    C, heads, dim_head = 8, 4, 32
    w_qkv, w_out, b_out, g = make_weights(C, heads, dim_head)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(3, N, C)).astype(np.float32))
    two = _fused_forward(x, w_qkv, w_out, b_out, g, heads, dim_head, 512, None)
    one = _fused_forward_single(x, w_qkv, w_out, b_out, g, heads, dim_head, 512, None)
    np.testing.assert_allclose(np.asarray(one), np.asarray(two), rtol=1e-5, atol=1e-6)
    ref = linear_attention_reference(x, w_qkv, w_out, b_out, g, heads, dim_head)
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref), rtol=2e-4, atol=2e-5)
