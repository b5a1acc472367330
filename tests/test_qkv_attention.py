"""Fused QKV attention kernel vs the XLA einsum path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssl4polyp_tpu.ops.qkv_attention import fused_qkv_attention


def reference(qkv, num_heads):
    B, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    r = qkv.reshape(B, N, 3, num_heads, hd)
    q, k, v = jnp.moveaxis(r, 2, 0)
    q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(scores / jnp.sqrt(hd), axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=qkv.dtype)
    return jnp.swapaxes(out, 1, 2).reshape(B, N, D)


def test_forward_matches_reference():
    B, N, H, hd = 2, 37, 4, 16
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * H * hd), jnp.float32)
    ours = fused_qkv_attention(qkv, H, True)
    ref = reference(qkv, H)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    B, N, H, hd = 1, 21, 2, 8
    qkv = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3 * H * hd), jnp.float32)

    g_ours = jax.grad(lambda t: jnp.sum(jnp.square(fused_qkv_attention(t, H, True))))(qkv)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.square(reference(t, H))))(qkv)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_via_layers_attention():
    from ssl4polyp_tpu.models import layers

    key = jax.random.PRNGKey(2)
    p = {
        "qkv": layers.init_linear(jax.random.fold_in(key, 0), 32, 96),
        "proj": layers.init_linear(jax.random.fold_in(key, 1), 32, 32),
    }
    x = jax.random.normal(jax.random.fold_in(key, 2), (2, 9, 32))
    # interpret-mode comparison is done in the kernel tests; on CPU the
    # pallas path runs compiled via interpret fallback only when asked, so
    # here just check the XLA path remains the default and finite.
    out = layers.attention(x, p, num_heads=4)
    assert out.shape == (2, 9, 32)
    assert bool(jnp.isfinite(out).all())


def test_flattened_stream_matches_3d():
    # attention(seq_len=N) over the flattened (B*N, D) residual stream must
    # equal the 3-D path (used at large batches to keep the stream 2-D).
    from ssl4polyp_tpu.models import layers

    key = jax.random.PRNGKey(4)
    D, H, B, N = 32, 4, 3, 7
    p = {
        "qkv": layers.init_linear(jax.random.fold_in(key, 0), D, 3 * D),
        "proj": layers.init_linear(jax.random.fold_in(key, 1), D, D),
    }
    x = jax.random.normal(jax.random.fold_in(key, 2), (B, N, D))
    ref = layers.attention(x, p, num_heads=H)
    flat = layers.attention(x.reshape(B * N, D), p, num_heads=H, seq_len=N)
    np.testing.assert_allclose(
        np.asarray(flat), np.asarray(ref.reshape(B * N, D)), rtol=1e-5, atol=1e-5
    )


def test_fused_qkv_attention_valid_len_masking():
    """valid_len masks padded keys exactly and zeroes pad-row grads
    (decoder sequence padding, ``models/mae.py::decoder_pad_to``)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.ops.qkv_attention import fused_qkv_attention

    B, N, D, H, valid = 2, 24, 32, 4, 17
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * D), jnp.float32)
    out_pad = fused_qkv_attention(qkv, H, True, True, valid)
    out_ref = fused_qkv_attention(qkv[:, :valid, :], H, True, True, None)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :valid]), np.asarray(out_ref), atol=1e-5
    )
    grad_pad = jax.grad(
        lambda q: (fused_qkv_attention(q, H, True, True, valid)[:, :valid] ** 2).sum()
    )(qkv)
    grad_ref = jax.grad(
        lambda q: (fused_qkv_attention(q, H, True, True, None) ** 2).sum()
    )(qkv[:, :valid, :])
    np.testing.assert_allclose(
        np.asarray(grad_pad[:, :valid]), np.asarray(grad_ref), atol=1e-4
    )
    assert float(np.abs(np.asarray(grad_pad[:, valid:])).max()) == 0.0


def test_mae_decoder_pad_exact():
    """decoder_pad_to is numerically inert: same loss/pred/grads as unpadded."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.models import mae
    from ssl4polyp_tpu.models.vit import ViTConfig

    enc = ViTConfig(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        compute_dtype=jnp.float32, pos_embed="sincos", use_pallas_attention=False,
    )
    cfg = mae.MAEConfig(
        encoder=enc, decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4
    )
    cfg_pad = dataclasses.replace(cfg, decoder_pad_to=24, encoder_pad_to=8)
    params = mae.init_mae(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    key = jax.random.PRNGKey(2)
    loss0, pred0, _ = mae.mae_forward(params, images, key, cfg)
    loss1, pred1, _ = mae.mae_forward(params, images, key, cfg_pad)
    assert abs(float(loss0) - float(loss1)) < 1e-6
    np.testing.assert_allclose(np.asarray(pred0), np.asarray(pred1), atol=1e-5)
    g0 = jax.grad(lambda p: mae.mae_forward(p, images, key, cfg)[0])(params)
    g1 = jax.grad(lambda p: mae.mae_forward(p, images, key, cfg_pad)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_qkvproj_attention_parity():
    """The fully-fused projection+attention kernel matches dot+bias followed
    by the plain fused kernel, for outputs and all three gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.ops.attention_block import fused_qkvproj_attention
    from ssl4polyp_tpu.ops.qkv_attention import fused_qkv_attention

    B, N, Din, D, H = 4, 24, 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, Din), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (Din, 3 * D), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (3 * D,), jnp.float32) * 0.05

    out_new = fused_qkvproj_attention(x, w, b, H, True, True, None)
    out_ref = fused_qkv_attention(jnp.dot(x, w) + b, H, True, True, None)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref), atol=1e-5)

    loss_new = lambda x, w, b: (fused_qkvproj_attention(x, w, b, H, True, True, None) ** 2).sum()
    loss_ref = lambda x, w, b: (fused_qkv_attention(jnp.dot(x, w) + b, H, True, True, None) ** 2).sum()
    grads_new = jax.grad(loss_new, argnums=(0, 1, 2))(x, w, b)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(grads_new, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4, rtol=1e-4)

    # valid_len: padded keys masked, pad rows equal to the truncated call
    vl = 17
    out_pad = fused_qkvproj_attention(x, w, b, H, True, True, vl)
    out_trunc = fused_qkvproj_attention(x[:, :vl], w, b, H, True, True, None)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :vl]), np.asarray(out_trunc), atol=1e-5
    )


def test_fc1_gelu_kernel_parity():
    """ops/mlp.py::fc1_gelu matches dot+bias+erf-GELU for values and all
    three gradients (interpret mode; the A&S erf polynomial is well inside
    bf16 tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.ops.mlp import fc1_gelu

    M, K, NF = 16, 32, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.float32) * 0.5
    w = jax.random.normal(jax.random.PRNGKey(1), (K, NF), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (NF,), jnp.float32) * 0.05

    def ref(x, w, b):
        return jax.nn.gelu(jnp.dot(x, w) + b, approximate=False)

    out = fc1_gelu(x, w, b, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, w, b)),
                               rtol=1e-5, atol=1e-5)

    g_new = jax.grad(lambda *a: (fc1_gelu(*a, True) ** 2).sum(), argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(lambda *a: (ref(*a) ** 2).sum(), argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4)


def test_mlp_fused_kernel_parity():
    """ops/mlp.py::mlp_fused (fc1+GELU+fc2 single kernel) matches the plain
    XLA MLP for values and all five gradients, both single-tile and with the
    NF grid tiled (fp32 accumulator across the sequential minor dim)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.ops.mlp import mlp_fused, mlp_fused_supported

    M, K, NF = 16, 32, 128
    assert mlp_fused_supported(M, K, NF)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (M, K), jnp.float32) * 0.5
    w1 = jax.random.normal(ks[1], (K, NF), jnp.float32) * 0.1
    b1 = jax.random.normal(ks[2], (NF,), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[3], (NF, K), jnp.float32) * 0.1
    b2 = jax.random.normal(ks[4], (K,), jnp.float32) * 0.05

    def ref(x, w1, b1, w2, b2):
        return jnp.dot(jax.nn.gelu(jnp.dot(x, w1) + b1, approximate=False), w2) + b2

    want = ref(x, w1, b1, w2, b2)
    for block in (None, (8, 32)):  # (8, 32): 4 NF tiles → scratch accumulation
        out = mlp_fused(x, w1, b1, w2, b2, True, block)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        g_new = jax.grad(
            lambda *a: (mlp_fused(*a, True, block) ** 2).sum(), argnums=(0, 1, 2, 3, 4)
        )(x, w1, b1, w2, b2)
        g_ref = jax.grad(
            lambda *a: (ref(*a) ** 2).sum(), argnums=(0, 1, 2, 3, 4)
        )(x, w1, b1, w2, b2)
        for a, c in zip(g_new, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-4)


def test_mlp_ln_fused_kernel_parity():
    """ops/mlp.py::mlp_ln_fused (LN+fc1+GELU+fc2 single kernel) matches
    layernorm → plain XLA MLP for values and all seven gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.models.layers import layernorm
    from ssl4polyp_tpu.ops.mlp import mlp_ln_fused

    M, K, NF = 16, 32, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    x = jax.random.normal(ks[0], (M, K), jnp.float32)
    s = 1.0 + 0.1 * jax.random.normal(ks[1], (K,), jnp.float32)
    t = 0.05 * jax.random.normal(ks[2], (K,), jnp.float32)
    w1 = jax.random.normal(ks[3], (K, NF), jnp.float32) * 0.1
    b1 = jax.random.normal(ks[4], (NF,), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[5], (NF, K), jnp.float32) * 0.1
    b2 = jax.random.normal(ks[6], (K,), jnp.float32) * 0.05

    def ref(x, s, t, w1, b1, w2, b2):
        m = layernorm(x, s, t, 1e-6)
        y = jnp.dot(jax.nn.gelu(jnp.dot(m, w1) + b1, approximate=False), w2) + b2
        return x + y  # the kernel folds the block residual in

    want = ref(x, s, t, w1, b1, w2, b2)
    for block in (None, (8, 32)):
        out = mlp_ln_fused(x, s, t, w1, b1, w2, b2, 1e-6, True, block)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        argnums = tuple(range(7))
        g_new = jax.grad(
            lambda *a: (mlp_ln_fused(*a, 1e-6, True, block) ** 2).sum(),
            argnums=argnums,
        )(x, s, t, w1, b1, w2, b2)
        g_ref = jax.grad(
            lambda *a: (ref(*a) ** 2).sum(), argnums=argnums
        )(x, s, t, w1, b1, w2, b2)
        for a, c in zip(g_new, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-4)


def test_ln_linear_kernel_parity():
    """ops/ln_linear.py::ln_linear matches layernorm → dot+bias for values
    and all five gradients (interpret mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.models.layers import layernorm
    from ssl4polyp_tpu.ops.ln_linear import ln_linear, ln_linear_supported

    M, K, N = 16, 32, 96
    assert ln_linear_supported(M, K, N)
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    x = jax.random.normal(ks[0], (M, K), jnp.float32)
    s = 1.0 + 0.1 * jax.random.normal(ks[1], (K,), jnp.float32)
    t = 0.05 * jax.random.normal(ks[2], (K,), jnp.float32)
    w = jax.random.normal(ks[3], (K, N), jnp.float32) * 0.1
    b = jax.random.normal(ks[4], (N,), jnp.float32) * 0.05

    def ref(x, s, t, w, b):
        return jnp.dot(layernorm(x, s, t, 1e-6), w) + b

    for block in (None, 8):  # 8: multi-program row grid
        out = ln_linear(x, s, t, w, b, 1e-6, True, block)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, s, t, w, b)),
                                   rtol=1e-5, atol=1e-5)
        argnums = tuple(range(5))
        g_new = jax.grad(
            lambda *a: (ln_linear(*a, 1e-6, True, block) ** 2).sum(),
            argnums=argnums,
        )(x, s, t, w, b)
        g_ref = jax.grad(lambda *a: (ref(*a) ** 2).sum(), argnums=argnums)(
            x, s, t, w, b)
        for a, c in zip(g_new, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-4)


def test_fused_attention_proj_parity():
    """The attention+output-projection kernel matches the plain fused kernel
    followed by dot+bias, for outputs and all three gradients, with and
    without valid_len padding (BENCH_ATTN_PROJ A/B candidate)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.ops.attn_proj import fused_attention_proj
    from ssl4polyp_tpu.ops.qkv_attention import fused_qkv_attention

    B, N, D, H = 4, 24, 32, 4
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * D), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (D, D), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (D,), jnp.float32) * 0.05

    def ref(qkv, w, b, vl=None):
        out = fused_qkv_attention(qkv, H, True, True, vl)
        return jnp.dot(out, w) + b

    out_new = fused_attention_proj(qkv, w, b, H, True, True, None)
    np.testing.assert_allclose(
        np.asarray(out_new), np.asarray(ref(qkv, w, b)), atol=1e-5
    )

    loss_new = lambda q, w, b: (fused_attention_proj(q, w, b, H, True, True, None) ** 2).sum()
    loss_ref = lambda q, w, b: (ref(q, w, b) ** 2).sum()
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(qkv, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, w, b)
    for a, c in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=2e-4)

    # valid_len: padded keys masked; pad rows match the truncated call after
    # the projection too, and dW/db see zero contributions from pad rows.
    vl = 17
    out_pad = fused_attention_proj(qkv, w, b, H, True, True, vl)
    out_trunc = fused_attention_proj(qkv[:, :vl], w, b, H, True, True, None)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :vl]), np.asarray(out_trunc), atol=1e-5
    )
    mask = jnp.zeros((B, N, D)).at[:, :vl].set(1.0)
    g_pad = jax.grad(
        lambda q, w, b: ((fused_attention_proj(q, w, b, H, True, True, vl) * mask) ** 2).sum(),
        argnums=(1, 2),
    )(qkv, w, b)
    g_trunc = jax.grad(
        lambda q, w, b: (fused_attention_proj(q, w, b, H, True, True, None) ** 2).sum(),
        argnums=(1, 2),
    )(qkv[:, :vl], w, b)
    for a, c in zip(g_pad, g_trunc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=2e-4)


def test_attn_proj_fold_via_layers(monkeypatch):
    """BENCH_ATTN_PROJ=1 routes layers.attention's flattened Pallas path
    through the folded kernel (argument order, p['proj'] extraction, the
    (B·N, D) reshape), matching the plain path's output.  The knob read is
    trace-time (env, not import); the production call hardcodes
    interpret=False, so the test forces interpret via the module hook."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.models import layers
    from ssl4polyp_tpu.ops import attn_proj

    monkeypatch.setenv("BENCH_ATTN_PROJ", "1")
    assert attn_proj.attn_proj_fold_enabled()
    monkeypatch.setattr(attn_proj, "_FORCE_INTERPRET", True)

    B, N, D, H = 2, 16, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(ks[0], (B * N, D), jnp.float32)
    p = {
        "qkv": {
            "kernel": jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.1,
            "bias": jax.random.normal(ks[2], (3 * D,), jnp.float32) * 0.05,
        },
        "proj": {
            "kernel": jax.random.normal(ks[3], (D, D), jnp.float32) * 0.1,
            "bias": jax.random.normal(ks[4], (D,), jnp.float32) * 0.05,
        },
    }
    folded = layers.attention(x, p, H, use_pallas=True, seq_len=N)
    assert folded.shape == (B * N, D)
    plain = layers.attention(x, p, H, use_pallas=False, seq_len=N)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)

    monkeypatch.setenv("BENCH_ATTN_PROJ", "0")
    assert not attn_proj.attn_proj_fold_enabled()


def test_attn_proj_bf16_and_compute_softmax():
    """softmax_f32=False and bf16 operands: the folded kernel stays within
    bf16 resolution of the unfused reference (these configs previously had
    only hand-verified parity, PERF_NOTES round 4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.ops.attn_proj import fused_attention_proj
    from ssl4polyp_tpu.ops.qkv_attention import fused_qkv_attention

    B, N, D, H = 4, 24, 32, 4
    qkv32 = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * D), jnp.float32)
    w32 = jax.random.normal(jax.random.PRNGKey(1), (D, D), jnp.float32) * 0.1
    b32 = jax.random.normal(jax.random.PRNGKey(2), (D,), jnp.float32) * 0.05

    def ref(qkv, w, b, f32):
        out = fused_qkv_attention(qkv, H, True, f32, None)
        return jnp.dot(out, w) + b

    # fp32 operands, compute-dtype (fp32 storage anyway) softmax
    out = fused_attention_proj(qkv32, w32, b32, H, True, False, None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref(qkv32, w32, b32, False)), atol=1e-5
    )
    g_new = jax.grad(
        lambda q, w, b: (fused_attention_proj(q, w, b, H, True, False, None) ** 2).sum(),
        argnums=(0, 1, 2),
    )(qkv32, w32, b32)
    g_ref = jax.grad(
        lambda q, w, b: (ref(q, w, b, False) ** 2).sum(), argnums=(0, 1, 2)
    )(qkv32, w32, b32)
    for a, c in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=2e-4)

    # bf16 operands, bf16 softmax (the MAE pretraining configuration)
    qkv16, w16, b16 = (t.astype(jnp.bfloat16) for t in (qkv32, w32, b32))
    out16 = fused_attention_proj(qkv16, w16, b16, H, True, False, None)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32),
        np.asarray(ref(qkv16, w16, b16, False), np.float32),
        atol=5e-2,
    )
    g16 = jax.grad(
        lambda q, w, b: (
            fused_attention_proj(q, w, b, H, True, False, None).astype(jnp.float32) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(qkv16, w16, b16)
    gr16 = jax.grad(
        lambda q, w, b: (ref(q, w, b, False).astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1, 2),
    )(qkv16, w16, b16)
    for a, c in zip(g16, gr16):
        assert a.dtype == c.dtype  # cotangent dtypes follow the operands
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(c, np.float32),
                                   rtol=0.1, atol=0.2)


def test_gelu_polynomial_accuracy():
    """The clip-tailed Chebyshev erf in ops/mlp.py stays within its stated
    error bounds over the whole real line (incl. far past the fit domain):
    max |gelu err| ≤ 2.5e-6, max |dgelu err| ≤ 5e-7 in fp64-referenced fp32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.ops.mlp import _SQRT_HALF, _erf_sqrt_half

    h64 = np.concatenate([
        np.linspace(-40.0, 40.0, 200_001),
        np.linspace(-6.0, 6.0, 200_001),
    ])
    h = jnp.asarray(h64, jnp.float32)
    erf_poly = np.asarray(_erf_sqrt_half(h), np.float64)

    from scipy.special import erf as erf64
    erf_true = erf64(h64 * float(_SQRT_HALF))

    gelu_err = 0.5 * np.abs(h64) * np.abs(erf_poly - erf_true)
    assert gelu_err.max() < 2.5e-6, gelu_err.max()

    # dgelu = Phi(h) + h·phi(h); only Phi uses the polynomial.
    dgelu_err = 0.5 * np.abs(erf_poly - erf_true)
    assert dgelu_err.max() < 5e-7, dgelu_err.max()

    # Tail behaviour: saturates exactly at ±1 (clip), never overshoots.
    assert np.all(np.abs(erf_poly) <= 1.0)
    assert erf_poly[0] == -1.0 and erf_poly[200_000] == 1.0
