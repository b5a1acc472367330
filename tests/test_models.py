"""Model core tests: shapes, masking stats, patchify roundtrip, imports."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4polyp_tpu.models import (
    MAEConfig,
    ViTConfig,
    init_mae,
    init_vit,
    mae_forward,
    patchify,
    unpatchify,
    vit_forward,
)
from ssl4polyp_tpu.models import mae as mae_mod
from ssl4polyp_tpu.models.pos_embed import sincos_2d

TINY = ViTConfig(
    img_size=32,
    patch_size=8,
    embed_dim=64,
    depth=2,
    num_heads=4,
    num_classes=2,
    compute_dtype=jnp.float32,
)


def test_vit_forward_shape(rng_key):
    params = init_vit(rng_key, TINY)
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    logits = vit_forward(params, images, TINY)
    assert logits.shape == (3, 2)
    assert jnp.isfinite(logits).all()


def test_vit_deterministic(rng_key):
    params = init_vit(rng_key, TINY)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    a = vit_forward(params, images, TINY)
    b = vit_forward(params, images, TINY)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_pooling(rng_key):
    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=64, depth=1, num_heads=4,
        num_classes=None, out_token="spatial", compute_dtype=jnp.float32,
    )
    params = init_vit(rng_key, cfg)
    feats = vit_forward(params, jnp.ones((2, 32, 32, 3)), cfg)
    assert feats.shape == (2, 64)


def test_patchify_roundtrip():
    images = jnp.arange(2 * 32 * 32 * 3, dtype=jnp.float32).reshape(2, 32, 32, 3)
    patches = patchify(images, 8)
    assert patches.shape == (2, 16, 192)
    restored = unpatchify(patches, 8)
    np.testing.assert_array_equal(np.asarray(restored), np.asarray(images))


def test_random_masking_statistics(rng_key):
    x = jnp.arange(4 * 16 * 8, dtype=jnp.float32).reshape(4, 16, 8)
    result = mae_mod.random_masking(x, rng_key, len_keep=4)
    assert result.kept.shape == (4, 4, 8)
    # mask: exactly L - len_keep ones per sample
    np.testing.assert_array_equal(np.asarray(result.mask.sum(axis=1)), np.full(4, 12.0))
    # restore permutation is a bijection
    for row in np.asarray(result.ids_restore):
        assert sorted(row.tolist()) == list(range(16))


def test_masking_restore_consistency(rng_key):
    """Kept tokens placed back via ids_restore land on unmasked positions."""
    B, L, D, keep = 2, 16, 4, 6
    x = jax.random.normal(rng_key, (B, L, D))
    res = mae_mod.random_masking(x, jax.random.PRNGKey(7), len_keep=keep)
    filled = jnp.concatenate(
        [res.kept, jnp.zeros((B, L - keep, D))], axis=1
    )
    restored = jnp.take_along_axis(filled, res.ids_restore[:, :, None], axis=1)
    mask = np.asarray(res.mask)
    orig = np.asarray(x)
    rest = np.asarray(restored)
    for b in range(B):
        kept_positions = np.where(mask[b] == 0)[0]
        np.testing.assert_allclose(rest[b, kept_positions], orig[b, kept_positions], rtol=1e-6)


MAE_TINY = MAEConfig(
    encoder=ViTConfig(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        compute_dtype=jnp.float32,
    ),
    decoder_embed_dim=32,
    decoder_depth=1,
    decoder_num_heads=4,
    mask_ratio=0.75,
)


def test_mae_forward(rng_key):
    params = init_mae(rng_key, MAE_TINY)
    images = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    loss, pred, mask = mae_forward(params, images, jax.random.PRNGKey(3), MAE_TINY)
    assert loss.shape == ()
    assert jnp.isfinite(loss)
    assert pred.shape == (2, 16, 192)
    assert mask.shape == (2, 16)
    # 75% of 16 patches masked
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), np.full(2, 12.0))


def test_mae_loss_on_masked_only(rng_key):
    """Perfect reconstruction on masked patches → zero loss regardless of kept."""
    images = jax.random.normal(rng_key, (1, 32, 32, 3))
    target = patchify(images, 8)
    mask = jnp.zeros((1, 16)).at[:, :12].set(1.0)
    loss = mae_mod.mae_loss(images, target, mask, MAE_TINY)
    assert float(loss) < 1e-10
    # corrupt an unmasked patch — loss unchanged
    corrupted = target.at[:, 14].add(100.0)
    loss2 = mae_mod.mae_loss(images, corrupted, mask, MAE_TINY)
    assert float(loss2) < 1e-10
    # corrupt a masked patch — loss grows
    corrupted = target.at[:, 0].add(1.0)
    loss3 = mae_mod.mae_loss(images, corrupted, mask, MAE_TINY)
    assert float(loss3) > 1e-3


def test_sincos_matches_reference_formula():
    """Independent recomputation of the reference's sincos construction."""
    dim, gs = 16, 3
    table = sincos_2d(dim, gs, cls_token=True)
    assert table.shape == (gs * gs + 1, dim)
    np.testing.assert_array_equal(table[0], np.zeros(dim))
    half = dim // 2
    omega = 1.0 / 10000.0 ** (np.arange(half // 2) / (half / 2.0))
    # token at grid position (row=1, col=2) → flat index 1 + 1*3 + 2
    row, col = 1, 2
    tok = table[1 + row * gs + col]
    np.testing.assert_allclose(tok[:half // 2], np.sin(col * omega), rtol=1e-6)
    np.testing.assert_allclose(tok[half // 2:half], np.cos(col * omega), rtol=1e-6)
    np.testing.assert_allclose(tok[half:half + half // 2], np.sin(row * omega), rtol=1e-6)


def test_torch_import_mapping(tmp_path):
    """A synthetic torch MAE state dict maps onto the pytree with right shapes."""
    torch = pytest.importorskip("torch")
    D, depth, P, C = 64, 2, 8, 3
    grid = 4
    state = {
        "cls_token": torch.randn(1, 1, D),
        "pos_embed": torch.randn(1, grid * grid + 1, D),
        "patch_embed.proj.weight": torch.randn(D, C, P, P),
        "patch_embed.proj.bias": torch.randn(D),
        "norm.weight": torch.ones(D),
        "norm.bias": torch.zeros(D),
    }
    for i in range(depth):
        state.update({
            f"blocks.{i}.norm1.weight": torch.ones(D),
            f"blocks.{i}.norm1.bias": torch.zeros(D),
            f"blocks.{i}.attn.qkv.weight": torch.randn(3 * D, D),
            f"blocks.{i}.attn.qkv.bias": torch.randn(3 * D),
            f"blocks.{i}.attn.proj.weight": torch.randn(D, D),
            f"blocks.{i}.attn.proj.bias": torch.randn(D),
            f"blocks.{i}.norm2.weight": torch.ones(D),
            f"blocks.{i}.norm2.bias": torch.zeros(D),
            f"blocks.{i}.mlp.fc1.weight": torch.randn(4 * D, D),
            f"blocks.{i}.mlp.fc1.bias": torch.randn(4 * D),
            f"blocks.{i}.mlp.fc2.weight": torch.randn(D, 4 * D),
            f"blocks.{i}.mlp.fc2.bias": torch.randn(D),
        })
    ckpt = tmp_path / "mae.pth"
    torch.save({"model": state}, ckpt)

    from ssl4polyp_tpu.models.import_torch import load_torch_state_dict, mae_params_from_torch

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=D, depth=depth, num_heads=4)
    np_state = load_torch_state_dict(ckpt)
    params = mae_params_from_torch(np_state, cfg)
    assert params["blocks"]["attn"]["qkv"]["kernel"].shape == (depth, D, 3 * D)
    assert params["patch_embed"]["kernel"].shape == (P * P * C, D)
    # linear transpose convention: kernel == torch weight .T
    np.testing.assert_allclose(
        params["blocks"]["mlp"]["fc1"]["kernel"][0],
        state["blocks.0.mlp.fc1.weight"].numpy().T,
    )
    # patch-embed row ordering: row (p*P+q)*C + c == conv weight [:, c, p, q]
    p_, q_, c_ = 2, 5, 1
    np.testing.assert_allclose(
        params["patch_embed"]["kernel"][(p_ * P + q_) * C + c_],
        state["patch_embed.proj.weight"][:, c_, p_, q_].numpy(),
    )


def test_torch_import_forward_equivalence(tmp_path):
    """Patch-embed through imported conv weights == torch conv output."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    D, P, C = 16, 8, 3
    weight = torch.randn(D, C, P, P)
    bias = torch.randn(D)
    img_t = torch.randn(1, C, 32, 32)
    conv = F.conv2d(img_t, weight, bias, stride=P)  # (1, D, 4, 4)
    expected = conv.permute(0, 2, 3, 1).reshape(1, 16, D).numpy()

    from ssl4polyp_tpu.models.import_torch import _patch_embed
    from ssl4polyp_tpu.models.vit import embed_patches

    state = {"patch_embed.proj.weight": weight.numpy(), "patch_embed.proj.bias": bias.numpy()}
    pe = _patch_embed(state)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=D, compute_dtype=jnp.float32)
    params = {"patch_embed": {k: jnp.asarray(v) for k, v in pe.items()}}
    images = jnp.asarray(img_t.permute(0, 2, 3, 1).numpy())
    got = embed_patches(params, images, cfg)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_torch_full_forward_parity(tmp_path):
    """Accuracy-parity evidence: the imported encoder reproduces a torch
    reference ViT forward end to end (patchify → pos → blocks → norm →
    pooling → head), within float32 tolerance.

    The torch forward below mirrors the timm/MAE ``VisionTransformer``
    semantics the reference fine-tunes (``models.py:68-141``): pre-LN blocks,
    exact (erf) GELU, fp32 softmax at scale head_dim**-0.5.
    """
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    torch.manual_seed(7)
    D, depth, heads, P, C, img = 64, 3, 4, 8, 3, 32
    grid = img // P
    N = grid * grid
    head_dim = D // heads
    num_classes = 2

    state = {
        "cls_token": torch.randn(1, 1, D) * 0.02,
        "pos_embed": torch.randn(1, N + 1, D) * 0.02,
        "patch_embed.proj.weight": torch.randn(D, C, P, P) * 0.05,
        "patch_embed.proj.bias": torch.randn(D) * 0.02,
        "norm.weight": torch.rand(D) + 0.5,
        "norm.bias": torch.randn(D) * 0.02,
    }
    for i in range(depth):
        state.update({
            f"blocks.{i}.norm1.weight": torch.rand(D) + 0.5,
            f"blocks.{i}.norm1.bias": torch.randn(D) * 0.02,
            f"blocks.{i}.attn.qkv.weight": torch.randn(3 * D, D) * 0.05,
            f"blocks.{i}.attn.qkv.bias": torch.randn(3 * D) * 0.02,
            f"blocks.{i}.attn.proj.weight": torch.randn(D, D) * 0.05,
            f"blocks.{i}.attn.proj.bias": torch.randn(D) * 0.02,
            f"blocks.{i}.norm2.weight": torch.rand(D) + 0.5,
            f"blocks.{i}.norm2.bias": torch.randn(D) * 0.02,
            f"blocks.{i}.mlp.fc1.weight": torch.randn(4 * D, D) * 0.05,
            f"blocks.{i}.mlp.fc1.bias": torch.randn(4 * D) * 0.02,
            f"blocks.{i}.mlp.fc2.weight": torch.randn(D, 4 * D) * 0.05,
            f"blocks.{i}.mlp.fc2.bias": torch.randn(D) * 0.02,
        })
    head_w = torch.randn(num_classes, D) * 0.05
    head_b = torch.randn(num_classes) * 0.02

    def torch_forward(x):  # x: (B, C, H, W)
        B = x.shape[0]
        h = F.conv2d(x, state["patch_embed.proj.weight"],
                     state["patch_embed.proj.bias"], stride=P)
        h = h.flatten(2).transpose(1, 2)  # (B, N, D)
        cls = state["cls_token"].expand(B, -1, -1)
        h = torch.cat([cls, h], dim=1) + state["pos_embed"]
        for i in range(depth):
            y = F.layer_norm(h, (D,), state[f"blocks.{i}.norm1.weight"],
                             state[f"blocks.{i}.norm1.bias"], eps=1e-6)
            qkv = F.linear(y, state[f"blocks.{i}.attn.qkv.weight"],
                           state[f"blocks.{i}.attn.qkv.bias"])
            qkv = qkv.reshape(B, N + 1, 3, heads, head_dim).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * head_dim ** -0.5
            y = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N + 1, D)
            y = F.linear(y, state[f"blocks.{i}.attn.proj.weight"],
                         state[f"blocks.{i}.attn.proj.bias"])
            h = h + y
            y = F.layer_norm(h, (D,), state[f"blocks.{i}.norm2.weight"],
                             state[f"blocks.{i}.norm2.bias"], eps=1e-6)
            y = F.linear(y, state[f"blocks.{i}.mlp.fc1.weight"],
                         state[f"blocks.{i}.mlp.fc1.bias"])
            y = F.gelu(y)  # exact erf GELU, matching layers.mlp approximate=False
            y = F.linear(y, state[f"blocks.{i}.mlp.fc2.weight"],
                         state[f"blocks.{i}.mlp.fc2.bias"])
            h = h + y
        h = F.layer_norm(h, (D,), state["norm.weight"], state["norm.bias"], eps=1e-6)
        return h

    images_t = torch.randn(2, C, img, img)
    with torch.no_grad():
        ref_tokens = torch_forward(images_t).numpy()
        ref_logits_cls = F.linear(
            torch.from_numpy(ref_tokens)[:, 0], head_w, head_b
        ).numpy()
        ref_pooled_spatial = ref_tokens[:, 1:].mean(axis=1)

    ckpt = tmp_path / "mae_parity.pth"
    torch.save({"model": state}, ckpt)

    from ssl4polyp_tpu.models.import_torch import load_torch_state_dict, mae_params_from_torch
    from ssl4polyp_tpu.models.vit import vit_features, vit_forward

    cfg = ViTConfig(
        img_size=img, patch_size=P, embed_dim=D, depth=depth, num_heads=heads,
        pos_embed="learned", compute_dtype=jnp.float32, num_classes=num_classes,
    )
    params = jax.tree.map(jnp.asarray, mae_params_from_torch(load_torch_state_dict(ckpt), cfg))
    images = jnp.asarray(images_t.permute(0, 2, 3, 1).numpy())

    tokens = np.asarray(vit_features(params, images, cfg))
    np.testing.assert_allclose(tokens, ref_tokens, rtol=1e-4, atol=1e-5)

    params["head"] = {"kernel": jnp.asarray(head_w.numpy().T), "bias": jnp.asarray(head_b.numpy())}
    logits = np.asarray(vit_forward(params, images, cfg))
    np.testing.assert_allclose(logits, ref_logits_cls, rtol=1e-4, atol=1e-5)

    from ssl4polyp_tpu.models.vit import pool_tokens

    pooled = np.asarray(pool_tokens(jnp.asarray(tokens), "spatial"))
    np.testing.assert_allclose(pooled, ref_pooled_spatial, rtol=1e-4, atol=1e-5)


def test_ssl_colon_flow_native_checkpoint(tmp_path, rng_key):
    """Our own MAE pretraining checkpoint feeds get_mae_backbone directly."""
    import jax

    from ssl4polyp_tpu.models.factory import get_mae_backbone
    from ssl4polyp_tpu.utils.checkpoint import save_checkpoint

    mae_params = init_mae(rng_key, MAE_TINY)
    ckpt = tmp_path / "checkpoint-5.ckpt"
    save_checkpoint(ckpt, {"params": mae_params}, {"epoch": 5})

    enc = MAE_TINY.encoder
    classifier = get_mae_backbone(
        jax.random.PRNGKey(1), weight_path=ckpt, num_classes=2,
        img_size=enc.img_size, patch_size=enc.patch_size,
        embed_dim=enc.embed_dim, depth=enc.depth, num_heads=enc.num_heads,
        compute_dtype=jnp.float32,
    )
    # decoder stripped, encoder weights identical, fresh head attached
    assert "decoder" not in classifier.params
    np.testing.assert_array_equal(
        np.asarray(classifier.params["patch_embed"]["kernel"]),
        np.asarray(mae_params["patch_embed"]["kernel"]),
    )
    assert "head" in classifier.params
    logits = classifier.apply(classifier.params, jnp.ones((2, 32, 32, 3)))
    assert logits.shape == (2, 2)
    assert bool(jnp.isfinite(logits).all())


def test_vit_pad_tokens_exact():
    """ViTConfig.pad_tokens_to is numerically inert: identical features,
    logits, and parameter grads (the classification analog of the MAE
    decoder-pad exactness test)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.models import layers, vit

    cfg = vit.ViTConfig(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        compute_dtype=jnp.float32, pos_embed="learned", num_classes=3,
    )
    cfg_pad = dataclasses.replace(cfg, pad_tokens_to=24)  # 17 -> 24 tokens
    params = vit.init_vit(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out0 = vit.vit_forward(params, images, cfg)
    out1 = vit.vit_forward(params, images, cfg_pad)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)
    loss = lambda p, c: jnp.sum(jnp.square(vit.vit_forward(p, images, c)))
    g0 = jax.grad(loss)(params, cfg)
    g1 = jax.grad(loss)(params, cfg_pad)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
