"""Optimizer and schedule tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4polyp_tpu.training import optim
from ssl4polyp_tpu.training.schedules import EarlyStopper, PlateauScheduler, warmup_cosine


def simple_params():
    return {
        "blocks": {"mlp": {"fc1": {"kernel": jnp.ones((3, 4, 4)), "bias": jnp.zeros((3, 4))}}},
        "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros((2,))},
        "cls_token": jnp.ones((1, 1, 4)),
    }


def ones_grads(params):
    return jax.tree_util.tree_map(jnp.ones_like, params)


def test_adamw_matches_torch():
    """Single-tensor AdamW trajectory must match torch.optim.AdamW."""
    torch = pytest.importorskip("torch")
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    g = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.AdamW([wt], lr=1e-2, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.05)
    for _ in range(5):
        opt.zero_grad()
        wt.grad = torch.tensor(g.copy())
        opt.step()

    params = {"w": jnp.asarray(w0)}
    state = optim.adamw_init(params)
    for _ in range(5):
        params, state = optim.adamw_update(
            params, {"w": jnp.asarray(g)}, state,
            lr=1e-2, b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.05,
        )
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_lr_scale_freezes_leaves():
    params = simple_params()
    state = optim.adamw_init(params)
    scales = jax.tree_util.tree_map(lambda _: 1.0, params)
    scales["head"] = {"kernel": 0.0, "bias": 0.0}
    new_params, _ = optim.adamw_update(
        params, ones_grads(params), state, lr=0.1, lr_scale=scales, weight_decay=0.1
    )
    np.testing.assert_array_equal(np.asarray(new_params["head"]["kernel"]), np.ones((4, 2)))
    assert not np.array_equal(np.asarray(new_params["cls_token"]), np.ones((1, 1, 4)))


def test_finetune_lr_scales_modes():
    params = simple_params()
    depth = 3
    # none: only head trains
    tree = optim.finetune_lr_scales(params, "none", depth)
    assert tree["head"]["kernel"] == 1.0
    assert tree["cls_token"] == 0.0
    np.testing.assert_array_equal(
        np.asarray(tree["blocks"]["mlp"]["fc1"]["kernel"]).ravel(), [0, 0, 0]
    )
    # head+1: last block only
    tree = optim.finetune_lr_scales(params, "head+1", depth)
    np.testing.assert_array_equal(
        np.asarray(tree["blocks"]["mlp"]["fc1"]["kernel"]).ravel(), [0, 0, 1]
    )
    # head+2 with distinct group LRs
    tree = optim.finetune_lr_scales(params, "head+2", depth, head_scale=1.0, backbone_scale=0.01)
    np.testing.assert_allclose(
        np.asarray(tree["blocks"]["mlp"]["fc1"]["kernel"]).ravel(), [0, 0.01, 0.01]
    )
    # full trains everything
    tree = optim.finetune_lr_scales(params, "full", depth)
    assert tree["cls_token"] == 1.0


def test_finetune_scale_update_slices():
    """head+1 must move only the last stacked block slice."""
    params = simple_params()
    state = optim.adamw_init(params)
    scales = optim.finetune_lr_scales(params, "head+1", 3)
    new_params, _ = optim.adamw_update(
        params, ones_grads(params), state, lr=0.1, lr_scale=scales
    )
    kernel = np.asarray(new_params["blocks"]["mlp"]["fc1"]["kernel"])
    np.testing.assert_array_equal(kernel[0], np.ones((4, 4)))  # frozen slice
    np.testing.assert_array_equal(kernel[1], np.ones((4, 4)))
    assert (kernel[2] < 1.0).all()  # trained slice moved


def test_no_weight_decay_scales():
    params = simple_params()
    tree = optim.no_weight_decay_scales(params)
    assert tree["head"]["bias"] == 0.0
    assert tree["head"]["kernel"] == 1.0
    assert tree["cls_token"] == 0.0
    assert tree["blocks"]["mlp"]["fc1"]["kernel"] == 1.0


def test_clip_by_global_norm():
    grads = {"a": jnp.full((2, 2), 3.0), "b": jnp.full((2,), 4.0)}
    clipped, norm = optim.clip_by_global_norm(grads, 1.0)
    assert float(norm) == pytest.approx(np.sqrt(9 * 4 + 16 * 2), rel=1e-5)
    assert float(optim.global_norm(clipped)) == pytest.approx(1.0, rel=1e-5)


def test_warmup_cosine_schedule():
    sched = warmup_cosine(1.0, total_steps=100, warmup_steps=10, min_lr=0.1)
    assert sched(0) == pytest.approx(0.1)
    assert sched(9) == pytest.approx(1.0)
    assert sched(10) == pytest.approx(1.0)
    assert sched(99) == pytest.approx(0.1, abs=1e-2)
    # monotone decreasing after warmup
    values = [sched(s) for s in range(10, 100)]
    assert all(a >= b for a, b in zip(values, values[1:]))


def test_plateau_scheduler():
    plateau = PlateauScheduler(factor=0.5, patience=1)
    assert plateau.step(1.0) == 1.0
    assert plateau.step(1.0) == 1.0  # first bad epoch
    assert plateau.step(1.0) == 0.5  # patience exceeded
    assert plateau.scale(2.0) == 1.0


def test_early_stopper():
    stopper = EarlyStopper(patience=2, min_delta=0.0, min_epochs=0)
    assert not stopper.update(0, 1.0)
    assert not stopper.update(1, 0.5)
    assert not stopper.update(2, 0.6)
    assert stopper.update(3, 0.7)  # two bad epochs
    assert stopper.best == 0.5
    assert stopper.best_epoch == 1


def test_early_stopper_patience_zero_disables():
    # patience<=0 means early stopping is OFF (reference
    # _should_trigger_early_stop semantics), not stop-immediately.
    stopper = EarlyStopper(patience=0, min_delta=0.0, min_epochs=0)
    for epoch, metric in enumerate([1.0, 0.9, 0.95, 0.99, 1.2]):
        assert not stopper.update(epoch, metric)
    assert stopper.best == 0.9
    assert stopper.best_epoch == 1


def test_adamw_update_fused_matches_reference():
    # The fused (Pallas, interpret-mode) update must reproduce adamw_update
    # exactly, and its emitted compute copy must match
    # cast_params_for_compute of the updated tree.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.models.layers import cast_params_for_compute
    from ssl4polyp_tpu.training import optim

    key = jax.random.PRNGKey(0)
    params = {
        "w": jax.random.normal(jax.random.fold_in(key, 0), (24, 256)),
        "bias": jax.random.normal(jax.random.fold_in(key, 1), (256,)),
        "ln1": {"scale": jnp.ones((256,)), "bias": jnp.zeros((256,))},
    }
    grads = jax.tree_util.tree_map(
        lambda p: 0.01 * jax.random.normal(jax.random.fold_in(key, p.size), p.shape),
        params,
    )
    wd = optim.no_weight_decay_scales(params)
    state = optim.adamw_init(params)
    # advance one step so bias corrections are non-trivial
    for variant in range(2):
        ref_p, ref_state = optim.adamw_update(
            params, grads, state, lr=1e-3, b1=0.9, b2=0.95,
            weight_decay=0.05, wd_scale=wd,
        )
        got_p, got_pc, got_state = optim.adamw_update_fused(
            params, grads, state, lr=1e-3, b1=0.9, b2=0.95,
            weight_decay=0.05, wd_scale=wd,
            compute_dtype=jnp.bfloat16, interpret=True,
        )
        for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                        jax.tree_util.tree_leaves(got_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
        ref_pc = cast_params_for_compute(ref_p, jnp.bfloat16)
        for a, b in zip(jax.tree_util.tree_leaves(ref_pc),
                        jax.tree_util.tree_leaves(got_pc)):
            assert a.dtype == b.dtype
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-6, atol=1e-6,
            )
        for a, b in zip(jax.tree_util.tree_leaves(ref_state.mu),
                        jax.tree_util.tree_leaves(got_state.mu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
        params, state = ref_p, ref_state


def test_adamw_update_fused_array_scales_fall_back():
    # Layer-decay style scale ARRAYS are not Pallas-eligible; the fused
    # entry point must fall back to the XLA leaf path and still match
    # adamw_update exactly.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.training import optim

    key = jax.random.PRNGKey(2)
    params = {"blocks": {"w": jax.random.normal(key, (4, 16, 32))}}
    grads = {"blocks": {"w": 0.01 * jax.random.normal(jax.random.fold_in(key, 1), (4, 16, 32))}}
    lr_scale = {"blocks": {"w": jnp.asarray([1.0, 0.5, 0.25, 0.125]).reshape(4, 1, 1)}}
    state = optim.adamw_init(params)

    ref_p, ref_state = optim.adamw_update(
        params, grads, state, lr=1e-3, weight_decay=0.05, lr_scale=lr_scale,
    )
    got_p, got_pc, got_state = optim.adamw_update_fused(
        params, grads, state, lr=1e-3, weight_decay=0.05, lr_scale=lr_scale,
        compute_dtype=jnp.bfloat16, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(ref_p["blocks"]["w"]), np.asarray(got_p["blocks"]["w"]),
        rtol=1e-6, atol=1e-6,
    )
    assert got_pc["blocks"]["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ref_state.nu["blocks"]["w"]),
        np.asarray(got_state.nu["blocks"]["w"]), rtol=1e-6, atol=1e-6,
    )


def test_pos_embed_frozen_in_pretrain_scales():
    """Reference MAE keeps encoder/decoder sincos pos_embed as
    requires_grad=False buffers (models_mae.py:37,51): pretrain lr scales
    must zero exactly those leaves."""
    import jax

    from ssl4polyp_tpu.models.mae import MAEConfig, init_mae
    from ssl4polyp_tpu.models.vit import ViTConfig
    from ssl4polyp_tpu.training import optim

    cfg = MAEConfig(
        encoder=ViTConfig(img_size=32, patch_size=8, embed_dim=32, depth=2,
                          num_heads=4),
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=4,
    )
    params = init_mae(jax.random.PRNGKey(0), cfg)
    scales = optim.pretrain_lr_scales(params)
    assert scales["pos_embed"] == 0.0
    assert scales["decoder"]["pos_embed"] == 0.0
    assert scales["cls_token"] == 1.0
    assert scales["decoder"]["mask_token"] == 1.0
    assert scales["patch_embed"]["kernel"] == 1.0


def test_pos_embed_freeze_in_finetune_scales():
    """freeze_pos_embed zeroes pos_embed in every mode (MAE-lineage
    classifier inherits the frozen buffer via ViT_from_MAE); the learned
    lineage keeps it trainable in full mode."""
    import jax

    from ssl4polyp_tpu.models.vit import ViTConfig, init_vit
    from ssl4polyp_tpu.training import optim

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4, num_classes=2, pos_embed="learned")
    params = init_vit(jax.random.PRNGKey(0), cfg)
    for mode in ("full", "none", "head+1"):
        frozen = optim.finetune_lr_scales(params, mode, 2, freeze_pos_embed=True)
        assert frozen["pos_embed"] == 0.0, mode
    trainable = optim.finetune_lr_scales(params, "full", 2)
    assert trainable["pos_embed"] == 1.0


def test_pretrain_step_does_not_move_pos_embed(rng_key):
    """One real pretrain optimizer step: sincos tables bit-unchanged while
    cls/mask tokens move."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl4polyp_tpu.models.mae import MAEConfig, init_mae, mae_forward
    from ssl4polyp_tpu.models.vit import ViTConfig
    from ssl4polyp_tpu.training import optim

    cfg = MAEConfig(
        encoder=ViTConfig(img_size=32, patch_size=8, embed_dim=32, depth=2,
                          num_heads=4, compute_dtype=jnp.float32),
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=4,
    )
    params = init_mae(rng_key, cfg)
    before_enc = np.asarray(params["pos_embed"]).copy()
    before_dec = np.asarray(params["decoder"]["pos_embed"]).copy()

    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss_fn(p):
        loss, _, _ = mae_forward(p, images, jax.random.PRNGKey(2), cfg)
        return loss

    grads = jax.grad(loss_fn)(params)
    state = optim.adamw_init(params)
    new_params, _ = optim.adamw_update(
        params, grads, state, lr=1e-2, weight_decay=0.05,
        lr_scale=optim.pretrain_lr_scales(params),
        wd_scale=optim.no_weight_decay_scales(params),
    )
    np.testing.assert_array_equal(np.asarray(new_params["pos_embed"]), before_enc)
    np.testing.assert_array_equal(
        np.asarray(new_params["decoder"]["pos_embed"]), before_dec
    )
    assert not np.array_equal(
        np.asarray(new_params["cls_token"]), np.asarray(params["cls_token"])
    )
