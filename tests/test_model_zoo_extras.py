"""LARS, layer-wise LR decay, DPT decoder, MAE-style finetune engines."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4polyp_tpu.training import optim


def test_layerwise_lr_decay_scales():
    params = {
        "patch_embed": {"kernel": jnp.ones((4, 8))},
        "blocks": {"attn": {"qkv": {"kernel": jnp.ones((3, 8, 24))}}},
        "norm": {"scale": jnp.ones((8,))},
        "head": {"kernel": jnp.ones((8, 2))},
    }
    scales = optim.layerwise_lr_decay_scales(params, depth=3, decay=0.5)
    assert scales["head"]["kernel"] == 1.0
    assert scales["patch_embed"]["kernel"] == pytest.approx(0.5 ** 4)
    np.testing.assert_allclose(
        np.asarray(scales["blocks"]["attn"]["qkv"]["kernel"]).ravel(),
        [0.5 ** 3, 0.5 ** 2, 0.5 ** 1],
    )


def test_lars_matches_torch_reference_semantics():
    """ndim>1 params get trust-ratio scaling + wd; 1D params plain SGD+momentum."""
    w = jnp.full((4, 4), 2.0)
    b = jnp.full((4,), 2.0)
    params = {"w": w, "b": b}
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.5)}
    state = optim.lars_init(params)
    new_params, state = optim.lars_update(
        params, grads, state, lr=0.1, weight_decay=0.0, momentum=0.9,
        trust_coefficient=0.001,
    )
    # b: plain sgd: b - 0.1*0.5
    np.testing.assert_allclose(np.asarray(new_params["b"]), 2.0 - 0.05, rtol=1e-6)
    # w: trust = 0.001*||w||/||g|| = 0.001*8/2 = 0.004 → update 0.1*0.5*0.004
    np.testing.assert_allclose(
        np.asarray(new_params["w"]), 2.0 - 0.1 * 0.5 * 0.004, rtol=1e-5
    )


def test_dpt_decoder_shapes(rng_key):
    from ssl4polyp_tpu.models.dpt import DPTConfig, dpt_forward, init_dpt

    cfg = DPTConfig(embed_dim=32, num_classes=2, features=16, grid_size=4,
                    reassemble_channels=(8, 16, 24, 32))
    params = init_dpt(rng_key, cfg)
    taps = [jax.random.normal(jax.random.PRNGKey(i), (2, 17, 32)) for i in range(4)]
    out = dpt_forward(params, taps, cfg)
    # grid 4 → input 4*patch; output at input/2 = grid*patch/2; with patch
    # implicit, output spatial = grid*8 = 32 here (4 →(fusion ups)→ 32)
    assert out.shape == (2, 32, 32, 2)
    assert bool(jnp.isfinite(out).all())


def test_dpt_readout_variants(rng_key):
    """All three cls-readout operators (reference DPT_decoder.py:21-60):
    shapes, differentiability, and the semantics that distinguish them."""
    from ssl4polyp_tpu.models.dpt import DPTConfig, dpt_forward, init_dpt

    taps = [jax.random.normal(jax.random.PRNGKey(i), (2, 17, 32)) for i in range(4)]
    outs = {}
    for readout in ("ignore", "add", "project"):
        cfg = DPTConfig(embed_dim=32, num_classes=2, features=16, grid_size=4,
                        reassemble_channels=(8, 16, 24, 32), readout=readout)
        params = init_dpt(rng_key, cfg)
        has_proj = "readout_project" in params["reassemble"][0]
        assert has_proj == (readout == "project")
        out = dpt_forward(params, taps, cfg)
        assert out.shape == (2, 32, 32, 2)
        assert bool(jnp.isfinite(out).all())
        outs[readout] = out

        # grads flow through the readout path (incl. the projection)
        def loss(p):
            return jnp.sum(dpt_forward(p, taps, cfg) ** 2)

        grads = jax.grad(loss)(params)
        if readout == "project":
            g = grads["reassemble"][0]["readout_project"]["kernel"]
            assert float(jnp.abs(g).sum()) > 0

    # "ignore" vs "add" share params (same init consumption order for the
    # non-project variants) but must differ whenever the cls token is
    # non-zero; zero cls tokens make them coincide.
    assert not bool(jnp.allclose(outs["ignore"], outs["add"]))
    zero_cls = [t.at[:, :1, :].set(0.0) for t in taps]
    cfg_i = DPTConfig(embed_dim=32, num_classes=2, features=16, grid_size=4,
                      reassemble_channels=(8, 16, 24, 32), readout="ignore")
    cfg_a = DPTConfig(embed_dim=32, num_classes=2, features=16, grid_size=4,
                      reassemble_channels=(8, 16, 24, 32), readout="add")
    params = init_dpt(rng_key, cfg_i)
    assert bool(jnp.allclose(dpt_forward(params, zero_cls, cfg_i),
                             dpt_forward(params, zero_cls, cfg_a), atol=1e-6))

    import pytest

    with pytest.raises(ValueError):
        init_dpt(rng_key, DPTConfig(readout="bogus"))


def test_dense_readout_factory_plumbing(rng_key):
    from ssl4polyp_tpu.models.factory import build_classifier

    model = build_classifier(
        rng_key, {"pretraining": "random", "dense": True,
                  "dense_readout": "project"},
        num_classes=2, img_size=32, patch_size=16, embed_dim=32, depth=2,
        num_heads=4,
    )
    assert model.dpt_cfg.readout == "project"
    assert "readout_project" in model.params["dpt"]["reassemble"][0]
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = model.apply(model.params, images)
    assert out.shape[0] == 2 and out.shape[-1] == 2


def test_run_blocks_collect_taps(rng_key):
    from ssl4polyp_tpu.models import layers
    from ssl4polyp_tpu.models.dpt import TAP_BLOCKS

    blocks = layers.init_blocks(rng_key, depth=12, dim=16, mlp_ratio=2.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    final, collected = layers.run_blocks_collect(x, blocks, num_heads=2)
    assert collected.shape == (12, 2, 5, 16)
    np.testing.assert_allclose(np.asarray(collected[-1]), np.asarray(final), rtol=1e-5)
    taps = [collected[i] for i in TAP_BLOCKS]
    assert len(taps) == 4


def test_dense_classifier_assembly(rng_key):
    """build_classifier(dense=True) composes taps {2,5,8,11} + DPT
    (reference models.py:124) into dense logits with gradients flowing."""
    from ssl4polyp_tpu.models.factory import DenseClassifier, build_classifier

    model = build_classifier(
        rng_key,
        {"key": "sup_imnet", "arch": "vit_b", "pretraining": "random",
         "dense": True},
        num_classes=2,
        img_size=32, patch_size=8, embed_dim=32, depth=12, num_heads=2,
        compute_dtype=jnp.float32,
    )
    assert isinstance(model, DenseClassifier)
    assert set(model.params) == {"encoder", "dpt"}
    assert "head" not in model.params["encoder"]

    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    logits = model.apply(model.params, images)
    # grid 4 → fusion upsamples to 32; output at input resolution here
    # (input/2 at the reference's patch 16: 224→14→112)
    assert logits.shape == (2, 32, 32, 2)
    assert bool(jnp.isfinite(logits).all())

    def loss_fn(params):
        return (model.apply(params, images) ** 2).mean()

    grads = jax.grad(loss_fn)(model.params)
    dpt_norm = sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(grads["dpt"]))
    enc_norm = sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(grads["encoder"]))
    assert dpt_norm > 0 and enc_norm > 0

    # tapped features must match a manual collect over the same encoder
    from ssl4polyp_tpu.models import layers
    from ssl4polyp_tpu.models.dpt import TAP_BLOCKS
    from ssl4polyp_tpu.models.vit import vit_tap_features

    taps = vit_tap_features(model.params["encoder"], images, model.cfg)
    assert len(taps) == 4
    assert all(t.shape == (2, 17, 32) for t in taps)
    assert TAP_BLOCKS == (2, 5, 8, 11)


@pytest.mark.slow
def test_linear_probe_trains_head_only(tmp_path):
    from ssl4polyp_tpu.data.packs import create_classification_datasets
    from ssl4polyp_tpu.models.factory import get_imagenet_or_random_vit
    from ssl4polyp_tpu.training.mae_finetune import MAEFinetuneSettings, run_linear_probe
    from tests.conftest import make_image_pack

    pack = make_image_pack(tmp_path, frames_per_split=8, image_size=32)
    datasets = create_classification_datasets(train_spec=pack, image_size=32)
    classifier = get_imagenet_or_random_vit(
        jax.random.PRNGKey(0), None, num_classes=2,
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        compute_dtype=jnp.float32,
    )
    before_backbone = np.asarray(classifier.params["patch_embed"]["kernel"]).copy()
    before_head = np.asarray(classifier.params["head"]["kernel"]).copy()
    result = run_linear_probe(
        classifier, datasets["train"],
        MAEFinetuneSettings(epochs=1, warmup_epochs=0, batch_size=8, num_workers=1,
                            base_lr=0.1, weight_decay=0.0),
    )
    after = result["params"]
    np.testing.assert_array_equal(np.asarray(after["patch_embed"]["kernel"]), before_backbone)
    assert not np.array_equal(np.asarray(after["head"]["kernel"]), before_head)


def test_mixup_cutmix_and_erasing_numerics():
    """Convergence-free numerics for the upstream finetune regularizers
    (reference ``mae/main_finetune.py:87-112`` knobs)."""
    from ssl4polyp_tpu.data.augment import (
        mixup_cutmix_batch,
        random_erasing,
        smooth_one_hot,
    )

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (8, 16, 16, 3))
    labels = jnp.array([0, 1, 0, 1, 0, 1, 0, 1])

    # label smoothing: rows sum to 1, on-value = 1 − s + s/K
    y = smooth_one_hot(labels, 2, 0.1)
    np.testing.assert_allclose(np.asarray(y.sum(axis=1)), 1.0, atol=1e-6)
    assert float(y[0, 0]) == pytest.approx(0.95)
    assert float(y[0, 1]) == pytest.approx(0.05)

    # pure mixup: convex combination with the reversed batch, targets sum to 1
    xm, ym = mixup_cutmix_batch(
        x, y, key, mixup_alpha=0.8, cutmix_alpha=0.0,
        valid=jnp.ones(8, bool),
    )
    np.testing.assert_allclose(np.asarray(ym.sum(axis=1)), 1.0, atol=1e-6)
    # row i is lam*x[i] + (1-lam)*x[-1-i]; recover lam from row 0 and verify row 1
    lam = float((xm[0] - x[7]).flatten()[0] / (x[0] - x[7]).flatten()[0])
    assert 0.0 <= lam <= 1.0
    np.testing.assert_allclose(
        np.asarray(xm[1]), np.asarray(lam * x[1] + (1 - lam) * x[6]), atol=1e-5
    )

    # pure cutmix: every pixel comes from self or partner; λ equals the
    # non-box area fraction and the targets use the corrected λ
    xc, yc = mixup_cutmix_batch(
        x, y, key, mixup_alpha=0.0, cutmix_alpha=1.0,
        valid=jnp.ones(8, bool),
    )
    from_self = np.isclose(np.asarray(xc[2]), np.asarray(x[2])).all(axis=-1)
    from_partner = np.isclose(np.asarray(xc[2]), np.asarray(x[5])).all(axis=-1)
    assert (from_self | from_partner).all()
    lam_area = from_self.mean()
    expected = lam_area * np.asarray(y[2]) + (1 - lam_area) * np.asarray(y[5])
    np.testing.assert_allclose(np.asarray(yc[2]), expected, atol=1e-5)

    # invalid partners must not bleed in
    valid = jnp.array([True] * 7 + [False])
    xv, yv = mixup_cutmix_batch(
        x, y, key, mixup_alpha=0.8, cutmix_alpha=0.0, valid=valid,
    )
    np.testing.assert_array_equal(np.asarray(xv[0]), np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(yv[0]), np.asarray(y[0]))

    # random erasing: prob=0 is the identity; prob=1 touches a plausible area
    np.testing.assert_array_equal(
        np.asarray(random_erasing(x, key, prob=0.0)), np.asarray(x)
    )
    xe = random_erasing(x, key, prob=1.0)
    changed = (np.asarray(xe) != np.asarray(x)).any(axis=-1).mean()
    assert 0.0 < changed < 0.6


@pytest.mark.slow
def test_mae_finetune_with_regularizers(tmp_path):
    """One epoch of the vendored finetune path with mixup+cutmix+erasing on:
    finite loss, params move."""
    from ssl4polyp_tpu.data.packs import create_classification_datasets
    from ssl4polyp_tpu.models.factory import get_imagenet_or_random_vit
    from ssl4polyp_tpu.training.mae_finetune import MAEFinetuneSettings, run_mae_finetune
    from tests.conftest import make_image_pack

    pack = make_image_pack(tmp_path, frames_per_split=8, image_size=32)
    datasets = create_classification_datasets(train_spec=pack, image_size=32)
    classifier = get_imagenet_or_random_vit(
        jax.random.PRNGKey(0), None, num_classes=2,
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        compute_dtype=jnp.float32,
    )
    before = np.asarray(classifier.params["head"]["kernel"]).copy()
    result = run_mae_finetune(
        classifier, datasets["train"],
        MAEFinetuneSettings(
            epochs=1, warmup_epochs=0, batch_size=8, num_workers=1,
            mixup_alpha=0.8, cutmix_alpha=1.0, reprob=0.5, smoothing=0.1,
        ),
    )
    assert math.isfinite(result["train_loss"])
    assert not np.array_equal(np.asarray(result["params"]["head"]["kernel"]), before)
