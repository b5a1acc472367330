"""Pin the benchmark's default operating point.

The driver's perf gate runs ``python bench.py`` with no env knobs, so the
DEFAULTS dict *is* the measured configuration (PERF_NOTES.md round 3:
1761 img/s/chip, 1.067x the 1650 north-star).  This test locks it: any
change to a default must come with a fresh TPU measurement logged in
PERF_NOTES.md and a deliberate edit here, in the same commit.
"""

import importlib.util
import sys
from pathlib import Path


def _load_bench():
    # bench.py lives at the repo root, outside the package; import it by
    # path so this works regardless of CWD.  Importing is side-effect-free
    # (jax is only imported inside the workload functions).
    path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("_bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_operating_point_pinned():
    bench = _load_bench()
    assert bench.BASELINE_IMAGES_PER_SEC == 1650.0
    assert bench.DEFAULTS == {
        "BENCH_BATCH": "256",
        "BENCH_STEPS_PER_CALL": "16",
        "BENCH_PALLAS": "1",
        "BENCH_UNROLL": "1",
        "BENCH_REMAT": "0",
        "BENCH_F32_SOFTMAX": "0",
        "BENCH_DECODER_PAD": "200",
        "BENCH_ENCODER_PAD": "0",
        "BENCH_VIT_PAD": "1",
        "BENCH_MLP": "fc1",
        "BENCH_QKV_LN": "0",
        "BENCH_ITERS": "10",
        "BENCH_TRIALS": "3",
    }


def test_bench_env_override_wins(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("BENCH_BATCH", "64")
    assert bench._env("BENCH_BATCH") == "64"
    monkeypatch.delenv("BENCH_BATCH")
    assert bench._env("BENCH_BATCH") == "256"


def test_factory_pads_vit_tokens_by_default():
    """The +5.2% finetune win (PERF_NOTES round 3): the factory sublane-pads
    the ViT-B/16 token stream (197 -> 200) whenever the Pallas kernels are
    on, and an explicit pad_tokens_to=0 opts out."""
    from ssl4polyp_tpu.models.factory import _vit_b

    cfg = _vit_b(2, "cls", "sincos", use_pallas_attention=True)
    assert cfg.pad_tokens_to == 200
    cfg_off = _vit_b(2, "cls", "sincos", use_pallas_attention=True,
                     pad_tokens_to=0)
    assert cfg_off.pad_tokens_to == 0
    cfg_xla = _vit_b(2, "cls", "sincos", use_pallas_attention=False)
    assert cfg_xla.pad_tokens_to is None
