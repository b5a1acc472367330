"""Tests for layered YAML configuration composition."""

import pytest
import yaml

from ssl4polyp_tpu.configs import layered


def write(path, data):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(yaml.safe_dump(data))
    return path


def test_deep_merge_nested_override():
    base = {"a": 1, "nested": {"x": 1, "y": 2}, "list": [1, 2]}
    overlay = {"nested": {"y": 3, "z": 4}, "list": [9]}
    merged = layered.deep_merge(base, overlay)
    assert merged == {"a": 1, "nested": {"x": 1, "y": 3, "z": 4}, "list": [9]}
    # Inputs untouched
    assert base["nested"] == {"x": 1, "y": 2}


def test_defaults_recursion_and_sources(tmp_path, monkeypatch):
    monkeypatch.setenv("SSL4POLYP_TPU_CONFIG_ROOT", str(tmp_path))
    write(tmp_path / "base.yaml", {"lr": 0.001, "opt": {"name": "adamw", "wd": 0.05}})
    write(
        tmp_path / "exp" / "exp1.yaml",
        {"defaults": ["base"], "opt": {"wd": 0.01}, "epochs": 3},
    )
    cfg = layered.load_layered_config("exp/exp1.yaml")
    assert cfg["lr"] == 0.001
    assert cfg["opt"] == {"name": "adamw", "wd": 0.01}
    assert cfg["epochs"] == 3
    sources = cfg["__sources__"]
    assert len(sources) == 2
    assert sources[0].endswith("base.yaml")
    assert sources[1].endswith("exp1.yaml")


def test_defaults_relative_to_declaring_file(tmp_path, monkeypatch):
    monkeypatch.setenv("SSL4POLYP_TPU_CONFIG_ROOT", str(tmp_path))
    write(tmp_path / "exp" / "sub" / "parent.yaml", {"a": 1})
    write(tmp_path / "exp" / "sub" / "child.yaml", {"defaults": ["parent.yaml"], "b": 2})
    cfg = layered.load_layered_config("exp/sub/child.yaml")
    assert cfg["a"] == 1 and cfg["b"] == 2


def test_cycle_detection(tmp_path, monkeypatch):
    monkeypatch.setenv("SSL4POLYP_TPU_CONFIG_ROOT", str(tmp_path))
    write(tmp_path / "a.yaml", {"defaults": ["b"]})
    write(tmp_path / "b.yaml", {"defaults": ["a"]})
    with pytest.raises(layered.ConfigCycleError):
        layered.load_layered_config("a.yaml")


def test_resolve_model_entries(tmp_path, monkeypatch):
    monkeypatch.setenv("SSL4POLYP_TPU_CONFIG_ROOT", str(tmp_path))
    write(tmp_path / "model" / "m1.yaml", {"model": {"key": "m1", "arch": "vit_b"}})
    entries = layered.resolve_model_entries(["model/m1", {"key": "inline"}])
    assert entries[0] == {"key": "m1", "arch": "vit_b"}
    assert entries[1] == {"key": "inline"}


def test_extract_dataset_config_requires_dataset():
    with pytest.raises(ValueError):
        layered.extract_dataset_config({"lr": 1.0})
    assert layered.extract_dataset_config({"dataset": {"name": "d"}}) == {"name": "d"}
