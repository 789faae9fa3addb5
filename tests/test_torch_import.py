"""Torch .pth weight import/export (mspl_tpu/utils/torch_import.py —
SURVEY.md §2 "Pretrained weights": reference users bring trained torch
state dicts; this gates that they load into the flax models losslessly).

The mapping is derived at runtime from the oracle transplant
(`load_from_flax`), so these tests also pin the derivation machinery:
probe-based byte matching, layout inverses, envelope unwrapping, and the
strict-validation failure modes."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.models import DeepLabV3, ESPNetv2Segmentation
from mspl_tpu.utils.torch_import import (export_torch_state_dict,
                                         unwrap_state_dict,
                                         variables_from_state_dict)

torch = pytest.importorskip("torch")

HW = (32, 48)


def _trees_equal(a, b) -> bool:
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def _structural_vars(model, hw=HW, seed=0):
    """A variables tree with init's structure but random numpy leaves —
    jax.eval_shape traces without compiling, so this costs ~1s where a real
    jitted init costs ~35s on this 1-core host.  Import/export only cares
    about structure + values, not about init's distribution."""
    dummy = jnp.zeros((1, *hw, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, dummy,
                           train=False))
    paths, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    rng = np.random.default_rng(seed)

    def fill(path, l):
        # a finite forward needs sane statistics: positive variances (else
        # sqrt -> NaN) and small zero-mean weights (all-positive weights
        # compound multiplicatively through ~20 conv layers -> inf - inf)
        if any(getattr(k, "key", None) == "var" for k in path):
            return rng.uniform(0.5, 1.5, l.shape).astype(l.dtype)
        return (rng.standard_normal(l.shape) * 0.05).astype(l.dtype)

    return jax.tree_util.tree_unflatten(
        treedef, [fill(p, l) for p, l in paths])


@pytest.fixture(scope="module")
def esp_vars():
    model = ESPNetv2Segmentation(num_classes=5, s=0.5)
    return model, _structural_vars(model, seed=7)


def test_espnetv2_roundtrip_exact(esp_vars):
    model, v = esp_vars
    sd = export_torch_state_dict("espnetv2", v, num_classes=5, s=0.5)
    v2 = variables_from_state_dict("espnetv2", sd, v, num_classes=5, s=0.5)
    assert _trees_equal(v, v2)


def test_deeplab_roundtrip_exact():
    kw = dict(stage_blocks=(1, 1, 1, 1), aspp_features=32)
    model = DeepLabV3(num_classes=5, **kw)
    v = _structural_vars(model, seed=3)
    sd = export_torch_state_dict("deeplabv3", v, num_classes=5, **kw)
    v2 = variables_from_state_dict("deeplabv3", sd, v, num_classes=5, **kw)
    assert _trees_equal(v, v2)


def test_checkpoint_envelope_and_dataparallel_prefix(esp_vars):
    model, v = esp_vars
    sd = export_torch_state_dict("espnetv2", v, num_classes=5, s=0.5)
    wrapped = {"epoch": 3,
               "state_dict": {f"module.{k}": t for k, t in sd.items()}}
    assert set(unwrap_state_dict(wrapped)) == set(sd)
    v2 = variables_from_state_dict("espnetv2", wrapped, v,
                                   num_classes=5, s=0.5)
    assert _trees_equal(v, v2)


def test_architecture_mismatch_raises(esp_vars):
    model, v = esp_vars
    sd = export_torch_state_dict("espnetv2", v, num_classes=5, s=0.5)
    sd = dict(sd)
    sd.pop(next(iter(sd)))
    with pytest.raises((ValueError, RuntimeError)):
        variables_from_state_dict("espnetv2", sd, v, num_classes=5, s=0.5)


@pytest.mark.slow
def test_import_preserves_forward(esp_vars):
    """Imported weights drive the flax forward to the SAME logits (exact:
    the tree is bit-identical, so this is a consistency smoke on top of
    the tree equality)."""
    model, v = esp_vars
    sd = export_torch_state_dict("espnetv2", v, num_classes=5, s=0.5)
    v2 = variables_from_state_dict("espnetv2", sd, v, num_classes=5, s=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *HW, 3), jnp.float32)
    y1 = model.apply(v, x, train=False)
    y2 = model.apply(v2, x, train=False)
    assert np.array_equal(np.asarray(y1), np.asarray(y2))


@pytest.mark.slow
def test_cli_import_export_cycle(tmp_path, esp_vars):
    """import-torch writes a native checkpoint dir the rest of the CLI can
    consume; export-torch writes a .pth the importer reads back."""
    from mspl_tpu.cli import load_model_checkpoint, main

    model, v = esp_vars
    sd = export_torch_state_dict("espnetv2", v, num_classes=5, s=0.5)
    pth = str(tmp_path / "weights.pth")
    torch.save(sd, pth)

    out = str(tmp_path / "ck")
    main(["import-torch", "--pth", pth, "--model", "espnetv2",
          "--num-classes", "5", "--s", "0.5", "--dataset", "forest",
          "--size", "48", "32", "--out-dir", out])
    m2, v2, meta = load_model_checkpoint(out)
    assert meta["dataset"] == "forest" and meta["num_classes"] == 5
    assert _trees_equal(v, v2)

    pth2 = str(tmp_path / "back.pth")
    main(["export-torch", "--checkpoint", out, "--out", pth2])
    sd2 = torch.load(pth2, map_location="cpu", weights_only=True)
    assert set(sd2) == set(sd)
    assert all(torch.equal(sd[k], sd2[k]) for k in sd)


@pytest.mark.slow
def test_direct_pth_with_sidecar(tmp_path, esp_vars):
    """load_model_checkpoint accepts a bare .pth when the same-stem JSON
    meta sidecar exists (ad-hoc path, no conversion step)."""
    from mspl_tpu.cli import load_model_checkpoint

    model, v = esp_vars
    sd = export_torch_state_dict("espnetv2", v, num_classes=5, s=0.5)
    pth = str(tmp_path / "w.pth")
    torch.save(sd, pth)
    with open(str(tmp_path / "w.json"), "w") as f:
        json.dump({"model": "espnetv2", "num_classes": 5, "s": 0.5,
                   "dataset": "forest", "input_hw": list(HW)}, f)
    m2, v2, meta = load_model_checkpoint(pth)
    assert _trees_equal(v, v2)
    assert meta["model"] == "espnetv2"


def test_rgbd_import_rejected(tmp_path, esp_vars):
    """The twins are RGB-only; a 4-channel meta must fail loudly rather
    than import garbage."""
    from mspl_tpu.utils.torch_import import import_torch_checkpoint

    model, v = esp_vars
    sd = export_torch_state_dict("espnetv2", v, num_classes=5, s=0.5)
    pth = str(tmp_path / "w.pth")
    torch.save(sd, pth)
    with pytest.raises(ValueError, match="RGB"):
        import_torch_checkpoint(pth, {"model": "espnetv2",
                                      "num_classes": 5, "s": 0.5,
                                      "in_channels": 4})
