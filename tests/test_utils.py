"""Utility subsystem tests: profiling cards, workload config registry,
checkpoint atomicity, loggers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.utils.checkpoint import (
    has_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from mspl_tpu.utils.config import WORKLOADS, get_workload
from mspl_tpu.utils.profiling import StepTimer, estimate_flops, model_parameters
from mspl_tpu.utils.tb_logger import ScalarLogger


def test_model_parameters():
    params = {"a": np.zeros((3, 4)), "b": {"c": np.zeros((5,))}}
    assert model_parameters(params) == 17


def test_estimate_flops_matmul():
    f = estimate_flops(lambda a, b: a @ b,
                       jnp.zeros((64, 32)), jnp.zeros((32, 16)))
    if f is not None:  # backend-dependent availability
        assert f >= 2 * 64 * 32 * 16 * 0.5


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["total_s"] >= 0


def test_workload_registry_covers_baseline_configs():
    assert len(WORKLOADS) == 5  # BASELINE.json:7-12
    assert get_workload("camvid_inference").dataset == "camvid"
    assert get_workload("full_curriculum").rounds > 1
    assert get_workload("full_curriculum").extra["alt_model"] == "deeplabv3"
    with pytest.raises(ValueError):
        get_workload("nope")


def test_checkpoint_roundtrip_and_best(tmp_path):
    d = str(tmp_path)
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_checkpoint(d, state, {"epoch": 1, "best_miou": 0.5}, is_best=True)
    assert has_checkpoint(d) and has_checkpoint(d, best=True)
    restored, meta = load_checkpoint(d, {"w": np.zeros((2, 3), np.float32)})
    np.testing.assert_array_equal(restored["w"], state["w"])
    assert meta["epoch"] == 1

    # overwrite last but keep best
    save_checkpoint(d, {"w": np.zeros((2, 3), np.float32)}, {"epoch": 2})
    best, bmeta = load_checkpoint(d, {"w": np.zeros((2, 3), np.float32)},
                                  best=True)
    np.testing.assert_array_equal(best["w"], state["w"])
    assert bmeta["best_miou"] == 0.5


def test_scalar_logger(tmp_path):
    lg = ScalarLogger(str(tmp_path / "tb"))
    lg.add_scalar("x", 1.0, 0)
    lg.close()
    noop = ScalarLogger(None)
    noop.add_scalar("x", 1.0, 0)  # must not raise
    noop.close()
