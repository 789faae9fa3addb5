"""Classification pretraining tests: EESPNet learns synthetic classes and
its trained encoder transfers into the segmentation model (SURVEY.md §2
"Pretrained weights" analog)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mspl_tpu.data.loader import DataLoader
from mspl_tpu.engine.train_cls import (
    ClsTrainConfig,
    encoder_variables_from_classifier,
    load_pretrained_encoder,
    train_classification,
)
from mspl_tpu.models import EESPNet, ESPNetv2Segmentation, init_model


class ColorClassDataset:
    """Images of a class-specific color + noise; label = class id."""

    def __init__(self, num_classes=4, size=32, length=32, seed=0):
        self.num_classes = num_classes
        self.size = size
        self.length = length
        self.seed = seed
        rng = np.random.default_rng(99)
        self.palette = rng.integers(30, 225, size=(num_classes, 3))

    def __len__(self):
        return self.length

    def load(self, i):
        rng = np.random.default_rng(self.seed * 7919 + i)
        c = i % self.num_classes
        img = np.full((self.size, self.size, 3), self.palette[c], np.float32)
        img += rng.normal(0, 12, img.shape)
        return np.clip(img, 0, 255).astype(np.uint8), np.int32(c)


@pytest.mark.slow
def test_classification_learns_and_encoder_transfers():
    train_ds = ColorClassDataset(length=32, seed=1)
    val_ds = ColorClassDataset(length=16, seed=2)
    train_loader = DataLoader(train_ds, batch_size=8, shuffle=True)
    val_loader = DataLoader(val_ds, batch_size=8)

    model = EESPNet(s=0.5, num_classes=4)
    variables = init_model(model, (32, 32))
    cfg = ClsTrainConfig(epochs=10, lr=0.005, scheduler="fixed",
                         optimizer="adam", weight_decay=1e-5, verbose=False)
    res = train_classification(model, variables, train_loader, val_loader, cfg)
    assert res["best_acc"] > 0.7, res["history"]

    cls_vars = jax.device_get(
        {"params": res["state"].params,
         "batch_stats": res["state"].batch_stats})

    enc = encoder_variables_from_classifier(cls_vars)
    assert "level1" in enc["params"] and "level3_blocks_0" in enc["params"]
    assert "classifier" not in enc["params"]
    assert "level5_0" not in enc["params"]

    seg = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8)
    seg_vars = init_model(seg, (32, 32))
    seg_pre = load_pretrained_encoder(seg_vars, cls_vars)
    # encoder weights actually replaced
    a = seg_vars["params"]["base_net"]["level1"]["CB_0"]["C_0"]["Conv_0"]["kernel"]
    b = seg_pre["params"]["base_net"]["level1"]["CB_0"]["C_0"]["Conv_0"]["kernel"]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # and the seg model still runs
    out = seg.apply(seg_pre, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 32, 32, 3)
