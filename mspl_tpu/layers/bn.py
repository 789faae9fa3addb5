"""BatchNorm with an optional per-group ("unsynced") batch-statistics mode.

SURVEY.md §7 "BN under pmap": the reference (torch ``nn.DataParallel``)
computes BN batch statistics *per replica*; the GSPMD rebuild computes them
over the global batch (synced BN).  VERDICT r1 item 8 asks for the
per-replica semantics behind a flag, defaulting to the synced behavior.

Under GSPMD there is no per-device program to localize, so "per replica" is
expressed as *ghost-batch* statistics: the batch axis is split into
``groups`` contiguous groups, each normalized with its own mean/var, and the
running statistics are updated with the group-mean of the group statistics.
With ``groups == number of data shards`` (and the default contiguous batch
sharding from ``shard_batch``) the group boundaries coincide with the device
shards, so the semantics match torch-DataParallel per-replica BN *and* XLA
keeps each group's reduction local to its shard — unsynced BN also removes
the BN cross-device collectives.

The group count is trace-time static and carried by a context manager
instead of being threaded through every module constructor: model code keeps
instantiating ``BatchNorm(...)`` (a drop-in subclass of ``nn.BatchNorm`` —
same auto-name ``BatchNorm_N``, same variable tree, bit-identical when
``groups == 1``) and the train step activates

    with bn_stat_groups(n):
        model.apply(...)

around the traced forward (``mspl_tpu/engine/train.py``).  Evaluation uses
running averages and is unaffected by the mode.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

# Private flax helpers reused for exact stat/normalize parity with
# nn.BatchNorm (environment is pinned; parity is additionally enforced by
# tests/test_layers.py::test_bn_groups1_matches_flax).
from flax.linen.normalization import _compute_stats  # noqa: WPS450

_BN_GROUPS: contextvars.ContextVar[int] = contextvars.ContextVar(
    "mspl_bn_stat_groups", default=1
)


@contextlib.contextmanager
def bn_stat_groups(groups: int):
    """Trace-time switch: BatchNorm layers entered under this context compute
    batch statistics per contiguous batch group (``groups`` > 1) instead of
    over the global batch.  ``groups <= 1`` is the synced default."""
    token = _BN_GROUPS.set(max(1, int(groups)))
    try:
        yield
    finally:
        _BN_GROUPS.reset(token)


def current_bn_groups() -> int:
    return _BN_GROUPS.get()


class BatchNorm(nn.BatchNorm):
    """Drop-in ``nn.BatchNorm`` honoring the ``bn_stat_groups`` context.

    * groups == 1 (default), eval, or init → exactly ``nn.BatchNorm``.
    * groups G > 1 during training → the batch axis is reshaped to
      ``(G, B // G)`` and mean/var are computed per group; each sample is
      normalized with its group's statistics; running stats are updated with
      the across-group mean of the per-group statistics (what averaging the
      per-replica running buffers of a DataParallel run would give).
    """

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        groups = _BN_GROUPS.get()
        if groups <= 1 or ura or self.is_initializing():
            # delegate with the caller's (unmerged) argument — the parent
            # merges it against the constructor attribute itself
            return super().__call__(x, use_running_average=use_running_average)

        if self.axis != -1 or self.axis_name is not None:
            raise NotImplementedError(
                "grouped (unsynced) BN supports feature axis -1 and no "
                "axis_name; got axis={self.axis!r} axis_name={self.axis_name!r}"
            )
        batch = x.shape[0]
        if batch % groups != 0:
            raise ValueError(
                f"bn_stat_groups({groups}) requires the batch size ({batch}) "
                "to be divisible by the group count"
            )

        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,)
        )

        xg = x.reshape((groups, batch // groups) + x.shape[1:])
        # per-group reduction over every axis except (group, feature);
        # float32 stats exactly as flax's _compute_stats does
        red_axes = tuple(range(1, xg.ndim - 1))
        mean, var = _compute_stats(
            xg,
            red_axes,
            dtype=self.dtype,
            axis_name=None,
            use_fast_variance=self.use_fast_variance,
        )  # each (groups, feat) float32

        ra_mean.value = (
            self.momentum * ra_mean.value + (1 - self.momentum) * mean.mean(axis=0)
        )
        ra_var.value = (
            self.momentum * ra_var.value + (1 - self.momentum) * var.mean(axis=0)
        )

        gshape = (groups,) + (1,) * (xg.ndim - 2) + (feat,)
        mul = lax.rsqrt(var + self.epsilon).reshape(gshape)
        y = xg.astype(mean.dtype) - mean.reshape(gshape)
        args = [x]
        if self.use_scale:
            scale = self.param(
                "scale", self.scale_init, (feat,), self.param_dtype
            )
            mul = mul * scale
            args.append(scale)
        y = y * mul
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (feat,), self.param_dtype)
            y = y + bias
            args.append(bias)
        from flax.linen import dtypes as _dtypes

        out_dtype = _dtypes.canonicalize_dtype(*args, dtype=self.dtype)
        return y.reshape(x.shape).astype(out_dtype)
