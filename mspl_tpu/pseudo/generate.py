"""Pseudo-label engine (reference layer L5 — MSPL's novel layer,
SURVEY.md §2 "Pseudo-label generator" / "Multi-source fusion", §3.2 call
stack, App. A "Fusion semantics").

Reference behavior rebuilt: run N source segmentation models over unlabeled
target images; per-pixel softmax; convert each source label space into the
greenhouse space; fuse (soft = average converted probability maps, hard =
per-pixel agreement of converted argmax maps); threshold low-confidence
pixels to ignore(255) — with class-balanced thresholds kc (CBST) computed in
`mspl_tpu.pseudo.cbst`.

TPU-native design (BASELINE.json:5): label-space conversion is a matmul with
a [C_src, T+1] 0/1 pooling matrix (MXU-friendly; see
mspl_tpu/data/label_space.py), so the whole post-model pass is
softmax → matmul → mean/vote → max/argmax → compare — one fused XLA/Pallas
program over HBM-resident logits; labels stay on device for the fine-tune
step instead of the reference's per-image PNG round-trip (SURVEY.md §1:
"in the rebuild it becomes an on-device fused pass").  A hand-written Pallas
kernel for this pass lives in mspl_tpu/ops/pallas_pseudo.py; this module is
the jnp reference implementation and the public API (`use_pallas` switches).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mspl_tpu.data.label_space import label_conversion_matrix
from mspl_tpu.utils.registry import IGNORE_LABEL


@dataclass
class SourceModel:
    """A source network packaged for the pseudo-label engine.

    apply_fn: imgs [B,H,W,3] (normalized fp32) -> logits [B,H,W,C_src]
    (or [B,C_src,H,W] when channel_major — the layout the fused Pallas
    pass wants, emitted for free by the model's final resize einsum);
    conversion: float32 [C_src, T+1] pooling matrix into the target space
    (last column = mass mapped to ignore).
    """

    name: str
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray]
    conversion: np.ndarray
    channel_major: bool = False
    compute_dtype: Optional[object] = None


def make_source(name: str, model, variables, src_dataset: str,
                num_target: int = 3, channel_major: bool = False) -> SourceModel:
    """Wrap a flax segmentation model + trained variables as a SourceModel.

    channel_major=True requests [B,C,H,W] logits: models that support
    `channel_major_logits` emit them at zero cost; others get an explicit
    transpose appended."""
    import dataclasses as _dc

    if channel_major and hasattr(model, "channel_major_logits"):
        model = _dc.replace(model, channel_major_logits=True)

        def apply_fn(imgs):
            return model.apply(variables, imgs, train=False)
    elif channel_major:
        def apply_fn(imgs):
            out = model.apply(variables, imgs, train=False)
            return jnp.transpose(out, (0, 3, 1, 2))
    else:
        def apply_fn(imgs):
            return model.apply(variables, imgs, train=False)

    return SourceModel(
        name=name,
        apply_fn=apply_fn,
        conversion=label_conversion_matrix(src_dataset, num_target),
        channel_major=channel_major,
        compute_dtype=getattr(model, "compute_dtype", None),
    )


def convert_probs(probs: jnp.ndarray, conversion: jnp.ndarray) -> jnp.ndarray:
    """Pool source-space probabilities into the target space (matmul)."""
    return jnp.einsum(
        "...s,st->...t", probs, jnp.asarray(conversion, probs.dtype)
    )


def fused_pseudo_pass(
    logits_list: Sequence[jnp.ndarray],
    conversions: Sequence[jnp.ndarray],
    mode: str = "soft",
    kc: Optional[jnp.ndarray] = None,
    num_target: Optional[int] = None,
    min_agree: Optional[int] = None,
    ignore_label: int = IGNORE_LABEL,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse N per-model logit tensors into (pseudo_label, confidence).

    logits_list: N tensors [B,H,W,C_m] (C_m differs per source).
    conversions: N matching [C_m, T+1] pooling matrices.
    kc: per-class confidence thresholds [T] (or scalar); None = no threshold.
    mode 'soft': average converted probability maps; confidence = max of the
        averaged map (SURVEY.md App. A: soft fusion is the paper's headline).
    mode 'hard': convert each model's argmax map; majority vote; disagreement
        (< min_agree, default strict majority) -> ignore; confidence =
        agreeing fraction.
    Returns (label int32 [B,H,W] with ignore where thresholded, conf f32).
    """
    if len(logits_list) != len(conversions) or not logits_list:
        raise ValueError("need N>=1 matching logits/conversion pairs")
    n_models = len(logits_list)
    t = int(conversions[0].shape[1]) - 1
    if num_target is not None and num_target != t:
        raise ValueError(f"conversion target dim {t} != num_target {num_target}")

    if mode == "soft":
        acc = None
        for logits, mat in zip(logits_list, conversions):
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            q = convert_probs(p, mat)
            acc = q if acc is None else acc + q
        fused = acc / n_models  # [B,H,W,T+1]
        target_probs = fused[..., :t]
        label = jnp.argmax(target_probs, axis=-1).astype(jnp.int32)
        conf = jnp.max(target_probs, axis=-1)
    elif mode == "hard":
        votes = None
        for logits, mat in zip(logits_list, conversions):
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            q = convert_probs(p, mat)
            lab_m = jnp.argmax(q, axis=-1)  # may be t (=ignore column)
            onehot = jax.nn.one_hot(lab_m, t, dtype=jnp.float32)  # t -> all-zero
            votes = onehot if votes is None else votes + onehot
        label = jnp.argmax(votes, axis=-1).astype(jnp.int32)
        top = jnp.max(votes, axis=-1)
        need = min_agree if min_agree is not None else (n_models // 2 + 1)
        conf = top / n_models
        label = jnp.where(top >= need, label, ignore_label)
    else:
        raise ValueError(f"unknown fusion mode '{mode}'")

    if kc is not None:
        kc_arr = jnp.broadcast_to(jnp.asarray(kc, jnp.float32), (t,))
        safe = jnp.where(label == ignore_label, 0, label)
        thr = kc_arr[safe]
        label = jnp.where(conf >= thr, label, ignore_label)

    return label, conf


def generate_pseudo_labels(
    sources: Sequence[SourceModel],
    loader,
    mode: str = "soft",
    kc: Optional[np.ndarray] = None,
    normalize_fn: Optional[Callable] = None,
    ignore_label: int = IGNORE_LABEL,
    use_pallas: bool = False,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sweep a target-image loader; return (labels [N,H,W] int32,
    confidences [N,H,W] f32, indices [N]) for the whole set, in loader order.

    The per-batch pass (model forwards + fusion + threshold) is one jitted
    program; only final uint8/float maps return to host memory.  With `mesh`,
    batches are sharded over the mesh `data` axis (data-parallel generation
    across the slice — SURVEY.md §3.2 hot loop, BASELINE.json:5 "pmap DP").
    """
    from mspl_tpu.data.transforms import normalize as default_normalize

    norm = normalize_fn or default_normalize
    conversions = [s.conversion for s in sources]
    kc_dev = None if kc is None else jnp.asarray(kc, jnp.float32)

    channel_major = any(s.channel_major for s in sources)
    if channel_major and not all(s.channel_major for s in sources):
        raise ValueError("all sources must agree on channel_major")
    if channel_major and mode != "soft":
        raise ValueError("channel_major sources support soft fusion only")

    if channel_major:
        from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_soft_cm

        def pass_fn(logits_list):
            return fused_pseudo_soft_cm(
                logits_list, conversions, kc=kc_dev,
                ignore_label=ignore_label,
            )
    elif use_pallas:
        from mspl_tpu.ops.pallas_pseudo import fused_pseudo_pass_pallas

        def pass_fn(logits_list):
            return fused_pseudo_pass_pallas(
                logits_list, conversions, mode=mode, kc=kc_dev,
                ignore_label=ignore_label,
            )
    else:
        def pass_fn(logits_list):
            return fused_pseudo_pass(
                logits_list, conversions, mode=mode, kc=kc_dev,
                ignore_label=ignore_label,
            )

    # cast the normalized batch to the models' compute dtype ONCE — feeding
    # fp32 would make every source repeat its own f32->bf16 convert
    dtypes = {s.compute_dtype for s in sources if s.compute_dtype is not None}
    common_dtype = dtypes.pop() if len(dtypes) == 1 else None

    def _pass(imgs8):
        imgs = norm(imgs8)
        if common_dtype is not None:
            imgs = imgs.astype(common_dtype)
        logits_list = [s.apply_fn(imgs) for s in sources]
        return pass_fn(logits_list)

    if mesh is not None:
        # shard_map over the 'data' axis: each device runs the whole pass on
        # its local batch shard — essential for the Pallas kernels, which
        # GSPMD would otherwise all-gather around as opaque custom calls
        from jax.sharding import NamedSharding, PartitionSpec

        try:
            from jax import shard_map as _shard_map

            def shard_map(f, mesh, in_specs, out_specs):
                # check_vma=False: pallas_call outputs carry no varying-
                # mesh-axes annotation
                return _shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_vma=False)
        except ImportError:
            from jax.experimental.shard_map import shard_map as _sm

            def shard_map(f, mesh, in_specs, out_specs):
                return _sm(f, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_rep=False)

        data_sharding = NamedSharding(mesh, PartitionSpec("data"))
        batch_pass = jax.jit(shard_map(
            _pass, mesh,
            in_specs=PartitionSpec("data"),
            out_specs=(PartitionSpec("data"), PartitionSpec("data")),
        ))
    else:
        batch_pass = jax.jit(_pass)

    labels, confs, indices = [], [], []
    for batch in loader:
        imgs = jnp.asarray(batch["image"])
        if mesh is not None:
            imgs = jax.device_put(imgs, data_sharding)
        lab, conf = batch_pass(imgs)
        valid = batch["valid"]
        lab, conf = np.asarray(lab), np.asarray(conf)
        labels.append(lab[valid])
        confs.append(conf[valid])
        indices.append(batch["index"][valid])
    return (
        np.concatenate(labels, axis=0),
        np.concatenate(confs, axis=0),
        np.concatenate(indices, axis=0),
    )
