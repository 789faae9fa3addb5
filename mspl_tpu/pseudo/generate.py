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

import os
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

    apply_vars_fn/variables: the same forward with the weights SPLIT OUT
    (`apply_vars_fn(variables, imgs)`), populated by `make_source`.  A
    `PseudoLabelGenerator(params_as_args=True)` feeds `variables` as jit
    ARGUMENTS instead of baking them into the traced program as constants,
    so swapping in new weights of the same shapes (self-training rounds)
    reuses the compiled program instead of paying a ~31 s retrace+re-load
    per round through a remote-TPU tunnel (VERDICT r4 item 3).
    """

    name: str
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray]
    conversion: np.ndarray
    channel_major: bool = False
    compute_dtype: Optional[object] = None
    # input channels this model's stem consumes; an RGB-D target batch
    # ([B,H,W,4]) is sliced to [..., :in_channels] before apply, so RGB
    # sources and a 4-channel target model share one ensemble batch
    # (SURVEY.md §2 "Dataset: Greenhouse" RGB(-D))
    in_channels: int = 3
    apply_vars_fn: Optional[Callable[[object, jnp.ndarray], jnp.ndarray]] = None
    variables: Optional[object] = None


_AUTO = object()


def make_source(name: str, model, variables, src_dataset: str,
                num_target: int = 3, channel_major: bool = False,
                in_channels: int = 3,
                conversion: Optional[np.ndarray] = None,
                compute_dtype=_AUTO) -> SourceModel:
    """Wrap a flax segmentation model + trained variables as a SourceModel.

    channel_major=True requests [B,C,H,W] logits: models that support
    `channel_major_logits` emit them at zero cost; others get an explicit
    transpose appended.  `conversion` overrides the registry lookup for
    `src_dataset` (e.g. the self-training target model's identity matrix).
    `compute_dtype` defaults to the model's own; pass None to exclude this
    source from the engine's shared input-cast vote (the self-training
    target member does this so a non-bf16 target never disables the
    one-shot bf16 cast the bf16 sources share)."""
    import dataclasses as _dc
    import functools

    if channel_major and hasattr(model, "channel_major_logits"):
        model = _dc.replace(model, channel_major_logits=True)

        def apply_vars_fn(v, imgs):
            return model.apply(v, imgs, train=False)
    elif channel_major:
        def apply_vars_fn(v, imgs):
            out = model.apply(v, imgs, train=False)
            return jnp.transpose(out, (0, 3, 1, 2))
    else:
        def apply_vars_fn(v, imgs):
            return model.apply(v, imgs, train=False)

    return SourceModel(
        name=name,
        apply_fn=functools.partial(apply_vars_fn, variables),
        conversion=(conversion if conversion is not None
                    else label_conversion_matrix(src_dataset, num_target)),
        channel_major=channel_major,
        compute_dtype=(getattr(model, "compute_dtype", None)
                       if compute_dtype is _AUTO else compute_dtype),
        in_channels=in_channels,
        apply_vars_fn=apply_vars_fn,
        variables=variables,
    )


def _source_input(imgs: jnp.ndarray, s: SourceModel) -> jnp.ndarray:
    """Slice a (possibly RGB-D) normalized batch to the channels `s` eats."""
    if imgs.shape[-1] > s.in_channels:
        return imgs[..., : s.in_channels]
    return imgs


def convert_probs(probs: jnp.ndarray, conversion: jnp.ndarray) -> jnp.ndarray:
    """Pool source-space probabilities into the target space (matmul)."""
    return jnp.einsum(
        "...s,st->...t", probs, jnp.asarray(conversion, probs.dtype)
    )


def entropy_confidence(dist: jnp.ndarray) -> jnp.ndarray:
    """conf = 1 - H(dist)/ln(K) over the last axis (normalized anti-entropy).

    `dist` is a probability distribution over K outcomes; the result lands in
    [0, 1] (1 = one-hot certainty, 0 = uniform), so the CBST histogram /
    quantile machinery (mspl_tpu/pseudo/cbst.py, bins over [0,1]) applies to
    entropy confidences unchanged.
    """
    d = dist.astype(jnp.float32)
    xlogx = jnp.where(d > 0, d * jnp.log(jnp.maximum(d, 1e-30)), 0.0)
    h = -jnp.sum(xlogx, axis=-1)
    k = dist.shape[-1]
    return 1.0 - h / float(np.log(k))


def _soft_epilogue(fused, t, conf_mode, ignore_label):
    """(label, conf) from the averaged converted distribution [...,T+1]."""
    target_probs = fused[..., :t]
    label = jnp.argmax(target_probs, axis=-1).astype(jnp.int32)
    if conf_mode == "entropy":
        conf = entropy_confidence(fused)
    else:
        conf = jnp.max(target_probs, axis=-1)
    return label, conf


def _hard_epilogue(votes, n_models, min_agree, conf_mode, ignore_label):
    """(label, conf) from summed one-hot votes [...,T]."""
    label = jnp.argmax(votes, axis=-1).astype(jnp.int32)
    top = jnp.max(votes, axis=-1)
    need = min_agree if min_agree is not None else (n_models // 2 + 1)
    if conf_mode == "entropy":
        ig_votes = n_models - jnp.sum(votes, axis=-1, keepdims=True)
        dist = jnp.concatenate([votes, ig_votes], axis=-1) / n_models
        conf = entropy_confidence(dist)
    else:
        conf = top / n_models
    label = jnp.where(top >= need, label, ignore_label)
    return label, conf


def _apply_kc(label, conf, kc, t, ignore_label):
    if kc is None:
        return label, conf
    kc_arr = jnp.broadcast_to(jnp.asarray(kc, jnp.float32), (t,))
    safe = jnp.where(label == ignore_label, 0, label)
    thr = kc_arr[safe]
    label = jnp.where(conf >= thr, label, ignore_label)
    return label, conf


def fused_pseudo_pass(
    logits_list: Sequence[jnp.ndarray],
    conversions: Sequence[jnp.ndarray],
    mode: str = "soft",
    kc: Optional[jnp.ndarray] = None,
    num_target: Optional[int] = None,
    min_agree: Optional[int] = None,
    ignore_label: int = IGNORE_LABEL,
    conf_mode: str = "prob",
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
    conf_mode selects the confidence family of the reference's
    "confidence/entropy thresholding" sentence (BASELINE.json:5):
    'prob' = the max-probability confidences above; 'entropy' = normalized
    anti-entropy 1 - H/ln(T+1) of the full fused target-space distribution
    (soft: the averaged converted probabilities incl. the ignore column;
    hard: the vote distribution with abstentions counted as ignore votes).
    Returns (label int32 [B,H,W] with ignore where thresholded, conf f32).
    """
    if len(logits_list) != len(conversions) or not logits_list:
        raise ValueError("need N>=1 matching logits/conversion pairs")
    if conf_mode not in ("prob", "entropy"):
        raise ValueError(f"unknown conf_mode '{conf_mode}'")
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
        label, conf = _soft_epilogue(acc / n_models, t, conf_mode,
                                     ignore_label)
    elif mode == "hard":
        votes = None
        for logits, mat in zip(logits_list, conversions):
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            q = convert_probs(p, mat)
            lab_m = jnp.argmax(q, axis=-1)  # may be t (=ignore column)
            onehot = jax.nn.one_hot(lab_m, t, dtype=jnp.float32)  # t -> all-zero
            votes = onehot if votes is None else votes + onehot
        label, conf = _hard_epilogue(votes, n_models, min_agree, conf_mode,
                                     ignore_label)
    else:
        raise ValueError(f"unknown fusion mode '{mode}'")

    return _apply_kc(label, conf, kc, t, ignore_label)


def fused_pseudo_soft_decoder_res(
    logits_cm: Sequence[jnp.ndarray],
    conversions: Sequence[np.ndarray],
    out_hw: Tuple[int, int],
    kc: Optional[jnp.ndarray] = None,
    ignore_label: int = IGNORE_LABEL,
    conf_mode: str = "prob",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft fusion at DECODER resolution (r5 opt-in approximation).

    The ESPNetv2 decoder emits logits at (H/2, W/2) and the exact pipeline
    bilinearly upsamples EVERY model's C_src logits to input resolution
    before softmax (reference semantics).  This variant softmaxes,
    label-space-converts and fuses at the decoder resolution — 1/4 of the
    pixels, and channel-major [B, C, h, w] from `final_resize=False`
    models — then upsamples only the fused (T+1)-channel distribution.
    Bilinear interpolation is a convex combination, so the upsampled
    fused map remains a probability distribution; the label/confidence
    epilogue at full resolution is unchanged.

    Differs from the exact pipeline only where interpolation and softmax
    fail to commute — class-boundary pixels.  MEASURED (r5, recorded
    near-wash, kept as the experiment): +0.8% img/s and 99.00% per-pixel
    label agreement — below the 99.5% gate — because the exact path's
    full-res fusion runs in the hand-tuned CM Pallas kernel while this
    variant is plain-XLA einsums (BASELINE.md r5 "Decoder-resolution
    fusion").  Production defaults stay exact.
    """
    if not logits_cm or len(logits_cm) != len(conversions):
        raise ValueError("need N>=1 matching logits/conversion pairs")
    if conf_mode not in ("prob", "entropy"):
        raise ValueError(f"unknown conf_mode '{conf_mode}'")
    from mspl_tpu.ops.resize import resize_bilinear_cm

    t = int(conversions[0].shape[1]) - 1
    acc = None
    for lg, mat in zip(logits_cm, conversions):
        p = jax.nn.softmax(lg.astype(jnp.float32), axis=1)
        q = jnp.einsum("bchw,ct->bthw", p,
                       jnp.asarray(mat, jnp.float32))
        acc = q if acc is None else acc + q
    fused = acc / len(logits_cm)  # [B, T+1, h, w]
    up = resize_bilinear_cm(fused, out_hw, align_corners=True)
    tgt = up[:, :t]
    label = jnp.argmax(tgt, axis=1).astype(jnp.int32)
    if conf_mode == "entropy":
        d = jnp.maximum(up, 1e-30)
        h_ent = -jnp.sum(jnp.where(up > 0, up * jnp.log(d), 0.0), axis=1)
        conf = 1.0 - h_ent / float(np.log(t + 1))
    else:
        conf = jnp.max(tgt, axis=1)
    return _apply_kc(label, conf, kc, t, ignore_label)


class PseudoLabelGenerator:
    """The pseudo-label engine with its compiled program built ONCE.

    `generate_pseudo_labels` constructs a fresh one per call, which re-traces
    and re-loads the jitted pass (3 source forwards + fused pass) onto the
    device every time — measured at ~31 s/call through this environment's
    remote-TPU tunnel even with a hot persistent compilation cache, vs 1.8 s
    for the 512-image PNG decode it wraps (r4 probe; BASELINE.md
    "Disk-backed end-to-end").  A long-lived service or a multi-sweep job
    (bench.py --io, repeated evaluation sweeps) must build this object once
    and call it per sweep; each call then costs only decode + h2d + the
    per-batch dispatches.

    Construction args match `generate_pseudo_labels`; `__call__` takes the
    loader and the per-sweep `return_device` flag.

    params_as_args=True feeds each source's `variables` as jit ARGUMENTS
    (not baked constants), so `set_variables(i, new_vars)` — same shapes,
    new weights, e.g. the fine-tuned target model each self-training
    round — reuses the compiled program instead of paying a full
    retrace+re-load (~31 s/round through a remote-TPU tunnel; VERDICT r4
    item 3).  `trace_count` exposes how many times the pass was traced."""

    def __init__(
        self,
        sources: Sequence[SourceModel],
        mode: str = "soft",
        kc: Optional[np.ndarray] = None,
        normalize_fn: Optional[Callable] = None,
        ignore_label: int = IGNORE_LABEL,
        use_pallas: bool = False,
        mesh=None,
        conf_mode: str = "prob",
        min_agree: Optional[int] = None,
        params_as_args: bool = False,
    ):
        self.sources = sources
        self.mesh = mesh
        self._params_as_args = params_as_args
        # device_put once: checkpoint-loaded / device_get'd variables are
        # host numpy pytrees, and jit RE-TRANSFERS numpy arguments on every
        # call — per-BATCH weight uploads through a slow tunnel would dwarf
        # the retrace this class exists to avoid.  No-op for arrays already
        # on device.
        self._vars = (jax.device_put(tuple(s.variables for s in sources))
                      if params_as_args else ())
        self._batch_pass, self._data_sharding, self._trace_counter = \
            _build_batch_pass(
                sources, mode, kc, normalize_fn, ignore_label, use_pallas,
                mesh, conf_mode, min_agree, params_as_args=params_as_args)

    @property
    def trace_count(self) -> int:
        """Number of times the per-batch pass has been (re)traced."""
        return self._trace_counter[0]

    def set_variables(self, i: int, variables) -> None:
        """Swap source i's weights for the next sweeps.  Shapes/dtypes must
        match the originals or the next call retraces (defeating reuse)."""
        if not self._params_as_args:
            raise ValueError(
                "set_variables requires params_as_args=True (weights are "
                "baked into the compiled program otherwise)")
        v = list(self._vars)
        v[i] = jax.device_put(variables)  # host pytrees would re-upload
        self._vars = tuple(v)             # on every per-batch call


    def _prefetched(self, loader):
        """Iterate (host_batch, device_images) with ONE batch of h2d
        lookahead: batch k+1's transfer is issued before batch k's result
        is consumed, so the (async) PJRT transfer overlaps device compute
        instead of serializing with it — the device-side analog of the
        loader's producer thread.  Costs one extra input batch of HBM
        (uint8, ~47 MB at the production shape).  Measured on the
        disk-backed sweep: BASELINE.md "Disk-backed end-to-end".

        MSPL_PSEUDO_PREFETCH=0 disables the lookahead (read per call, not
        at import) — kept for A/B measurement on the live tunnel, whose
        transfer behavior varies with load."""
        data_sharding = self._data_sharding

        def put(b):
            if self.mesh is not None:
                return jax.device_put(b["image"], data_sharding)
            return jax.device_put(b["image"])

        it = iter(loader)
        if os.environ.get("MSPL_PSEUDO_PREFETCH", "1") == "0":
            for cur in it:
                yield cur, put(cur)
            return
        try:
            cur = next(it)
        except StopIteration:
            return
        cur_dev = put(cur)
        for nxt in it:
            nxt_dev = put(nxt)
            yield cur, cur_dev
            cur, cur_dev = nxt, nxt_dev
        yield cur, cur_dev

    def __call__(self, loader, return_device: bool = False):
        """One sweep: (labels, confidences, indices) — semantics identical
        to `generate_pseudo_labels` (see its docstring for the contract,
        the return_device fetch discipline, and the mesh behavior).

        MSPL_PSEUDO_PIPELINE=1 runs host-path sweeps TWO-DEEP on the
        dispatch side (VERDICT r4 item 7): batch k+1's compute is
        dispatched before batch k's results are fetched, so the device
        never idles on a host fetch.  Identical arrays come back in
        identical order — the reordering is invisible except in wall
        time.  Default OFF: through this environment's remote-TPU tunnel
        the two-deep order measured ~20% SLOWER in both A/B orderings
        (tools/exp_pipeline.py; BASELINE.md r5 — a pending d2h fetch and
        an in-flight dispatch appear to serialize badly in the relay);
        on a locally-attached TPU the overlap is the standard pattern —
        set =1 there."""
        batch_pass = self._batch_pass
        var_list = self._vars
        labels, confs, indices = [], [], []

        def _consume(batch, lab, conf):
            valid = batch["valid"]
            lab = np.asarray(lab).astype(np.int32)
            conf = np.asarray(conf)
            labels.append(lab[valid])
            confs.append(conf[valid])
            indices.append(batch["index"][valid])

        pipeline = os.environ.get("MSPL_PSEUDO_PIPELINE", "0") == "1"
        pending = None
        for batch, imgs in self._prefetched(loader):
            lab, conf = batch_pass(imgs, var_list)
            if return_device:
                # loader pads only the tail batch, always as a suffix, so
                # the valid rows are the prefix — a static device-side
                # slice.  Guard the layout assumption (ADVICE r3): a loader
                # change that interleaves invalid rows would silently
                # mislabel images here.
                valid = batch["valid"]
                nv = int(valid.sum())
                assert valid[:nv].all(), (
                    "PseudoLabelGenerator(return_device=True) requires "
                    "suffix-only batch padding (valid rows as a prefix)")
                labels.append(lab if nv == lab.shape[0] else lab[:nv])
                confs.append(conf if nv == conf.shape[0] else conf[:nv])
                indices.append(batch["index"][:nv])
                continue
            if not pipeline:
                _consume(batch, lab, conf)
                continue
            if pending is not None:
                _consume(*pending)
            pending = (batch, lab, conf)
        if pending is not None:
            _consume(*pending)
        if return_device:
            return (
                jnp.concatenate(labels, axis=0),
                jnp.concatenate(confs, axis=0),
                np.concatenate(indices, axis=0),
            )
        return (
            np.concatenate(labels, axis=0),
            np.concatenate(confs, axis=0),
            np.concatenate(indices, axis=0),
        )


def generate_pseudo_labels(
    sources: Sequence[SourceModel],
    loader,
    mode: str = "soft",
    kc: Optional[np.ndarray] = None,
    normalize_fn: Optional[Callable] = None,
    ignore_label: int = IGNORE_LABEL,
    use_pallas: bool = False,
    mesh=None,
    conf_mode: str = "prob",
    min_agree: Optional[int] = None,
    return_device: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sweep a target-image loader; return (labels [N,H,W] int32,
    confidences [N,H,W] f32, indices [N]) for the whole set, in loader order.

    return_device=True keeps the whole result set ON DEVICE (BASELINE.json:5
    "labels stay on-device for the fine-tune step"): labels come back as a
    uint8 jax.Array and confidences as a float32 jax.Array; only the int32
    `indices` is a host array.  The CBST kc sweep and re-threshold then run
    on device too (pseudo/self_training.py), so per-pixel data crosses the
    host boundary exactly ONCE per round — the final thresholded uint8
    labels — instead of labels+confidence per batch (8 bytes/px -> 1 byte/px;
    through this environment's remote-TPU tunnel that is the difference
    between a fetch-bound and a compute-bound round, see BASELINE.md
    "Disk-backed end-to-end").  Values are bit-identical to the host path.

    The per-batch pass (model forwards + fusion + threshold) is one jitted
    program; only final uint8/float maps return to host memory.  With `mesh`,
    batches are sharded over the mesh `data` axis (data-parallel generation
    across the slice — SURVEY.md §3.2 hot loop, BASELINE.json:5 "pmap DP").

    When the mesh also has a `model` axis of size M>1, the source networks
    are placed ACROSS that axis (SURVEY.md §2 parallelism table
    "source-model parallelism"): model-axis slice i runs sources[i::M] on
    its local data shard (`lax.switch` on `axis_index('model')` — every
    device executes only its own group's forwards) and the fusion reduction
    is a `psum` over the `model` axis riding ICI.  Output is bit-identical
    to the serial path; `use_pallas` is ignored here (the fused Pallas
    kernels operate on all N logit stacks at once, which no longer exist on
    any single device — the per-device epilogue is plain XLA).

    Epilogue cost, MEASURED (tools/bench_epilogue.py, r3, batch 128 at
    256x480, T=3, one v5e chip; isolated numbers include ~0.87 ms dispatch):
    one source's softmax+convert 7.48 ms + post-psum argmax/conf/kc 6.09 ms
    = ~13.6 ms/device/batch under model parallelism, vs 9.91 ms for the
    fused cm kernel doing ALL three models on one device (15.45 ms jnp).
    The model-axis split therefore trades ~+3.7 ms of epilogue against
    ~-50 ms of forwards moved off-device per batch (each forward ~25 ms of
    the 88.8 ms serial batch) — the plain-XLA epilogue stands; a local
    fused kernel could reclaim at most ~4 ms of the 13.6.

    NOTE: every call builds (traces, loads) a fresh compiled program.  For
    repeated sweeps with the same sources, build a `PseudoLabelGenerator`
    once and call it per sweep — through a remote-TPU tunnel the per-call
    rebuild costs ~31 s (BASELINE.md "Disk-backed end-to-end").
    """
    gen = PseudoLabelGenerator(
        sources, mode=mode, kc=kc, normalize_fn=normalize_fn,
        ignore_label=ignore_label, use_pallas=use_pallas, mesh=mesh,
        conf_mode=conf_mode, min_agree=min_agree)
    return gen(loader, return_device=return_device)


def _build_batch_pass(sources, mode, kc, normalize_fn, ignore_label,
                      use_pallas, mesh, conf_mode, min_agree,
                      params_as_args=False):
    """Construct the jitted per-batch pass (normalize → N source forwards →
    fused conversion/fusion/threshold), optionally shard_map'd over the mesh
    `data` axis.  Returns (batch_pass, data_sharding-or-None, trace_counter)
    where trace_counter is a 1-element list incremented on every (re)trace.
    Split out of `generate_pseudo_labels` so `PseudoLabelGenerator` can hold
    the compiled program across sweeps.

    params_as_args=True makes the pass take `(imgs_u8, var_list)` — one
    variables pytree per source, fed as jit ARGUMENTS — so new weights of
    the same shapes reuse the compiled program (VERDICT r4 item 3; the
    self-training round loop swaps target weights every round).  False
    bakes the weights into the program as constants (the one-shot
    `cmd_pseudo` path, where XLA constant-folding can specialize)."""
    from mspl_tpu.data.transforms import normalize as default_normalize

    norm = normalize_fn or default_normalize
    conversions = [s.conversion for s in sources]
    kc_dev = None if kc is None else jnp.asarray(kc, jnp.float32)
    if mode not in ("soft", "hard"):
        raise ValueError(f"unknown fusion mode '{mode}'")

    model_par = (mesh is not None and "model" in mesh.shape
                 and mesh.shape["model"] > 1)

    channel_major = any(s.channel_major for s in sources)
    if channel_major and not all(s.channel_major for s in sources):
        raise ValueError("all sources must agree on channel_major")

    if model_par:
        pass_fn = None  # fusion is a cross-'model' collective, built below
    elif channel_major:
        from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_cm

        def pass_fn(logits_list):
            return fused_pseudo_cm(
                logits_list, conversions, kc=kc_dev, mode=mode,
                ignore_label=ignore_label, conf_mode=conf_mode,
                min_agree=min_agree,
            )
    elif use_pallas:
        from mspl_tpu.ops.pallas_pseudo import fused_pseudo_pass_pallas

        def pass_fn(logits_list):
            return fused_pseudo_pass_pallas(
                logits_list, conversions, mode=mode, kc=kc_dev,
                ignore_label=ignore_label, conf_mode=conf_mode,
                min_agree=min_agree,
            )
    else:
        def pass_fn(logits_list):
            return fused_pseudo_pass(
                logits_list, conversions, mode=mode, kc=kc_dev,
                ignore_label=ignore_label, conf_mode=conf_mode,
                min_agree=min_agree,
            )

    # cast the normalized batch to the models' compute dtype ONCE — feeding
    # fp32 would make every source repeat its own f32->bf16 convert
    dtypes = {s.compute_dtype for s in sources if s.compute_dtype is not None}
    common_dtype = dtypes.pop() if len(dtypes) == 1 else None

    t = int(conversions[0].shape[1]) - 1
    n_models = len(sources)
    trace_counter = [0]

    if params_as_args:
        missing = [s.name for s in sources
                   if s.apply_vars_fn is None or s.variables is None]
        if missing:
            raise ValueError(
                "params_as_args requires apply_vars_fn+variables on every "
                f"source (make_source populates them); missing on {missing}")

    def _forward(s, var, imgs):
        x = _source_input(imgs, s)
        return s.apply_vars_fn(var, x) if params_as_args else s.apply_fn(x)

    if model_par:
        m_size = mesh.shape["model"]
        groups = [list(range(len(sources)))[i::m_size] for i in range(m_size)]

        def _group_branch(idxs):
            # partial fusion statistic for one model-axis slice: sum of
            # converted probability maps (soft) / one-hot votes (hard)
            def branch(operand):
                x, var_list = operand
                width = (t + 1) if mode == "soft" else t
                acc = jnp.zeros(x.shape[:3] + (width,), jnp.float32)
                for i in idxs:
                    s = sources[i]
                    lg = _forward(s, var_list[i] if params_as_args else None,
                                  x)
                    if s.channel_major:
                        lg = jnp.transpose(lg, (0, 2, 3, 1))
                    p = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
                    q = convert_probs(p, s.conversion)
                    if mode == "soft":
                        acc = acc + q
                    else:
                        lab_m = jnp.argmax(q, axis=-1)
                        acc = acc + jax.nn.one_hot(lab_m, t, dtype=jnp.float32)
                return acc
            return branch

        def _pass(imgs8, var_list):
            trace_counter[0] += 1
            imgs = norm(imgs8)
            if common_dtype is not None:
                imgs = imgs.astype(common_dtype)
            midx = jax.lax.axis_index("model")
            part = jax.lax.switch(
                midx, [_group_branch(g) for g in groups], (imgs, var_list))
            total = jax.lax.psum(part, "model")
            if mode == "soft":
                label, conf = _soft_epilogue(total / n_models, t, conf_mode,
                                             ignore_label)
            else:
                label, conf = _hard_epilogue(total, n_models, min_agree,
                                             conf_mode, ignore_label)
            return _apply_kc(label, conf, kc_dev, t, ignore_label)
    else:
        def _pass(imgs8, var_list):
            trace_counter[0] += 1
            imgs = norm(imgs8)
            if common_dtype is not None:
                imgs = imgs.astype(common_dtype)
            logits_list = [
                _forward(s, var_list[i] if params_as_args else None, imgs)
                for i, s in enumerate(sources)]
            return pass_fn(logits_list)

    # Fetch labels as uint8: device->host transfers of s32 arrays run at
    # ~1 MB/s through the axon remote-TPU tunnel vs ~25 MB/s for u8 (r3
    # measurement: one [128,256,480] int32 label batch took 72 s to fetch,
    # the same data as uint8 0.6 s).  Labels always fit u8 here (T <= 20
    # classes, ignore 255); the host re-widens to the public int32
    # contract.  On locally-attached TPUs this is still a 4x DMA saving.
    fetch_u8 = t <= 255 and 0 <= ignore_label <= 255
    _pass_inner = _pass

    if fetch_u8:
        def _pass(imgs8, var_list):
            lab, conf = _pass_inner(imgs8, var_list)
            return lab.astype(jnp.uint8), conf

    if mesh is not None:
        # shard_map over the 'data' axis: each device runs the whole pass on
        # its local batch shard — essential for the Pallas kernels, which
        # GSPMD would otherwise all-gather around as opaque custom calls.
        # Variables are replicated (PartitionSpec()).
        from jax.sharding import NamedSharding, PartitionSpec

        from mspl_tpu.parallel.mesh import shard_map_compat

        data_sharding = NamedSharding(mesh, PartitionSpec("data"))
        batch_pass = jax.jit(shard_map_compat(
            _pass, mesh,
            in_specs=(PartitionSpec("data"), PartitionSpec()),
            out_specs=(PartitionSpec("data"), PartitionSpec("data")),
        ))
    else:
        data_sharding = None
        batch_pass = jax.jit(_pass)

    return batch_pass, data_sharding, trace_counter
