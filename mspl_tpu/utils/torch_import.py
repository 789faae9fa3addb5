"""Torch .pth checkpoint import/export for the flax models.

SURVEY.md §2 row "Pretrained weights": the reference ships ImageNet-pretrained
ESPNetv2 encoders and per-dataset trained segmentation weights as torch
state dicts.  This environment has no network, so the artifacts themselves
cannot be fetched (VERDICT r3 "what's missing" item 4) — but a reference
user migrating to this framework HAS those .pth files.  This module makes
them loadable: a torch state dict whose layout matches the documented
architecture (the torch twins in mspl_tpu/oracle/, built from the survey's
behavioral spec and fp32-parity-gated against the flax models every round)
is converted into a flax variable tree, and the reverse export writes a
state dict the torch twin can run.

CLI surface (mspl_tpu/cli.py):
    python -m mspl_tpu.cli import-torch --pth W.pth --model espnetv2 \
        --num-classes 19 --s 2.0 --dataset cityscapes --out-dir CK
    python -m mspl_tpu.cli export-torch --checkpoint CK --out W.pth
`import-torch` writes a native checkpoint dir (model_best.msgpack + JSON
meta) usable anywhere a trained checkpoint is (--checkpoints, --resume-from
encoder transfer, ...).  `load_model_checkpoint` also accepts a .pth/.pt
path directly when a same-stem JSON meta sidecar exists.

How the mapping is derived (and why there is no per-model table to rot):
the oracle modules already define the authoritative flax->torch transplant
(`load_from_flax`, exercised by the e2e parity gates).  The importer runs
that transplant ONCE on a probe variable tree whose every leaf is filled
with unique random values, then recovers {torch parameter name -> (flax
leaf path, layout transform)} by exact byte matching of the transformed
values (conv kernels are OIHW<->HWIO transposes, everything else identity).
Any flax leaf the transplant does not reach, or any torch tensor that maps
nowhere, fails loudly at import time — the mapping cannot silently drift
from the oracle.

Accepted state-dict envelopes: a bare {name: tensor} dict, or a dict with
a 'state_dict' / 'model' / 'model_state' entry (torch.save checkpoint
convention, e.g. the reference's checkpoint.pth.tar); 'module.' DataParallel
prefixes are stripped; BatchNorm 'num_batches_tracked' counters are ignored.
Twins are RGB-only (in_channels=3) — matching the reference's source-model
weights; RGB-D targets are trained in-framework.

torch is imported lazily; the TPU compute path never touches this module.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

# torch BN bookkeeping buffers with no flax equivalent
_IGNORED_SUFFIXES = ("num_batches_tracked",)


def _build_twin(model_name: str, num_classes: int, s: float = 2.0,
                **twin_kw):
    """Construct the torch twin + its load_from_flax for a registry name."""
    if model_name == "espnetv2":
        from mspl_tpu.oracle import torch_espnetv2 as oracle

        twin = oracle.TESPNetv2Segmentation(num_classes=num_classes, s=s,
                                            **twin_kw)
        return twin, oracle.load_from_flax
    if model_name == "deeplabv3":
        from mspl_tpu.oracle import torch_deeplab as oracle

        twin = oracle.TDeepLabV3(num_classes=num_classes, **twin_kw)
        return twin, oracle.load_from_flax
    raise ValueError(f"no torch twin for model '{model_name}'")


def _probe_variables(target) -> Any:
    """A variables tree with target's structure and UNIQUE random f32 leaves
    (params default-init trees contain many identical constant leaves —
    BN scales are all-ones — which would collide in the byte-match)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(target)
    probes = [
        np.random.default_rng(i).standard_normal(np.shape(leaf)).astype(
            np.float32)
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, probes)


def _to_flax_layout(t: np.ndarray) -> np.ndarray:
    """Inverse of the transplant's layout transform: torch conv OIHW ->
    flax HWIO; 1-D (BN/PReLU/bias) and everything else identity."""
    if t.ndim == 4:
        return np.ascontiguousarray(np.transpose(t, (2, 3, 1, 0)))
    return np.ascontiguousarray(t)


def torch_leaf_map(model_name: str, target, num_classes: int, s: float = 2.0,
                   **twin_kw) -> Dict[str, Tuple]:
    """{torch state_dict name -> flax leaf path} for `target`'s structure,
    derived from the oracle's load_from_flax (see module docstring).
    Raises if any flax leaf is unreachable from the torch side."""
    import jax

    import torch

    twin, load_from_flax = _build_twin(model_name, num_classes, s, **twin_kw)
    # Fill every float tensor with a unique random sentinel BEFORE the
    # transplant: "untouched" is then detected structurally (still equals
    # its sentinel) instead of by comparison with construction defaults —
    # a transplant that writes a fallback value coinciding with the
    # default (e.g. zeros into a zero-init buffer) can no longer be
    # misclassified as dead (ADVICE r4).
    rng = np.random.default_rng(0x5EED)
    with torch.no_grad():
        for name, tensor in twin.state_dict().items():
            if tensor.is_floating_point():
                tensor.copy_(torch.from_numpy(
                    rng.standard_normal(tuple(tensor.shape))
                    .astype(np.float32)))
    before = {name: tensor.detach().numpy().copy()
              for name, tensor in twin.state_dict().items()}
    probe = _probe_variables(target)
    load_from_flax(twin, probe)

    by_bytes = {
        np.asarray(leaf, np.float32).tobytes(): path
        for path, leaf in jax.tree_util.tree_leaves_with_path(probe)
    }
    mapping: Dict[str, Any] = {}
    matched = set()
    for name, tensor in twin.state_dict().items():
        if name.endswith(_IGNORED_SUFFIXES):
            continue
        arr = tensor.detach().numpy()
        key = _to_flax_layout(arr).tobytes()
        path = by_bytes.get(key)
        if path is None:
            # two kinds of twin tensor have no flax home:
            #   "dead"  — the transplant never touched it (a module the
            #             twin constructs but its forward path never uses,
            #             e.g. the DownSampler-EESP's module_act); provably
            #             output-irrelevant (the e2e parity gates pass with
            #             these at construction defaults) -> ignored;
            #   None    — the transplant WROTE a default (the zero-bias
            #             fallback: flax conv has no bias term); a nonzero
            #             incoming value here WOULD change outputs ->
            #             checked in variables_from_state_dict.
            mapping[name] = ("dead" if np.array_equal(arr, before[name])
                             else None)
            continue
        mapping[name] = path
        matched.add(path)
    missing = [p for p in by_bytes.values() if p not in matched]
    if missing:
        raise ValueError(
            f"flax leaves unreachable from the {model_name} torch twin "
            f"(oracle transplant out of sync?): {missing[:5]}"
            + ("..." if len(missing) > 5 else ""))
    return mapping


def unwrap_state_dict(obj) -> Dict[str, Any]:
    """Normalize a torch.load result: unwrap checkpoint envelopes, strip
    DataParallel 'module.' prefixes."""
    sd = obj
    if isinstance(sd, dict):
        for k in ("state_dict", "model_state", "model", "weights"):
            inner = sd.get(k)
            if isinstance(inner, dict) and inner and all(
                    hasattr(v, "shape") for v in inner.values()):
                sd = inner
                break
    if not isinstance(sd, dict):
        raise ValueError("not a state dict (or a recognized checkpoint "
                         f"envelope): {type(obj)}")
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def variables_from_state_dict(model_name: str, state_dict, target,
                              num_classes: int, s: float = 2.0,
                              **twin_kw):
    """Convert a torch state dict into a flax variables tree with `target`'s
    structure/dtypes.  `state_dict` may be any accepted envelope (module
    docstring).  Strictly validated: torch-side key/shape mismatches and
    unreachable flax leaves raise; an unmapped torch tensor with nonzero
    values (information the flax tree cannot hold) raises."""
    import jax
    import jax.numpy as jnp
    import torch

    sd = unwrap_state_dict(state_dict)
    twin, _ = _build_twin(model_name, num_classes, s, **twin_kw)
    # strict-equivalent load with clear errors for foreign checkpoints:
    # only the flax-less BN counters may be absent/extra
    result = twin.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
         if not k.endswith(_IGNORED_SUFFIXES)}, strict=False)
    missing = [k for k in result.missing_keys
               if not k.endswith(_IGNORED_SUFFIXES)]
    if missing or result.unexpected_keys:
        raise ValueError(
            f"state dict does not match the {model_name} architecture: "
            f"missing={missing[:5]} unexpected={result.unexpected_keys[:5]}")

    mapping = torch_leaf_map(model_name, target, num_classes, s, **twin_kw)
    values: Dict[Tuple, np.ndarray] = {}
    for name, tensor in twin.state_dict().items():
        if name.endswith(_IGNORED_SUFFIXES):
            continue
        path = mapping[name]
        if path == "dead":
            continue
        arr = _to_flax_layout(tensor.detach().numpy().astype(np.float32))
        if path is None:
            if np.any(arr != 0):
                raise ValueError(
                    f"torch tensor '{name}' has no flax equivalent and is "
                    "nonzero — importing would drop it (the flax "
                    f"{model_name} has no such parameter)")
            continue
        values[path] = arr

    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for path, old in leaves_paths:
        if path not in values:
            raise ValueError(f"no torch value reached flax leaf {path}")
        new_leaves.append(jnp.asarray(values[path],
                                      dtype=getattr(old, "dtype",
                                                    np.float32)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def export_torch_state_dict(model_name: str, variables, num_classes: int,
                            s: float = 2.0, **twin_kw) -> Dict[str, Any]:
    """flax variables -> torch state dict (the twin's layout) for users
    moving weights back to a torch stack."""
    twin, load_from_flax = _build_twin(model_name, num_classes, s, **twin_kw)
    load_from_flax(twin, variables)
    return twin.state_dict()


# architecture-shaping meta keys forwarded into the model ctor + torch twin
# (ADVICE r4: a meta carrying these was silently ignored, so only
# default-config models could be imported via the CLI/sidecar path)
_ARCH_META_KEYS = {
    "espnetv2": ("dec_base_planes",),
    "deeplabv3": ("stage_blocks", "aspp_features"),
}


def import_torch_checkpoint(path: str, meta: Dict[str, Any]):
    """Load a .pth/.pt checkpoint per `meta` ({'model', 'num_classes',
    's', ...} — the same JSON sidecar schema native checkpoints carry;
    architecture overrides like deeplabv3 stage_blocks/aspp_features are
    honored).  Returns (model, variables, n_torch_tensors) with variables
    in init_model's structure."""
    import jax.numpy as jnp
    import torch

    from mspl_tpu.models import build_segmentation_model, init_model

    if int(meta.get("in_channels", 3)) != 3:
        raise ValueError("torch import supports RGB (3-channel) weights "
                         "only — the reference's source models are RGB")
    arch_kw = {k: (tuple(meta[k]) if isinstance(meta[k], list) else meta[k])
               for k in _ARCH_META_KEYS.get(meta["model"], ())
               if k in meta}
    model = build_segmentation_model(
        meta["model"], num_classes=int(meta["num_classes"]),
        s=float(meta.get("s", 2.0)),
        compute_dtype=jnp.bfloat16 if meta.get("bf16") else jnp.float32,
        **arch_kw)
    hw = tuple(meta.get("input_hw") or (256, 480))
    target = init_model(model, hw)
    obj = torch.load(path, map_location="cpu", weights_only=True)
    variables = variables_from_state_dict(
        meta["model"], obj, target, num_classes=int(meta["num_classes"]),
        s=float(meta.get("s", 2.0)), **arch_kw)
    n_tensors = len(unwrap_state_dict(obj))
    return model, variables, n_tensors
