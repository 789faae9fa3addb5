"""Flat-buffer packing of large pytrees for dispatch-boundary crossings.

Why this exists (measured, r2): every argument/output buffer of a jitted
call costs per-dispatch runtime overhead — on this environment's remote-TPU
tunnel it fluctuates between ~10 us and ~1.4 ms PER LEAF with server load.
The 756-leaf `TrainState` (params + batch_stats + optimizer state) paid
1-3 s of pure dispatch overhead per train step, swamping the ~160 ms of
device compute; a toy `+1`-over-state chain reproduced it (1056 ms/call)
while the same leaves concatenated into one buffer ran at ~4 ms/call.

The same effect exists (much smaller) on any PJRT runtime: per-buffer
bookkeeping scales with leaf count, and production JAX training loops at
scale thread donated monolithic buffers for exactly this reason.

`StatePacker` groups a pytree's array leaves BY DTYPE into one contiguous
1-D buffer per dtype (no casting — mixed int/float states round-trip
bit-exactly, unlike `jax.flatten_util.ravel_pytree` which promotes).  The
packed form is a dict {dtype_name: 1-D array}; `pack`/`unpack` are pure
jax functions, safe inside jit, where XLA reduces them to cheap
slice/reshape/concat ops (~2x state bytes of HBM traffic — the state is
~6 MB, noise next to a training step).

Typical use (see `engine/train.py::make_train_step(packed=...)`):

    packer = StatePacker(state)
    packed = jax.jit(packer.pack)(state)        # one-time, off the hot path
    packed, metrics = packed_step(packed, batch, rng)   # ~3 leaves/dispatch
    state = jax.jit(packer.unpack)(packed)      # for checkpoint/eval edges
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class StatePacker:
    """Bit-exact pytree <-> {dtype: flat 1-D buffer} converter.

    Built from an example tree; `pack`/`unpack` then accept/produce trees
    of the same structure and leaf shapes/dtypes.  Python scalar leaves
    (e.g. a flax `TrainState.step` created as int 0) are canonicalized to
    arrays via `jnp.asarray`, so a packed round trip returns arrays where
    scalars went in — semantically equivalent under jit.
    """

    def __init__(self, example_tree: Any):
        leaves, self._treedef = jax.tree_util.tree_flatten(example_tree)
        arrs = [jnp.asarray(l) for l in leaves]
        self._shapes: List[Tuple[int, ...]] = [a.shape for a in arrs]
        self._dtypes = [a.dtype for a in arrs]
        # stable dtype order: first appearance in leaf order
        self._dtype_names: List[str] = []
        for d in self._dtypes:
            if d.name not in self._dtype_names:
                self._dtype_names.append(d.name)
        # per-leaf (buffer key, offset, size)
        self._slots: List[Tuple[str, int, int]] = []
        sizes: Dict[str, int] = {n: 0 for n in self._dtype_names}
        for a in arrs:
            n = a.dtype.name
            self._slots.append((n, sizes[n], int(np.prod(a.shape, dtype=np.int64))))
            sizes[n] += self._slots[-1][2]
        self._sizes = sizes

    @property
    def n_leaves(self) -> int:
        return len(self._slots)

    @property
    def n_buffers(self) -> int:
        return len(self._dtype_names)

    def pack(self, tree: Any) -> Dict[str, jnp.ndarray]:
        leaves = jax.tree_util.tree_leaves(tree)
        if len(leaves) != len(self._slots):
            raise ValueError(
                f"tree has {len(leaves)} leaves, packer built for "
                f"{len(self._slots)}")
        parts: Dict[str, list] = {n: [] for n in self._dtype_names}
        for leaf, dt in zip(leaves, self._dtypes):
            a = jnp.asarray(leaf)
            if a.dtype != dt:
                raise ValueError(f"leaf dtype {a.dtype} != packer dtype {dt}")
            parts[a.dtype.name].append(a.reshape(-1))
        return {n: (jnp.concatenate(ps) if len(ps) > 1 else ps[0])
                for n, ps in parts.items()}

    def unpack(self, packed: Dict[str, jnp.ndarray]) -> Any:
        leaves = []
        for (name, off, size), shape, dt in zip(
                self._slots, self._shapes, self._dtypes):
            buf = packed[name]
            leaves.append(jax.lax.slice(buf, (off,), (off + size,))
                          .reshape(shape).astype(dt))
        return jax.tree_util.tree_unflatten(self._treedef, leaves)
