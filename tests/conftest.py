"""Test harness config: force JAX onto CPU with 8 virtual devices so
multi-device sharding (DP over `data`, source-model parallelism over `model`)
is exercised without TPU hardware (SURVEY.md §4 "Multi-device tests").

The environment's sitecustomize registers the axon TPU PJRT plugin and pins
JAX_PLATFORMS=axon before any conftest runs, so plain env-var overrides are
too late; `jax.config.update('jax_platforms', ...)` after import is the
reliable switch (backends initialize lazily on first device query).

fp32 parity tests vs the torch oracle additionally require
`jax_default_matmul_precision=highest` — at default precision TPU (and the
matching XLA CPU lowering) runs conv/matmul in bf16-class precision, which is
the production fast path but a ~1e-3 relative error vs torch fp32.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
