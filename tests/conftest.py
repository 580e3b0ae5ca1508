"""Test harness: emulate an 8-device TPU mesh on CPU.

Multi-chip hardware is not available in CI; the standard JAX idiom is a
virtual CPU device mesh — XLA collectives (psum/all_gather/ppermute) run
for real on CPU, so sharding tests are faithful (SURVEY.md §4.5).

Environment note: this image's ``sitecustomize`` imports jax and registers
the tunneled TPU PJRT plugin before pytest starts, so ``JAX_PLATFORMS`` env
vars set here are too late — but backends initialise lazily, so the config
updates below (before any ``jax.devices()`` call) still win.  Without them
the suite silently runs on the single remote TPU chip: slow dispatch,
bf16-default matmuls, and no 8-device mesh.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Float64 available for solver-precision tests; framework code pins its own
# dtypes (f32/bf16) explicitly, matching TPU production settings.
jax.config.update("jax_enable_x64", True)

# Compiles dominate test wall-clock on this host — cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
