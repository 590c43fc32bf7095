import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware (the driver separately dry-runs the
# multichip path on real/virtual devices).
#
# Note: this environment pre-imports jax at interpreter start with
# JAX_PLATFORMS=axon (the TPU tunnel), so setting the env var is not
# enough — the already-imported config must be updated before any
# backend client is created.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: the transport while_loop is a large
# graph; caching makes repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# jax is pre-imported in this environment, so the cache env vars above
# are too late for it — set the config values directly too
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + str(jax.devices()))
assert len(jax.devices()) >= 8, (
    "expected >=8 virtual CPU devices for sharding tests")
