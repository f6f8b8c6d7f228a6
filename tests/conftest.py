import os

# The sandbox globally sets JAX_PLATFORMS=axon (remote TPU tunnel) — tests
# must run on local CPU with 8 virtual devices for sharding coverage.
# Device->host transfers over the tunnel are ~seconds each; CPU is also the
# only way to simulate an 8-device mesh.
# GINGERLIB_TEST_TPU=1 overrides: run the selected tests on the real chip
# (e.g. the 753-bit device-prove equality test, which compiles in minutes
# on the TPU service vs hours on this box's XLA:CPU).
_ON_TPU = os.environ.get("GINGERLIB_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    # The sandbox has ONE cpu core: XLA:CPU's LLVM pipeline compiles our
    # big integer graphs at ~50 HLO/s with full optimization.  Disabling
    # most optimizations is ~10x faster to compile and plenty fast to run
    # for tests.
    jax.config.update("jax_disable_most_optimizations", True)
# persistent compilation cache: big scan-heavy graphs (inv/sqrt/pairing)
# compile once across test runs.  GINGERLIB_TEST_NOCACHE=1 disables it —
# loading some cached executables segfaults jax 0.9.0's cache reader on
# this box (observed round 5: get_executable_and_time SIGSEGV), so a
# crashing test run should be retried with the cache off.
if os.environ.get("GINGERLIB_TEST_NOCACHE") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gingerlib_jax_cache_bench" if _ON_TPU
                      else "/tmp/gingerlib_jax_cache2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
