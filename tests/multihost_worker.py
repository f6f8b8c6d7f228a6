"""Worker process for the 2-process multi-host test (run by
test_parallel.test_two_process_distributed, one instance per "host").

Initializes jax.distributed from GINGERLIB_* env vars, builds the
process-spanning global mesh, runs one sharded 2->1 Poseidon batch over
it, and prints the result digest so the parent can assert both workers
agree (and match the single-process local value).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_disable_most_optimizations", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/gingerlib_jax_cache2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from gingerlib_tpu.parallel import distributed
    assert distributed.init_from_env() is True, "expected multi-process init"
    idx, cnt = distributed.process_info()
    assert cnt == int(os.environ["GINGERLIB_NUM_PROCESSES"]), (idx, cnt)

    import numpy as np
    import jax.numpy as jnp
    from gingerlib_tpu.fields import fp
    from gingerlib_tpu.primitives.poseidon import PoseidonParams, PoseidonHash
    from gingerlib_tpu.parallel.sharded import sharded_poseidon_2_1
    from jax.sharding import NamedSharding, PartitionSpec as P

    h = PoseidonHash(PoseidonParams.mnt4753())
    mesh = distributed.global_mesh()
    ndev = mesh.shape["data"]
    n = 2 * ndev
    left_np = np.asarray(fp.fp_from_ints(h.F, list(range(1, n + 1))))
    right_np = np.asarray(fp.fp_from_ints(h.F, list(range(n + 1, 2 * n + 1))))
    sh = NamedSharding(mesh, P("data"))
    left = jax.make_array_from_callback(
        left_np.shape, sh, lambda i: left_np[i])
    right = jax.make_array_from_callback(
        right_np.shape, sh, lambda i: right_np[i])
    out = jax.jit(lambda l, r: sharded_poseidon_2_1(h, mesh, l, r))(
        left, right)
    # fully replicate for the digest: process-spanning output is sharded
    got = np.asarray(jax.device_get(
        jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(out)
    .addressable_data(0)))
    local = np.asarray(jax.jit(h.hash_2_1)(jnp.asarray(left_np),
                                           jnp.asarray(right_np)))
    assert np.array_equal(got, local), "sharded != local on worker"
    import hashlib
    print("DIGEST", hashlib.sha256(got.tobytes()).hexdigest(), flush=True)


if __name__ == "__main__":
    main()
