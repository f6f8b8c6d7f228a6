"""Shared test helpers: golden-model oracles are plain python ints."""

import random

import numpy as np
import jax.numpy as jnp

from gingerlib_tpu.fields import fp


def rand_ints(params, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(params.modulus) for _ in range(n)]


def to_dev(params, xs):
    return jnp.asarray(fp.fp_from_ints(params, xs))


def to_host(params, d):
    return fp.fp_to_ints(params, np.asarray(d))


def ext_rand(ops, n, seed=0):
    """Random extension elements: (host int lists, device array [n, K, nd])."""
    rng = random.Random(seed)
    p = ops.fp.modulus
    host = [[rng.randrange(p) for _ in range(ops.K)] for _ in range(n)]
    dev = jnp.asarray(np.stack([ops.const(h) for h in host]))
    return host, dev


def ext_to_host(ops, x):
    """[..., K, nd] -> nested python int lists (flat component lists)."""
    from gingerlib_tpu.fields.towers import ext_to_ints
    x = np.asarray(x)
    if x.ndim == 2:
        return ext_to_ints(ops, x)
    return [ext_to_host(ops, row) for row in x]
