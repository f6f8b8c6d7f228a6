#!/usr/bin/env python3
"""SNARK scalability harness — CLI clone of the reference's
proof-systems/src/*/examples/snark-scalability/{groth16,gm17}.rs.

Usage:
    python benchmarks/snark_scalability.py <groth16|gm17> <num_inputs> \
        <num_constraints> <output.csv> [curve]

Loops setup / prove / verify over the synthetic chained-multiplication
Benchmark circuit (constraints.rs:19-40) and appends per-phase timings as a
CSV row, exactly like the reference harness (groth16.rs:54-60).
"""

import os
import sys
import time
import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def benchmark_circuit(fr, num_inputs: int, num_constraints: int,
                      with_values: bool = True):
    """Chained a·b=c circuit (examples/snark-scalability/constraints.rs):
    inputs x_1..x_k, then constraints c_i = c_{i-1}·x_{(i mod k)+1}."""
    from gingerlib_tpu.relations.r1cs import ConstraintSystem, \
        LinearCombination
    p = fr.modulus
    rng = random.Random(12345)
    xs = [rng.randrange(1, p) for _ in range(num_inputs)]
    cs = ConstraintSystem(fr)
    in_vars = [cs.alloc_input(f"x{i}", xs[i] if with_values else None)
               for i in range(num_inputs)]
    prev_val = xs[0]
    prev = in_vars[0]
    for i in range(num_constraints):
        j = i % num_inputs
        new_val = prev_val * xs[j] % p
        new = cs.alloc(f"c{i}", new_val if with_values else None)
        cs.enforce(LinearCombination.of(prev), LinearCombination.of(in_vars[j]),
                   LinearCombination.of(new), f"mul{i}")
        prev, prev_val = new, new_val
    return cs, xs


def main():
    if len(sys.argv) < 5:
        print(__doc__)
        sys.exit(2)
    scheme, ni, nc, out_csv = (sys.argv[1], int(sys.argv[2]),
                               int(sys.argv[3]), sys.argv[4])
    curve = sys.argv[5] if len(sys.argv) > 5 else "mnt4753"
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.relations.r1cs import compile_r1cs
    eng = getattr(CI, f"{curve}_pairing")()
    fr = eng.g1.scalar_field

    cs, xs = benchmark_circuit(fr, ni, nc)
    assert cs.is_satisfied()

    t0 = time.perf_counter()
    if scheme == "groth16":
        from gingerlib_tpu.proofs import groth16 as PS
        params = PS.generate_parameters(eng, cs, alpha=3, beta=5, gamma=7,
                                        delta=9, t=123457)
        t1 = time.perf_counter()
        compiled = compile_r1cs(cs)
        proof = PS.create_proof(eng, params, compiled, cs.assignment(),
                                r=111, s=222)
        import jax
        jax.block_until_ready(proof.a)
        t2 = time.perf_counter()
        ok = PS.verify_proof(eng, params.vk, proof, xs[1:] if ni > 1 else [])
        t3 = time.perf_counter()
    elif scheme == "gm17":
        from gingerlib_tpu.proofs import gm17 as PS
        params = PS.generate_parameters(eng, cs, alpha=3, beta=5, gamma=1,
                                        t=123457)
        t1 = time.perf_counter()
        compiled = compile_r1cs(cs)
        proof = PS.create_proof(eng, params, compiled, cs.assignment(),
                                d1=11, d2=22, r=333)
        import jax
        jax.block_until_ready(proof.a)
        t2 = time.perf_counter()
        ok = PS.verify_proof(eng, params.vk, proof, xs[1:] if ni > 1 else [])
        t3 = time.perf_counter()
    else:
        raise SystemExit(f"unknown scheme {scheme}")
    assert ok, "proof did not verify"

    row = f"{ni},{nc},{t1 - t0:.6f},{t2 - t1:.6f},{t3 - t2:.6f}\n"
    new = not os.path.exists(out_csv)
    with open(out_csv, "a") as f:
        if new:
            f.write("num_inputs,num_constraints,setup_s,prove_s,verify_s\n")
        f.write(row)
    print(f"{scheme}/{curve} inputs={ni} constraints={nc} "
          f"setup={t1-t0:.3f}s prove={t2-t1:.3f}s verify={t3-t2:.3f}s ok")


if __name__ == "__main__":
    main()
