#!/usr/bin/env python3
"""Driver benchmark harness: BASELINE configs on the attached TPU chip.

Default (BENCH_METRIC=all) runs the four BASELINE configs, each in its own
subprocess under a hard per-metric wall-clock cap, headline MSM first, and
prints ONE JSON line per rung the moment it is ready:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Round-5 design rule (the rounds 3/4 lesson — a timed-out 2^20 run or a
cold-cache compile is worth strictly less than a measured small size):
every metric emits a GUARANTEED small-size line first, from a graph whose
cold compile is a small fraction of the cap, and only then upgrades to the
full BASELINE size with whatever budget remains.  A cold compile cache
degrades the output to small-size numbers — never to nothing.  Later lines
supersede earlier ones for the same family (the full-size line is emitted
last on success).

Budgeting (from round-5 measurements: the persistent compile cache DOES
hit across processes for identical source bytes, but executables stream
through the ~0.4 MB/s relay, so a "warm" metric still costs roughly
executable-size/bandwidth — e.g. the 145 MB hybrid-MSM program is ~340 s
per process):
  BENCH_BUDGET_S   total wall budget for `all` (default 2940 s)
  per-metric caps  msm 780 s, poseidon 330 s, fft 330 s, groth16 1500 s
                   (ordered so the cheap guaranteed lines stream out
                   first if an outer budget kills the tail)
  BENCH_MSM_LOG2   headline MSM size (default 16; 2^20 runs additionally
                   when BENCH_MSM_LOG2=20)

vs_baseline compares against the reference's CPU throughput; the reference
publishes no numbers (BASELINE.md), so fixed estimates of a modern
multicore CPU running ginger-lib's rayon paths are used (provenance in
BASELINE.md).

MSM pipeline: points are generated HOST-side (P_i = P_{i-1} + G affine
int math — no device generator graph to compile cold) and cached to npz;
scalars are full-range random.  The guaranteed rung runs the scan-form
double-and-add at 2^10; the headline rung runs the digit-major
hybrid Pippenger (ops/msm.msm_bucketed ladder) at 2^BENCH_MSM_LOG2.
Harness shape: snark-scalability examples
(/root/reference/proof-systems/src/groth16/examples/snark-scalability/
groth16.rs:54-60).
"""

import json
import os
import sys
import time

CPU_BASELINE_PPS = 6.0e4
# reference Groth16 prover on the BASELINE toy config (~2^10 constraints,
# MNT4-753): ~6 MSMs of ~2^10 753-bit points + 7 FFTs on a modern multicore
# CPU with rayon — estimated ~1 proof/s (no published numbers; BASELINE.md)
CPU_BASELINE_PROOFS = 1.0
_T0 = time.monotonic()


def _deadline() -> float:
    """Seconds remaining before this metric subprocess is killed."""
    cap = float(os.environ.get("BENCH_METRIC_CAP_S", "1e9"))
    return cap - (time.monotonic() - _T0)


def _setup_jax():
    """Per-process JAX config: persistent compile cache so repeat bench
    runs (and the metric subprocesses) skip the multi-minute remote
    compiles."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/gingerlib_jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        print(f"compile cache unavailable: {e}", file=sys.stderr, flush=True)
    return jax


def emit(obj):
    print(json.dumps(obj), flush=True)


def note(name, msg):
    print(f"[bench {name} +{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# host-side MSM inputs (no device compiles): P_i = P_{i-1} + G ints
# ---------------------------------------------------------------------------

def _host_points(g1, n_log2):
    """n distinct G1 affine points by incremental host addition, cached."""
    import numpy as np
    from gingerlib_tpu.fields import fp as fpmod
    path = f"/tmp/gingerlib_bench_hostpts_{g1.name}_{n_log2}.npz"
    if os.path.exists(path):
        z = np.load(path)
        return z["xs"], z["ys"]
    p = g1.fp.modulus
    gx, gy = g1.generator_host
    n = 1 << n_log2
    xs_i = np.empty((n,), object)
    ys_i = np.empty((n,), object)
    x, y = gx % p, gy % p
    for i in range(n):
        xs_i[i], ys_i[i] = x, y
        if i + 1 == n:
            break
        # chord/tangent add with G (x == gx only at i = 0: doubling)
        lam = ((y - gy) * pow(x - gx, -1, p) % p if x != gx
               else (3 * x * x + g1.a_host) * pow(2 * y, -1, p) % p)
        x2 = (lam * lam - x - gx) % p
        y2 = (lam * (x - x2) - y) % p
        x, y = x2, y2
    digs = fpmod.fp_from_ints(g1.fp, list(xs_i))
    xs = digs.reshape(n, 1, g1.fp.n_digits)
    ys = fpmod.fp_from_ints(g1.fp, list(ys_i)).reshape(n, 1,
                                                       g1.fp.n_digits)
    np.savez(path, xs=xs, ys=ys)
    return xs, ys


def _rand_scalar_digits(fr, n, seed=4243):
    import numpy as np
    import jax.numpy as jnp
    from gingerlib_tpu.ops import limbs
    srng = np.random.RandomState(seed)
    nbytes = (fr.modulus.bit_length() + 7) // 8 + 10
    scalars = [int.from_bytes(srng.bytes(nbytes), "little") % fr.modulus
               for _ in range(n)]
    return jnp.asarray(limbs.to_digits_batch(scalars, fr.n_digits))


def _time_reps(run, fetch, dt_first):
    """Steady-state seconds/op given the first (post-compile) run time."""
    reps = 1 if dt_first > 45 else 3
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run()
    fetch(out)
    return (time.perf_counter() - t0) / reps


def main_msm():
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops import msm as msm_mod

    g1 = CI.mnt4753_g1()
    fr = g1.scalar_field

    def fetch(x):
        # block_until_ready does NOT block on the tunneled TPU backend;
        # a device->host fetch is the only reliable completion barrier
        return np.asarray(x)

    # ---- rung A (guaranteed): scan-form double-and-add at 2^10 ----
    # msm_naive is the only MSM whose graph is compile-small through the
    # remote AOT helper (one lax.scan body + log2(n) tree-reduce adds):
    # measured cold compiles on this tunnel — naive 2^10 ~1-2 min,
    # projective Pippenger 2^12 741 s, hybrid 2^16 ~20 min.  A cold cache
    # therefore degrades msm to this rung's (low) number instead of no
    # line at all; the full-size rungs below supersede it when they land.
    n_a = 1 << 10
    note("msm", "rung A: host point gen 2^10")
    xs_np, ys_np = _host_points(g1, 10)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    sd = _rand_scalar_digits(fr, n_a)
    run_a = jax.jit(lambda xs, ys, sd: msm_mod.msm_naive(g1, xs, ys, sd))
    note("msm", "rung A: compile+run")
    t0 = time.perf_counter()
    fetch(run_a(xs, ys, sd)[0])
    note("msm", f"rung A first pass {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    fetch(run_a(xs, ys, sd)[0])
    dt = _time_reps(lambda: run_a(xs, ys, sd), lambda o: fetch(o[0]),
                    time.perf_counter() - t0)
    emit({"metric": "msm_points_per_sec_2e10_g1_mnt4753",
          "value": round(n_a / dt, 2), "unit": "points/s",
          "vs_baseline": round(n_a / dt / CPU_BASELINE_PPS, 4),
          "rung": "scan_naive"})

    # (no middle rung: a projective-Pippenger 2^12 line was measured at
    # 657 pts/s but its 71 MB executable costs ~340 s per process through
    # the ~0.4 MB/s relay — not worth a redundant fallback line)

    # ---- rung B (headline): hybrid Pippenger at 2^BENCH_MSM_LOG2 ----
    n_log2 = int(os.environ.get("BENCH_MSM_LOG2", "16"))
    if _deadline() < float(os.environ.get("BENCH_MSM_MIN_B_S", "240")):
        note("msm", "skipping headline rung: budget exhausted")
        return
    n = 1 << n_log2
    note("msm", f"rung B: host point gen 2^{n_log2}")
    xs_np, ys_np = _host_points(g1, n_log2)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    sd = _rand_scalar_digits(fr, n)

    def make_run():
        return jax.jit(
            lambda xs, ys, sd: msm_mod.msm_bucketed(g1, xs, ys, sd))

    run = make_run()
    # full-pipeline fallback ladder: a Mosaic rejection drops one kernel
    # rung and re-traces
    for fallback in ("GINGERLIB_MSM_HYBRID", "GINGERLIB_EC_RNS",
                     "GINGERLIB_FUSED_EC", "GINGERLIB_PALLAS", None):
        try:
            note("msm", "rung B: compile+run")
            t0 = time.perf_counter()
            fetch(run(xs, ys, sd)[0])
            break
        except Exception as e:  # pragma: no cover - TPU safety net
            if fallback is None:
                raise
            note("msm", f"pipeline failed ({type(e).__name__}); "
                 f"disabling {fallback}")
            os.environ[fallback] = "0"
            run = make_run()
    from gingerlib_tpu.ops import pallas_ec
    rung = ("hybrid" if os.environ.get("GINGERLIB_MSM_HYBRID", "1") != "0"
            and pallas_ec.supports(g1) else
            "rns" if os.environ.get("GINGERLIB_EC_RNS") == "1" else
            "fused" if os.environ.get("GINGERLIB_FUSED_EC", "1") != "0"
            else "xla")
    note("msm", f"rung B first pass {time.perf_counter() - t0:.1f}s "
         f"(kernel rung: {rung})")
    t0 = time.perf_counter()
    fetch(run(xs, ys, sd)[0])
    dt = _time_reps(lambda: run(xs, ys, sd), lambda o: fetch(o[0]),
                    time.perf_counter() - t0)
    emit({"metric": f"msm_points_per_sec_2e{n_log2}_g1_mnt4753",
          "value": round(n / dt, 2), "unit": "points/s",
          "vs_baseline": round(n / dt / CPU_BASELINE_PPS, 4),
          "rung": rung})


def main_groth16():
    """BENCH_METRIC=groth16: prover end-to-end on the BASELINE toy config —
    the snark-scalability Benchmark circuit (constraints.rs:19-40) over
    MNT4-753: guaranteed rung at 2^6 constraints, headline at
    2^BENCH_G16_LOG2 (default 10)."""
    _setup_jax()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    from benchmarks.snark_scalability import benchmark_circuit
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.fields import fp as fpmod
    from gingerlib_tpu.relations.r1cs import compile_r1cs
    from gingerlib_tpu.proofs import groth16
    from gingerlib_tpu.proofs.groth16_host import host_groth16_mnt4753

    eng = CI.mnt4753_pairing()
    fr = eng.g1.scalar_field
    TOXIC = dict(alpha=123, beta=456, gamma=789, delta=1011, t=314159)

    def host_check(cs, proof, xs):
        """Verify the DEVICE proof with the host-int oracle: a stronger
        check than device verify (it pins the proof against an
        independent implementation of the reference dataflow) and it
        costs zero device compiles — the device pairing graph alone is a
        multi-minute compile this metric cannot afford (covered instead
        by tests/test_groth16*.py)."""
        H = host_groth16_mnt4753()
        hparams = H.setup_vk(cs, **TOXIC)
        fq = eng.g1.fp

        def g1i(xy):
            # host EC coords are component LISTS (K=1 for G1)
            return ([fpmod.fp_to_int(fq, np.asarray(xy[0])[0])],
                    [fpmod.fp_to_int(fq, np.asarray(xy[1])[0])])

        def g2i(xy):
            return ([fpmod.fp_to_int(fq, c) for c in np.asarray(xy[0])],
                    [fpmod.fp_to_int(fq, c) for c in np.asarray(xy[1])])

        pr = {"a": g1i(proof.a), "b": g2i(proof.b), "c": g1i(proof.c)}
        assert H.verify(hparams, pr, xs), "device proof failed host verify"

    def one_size(log2, reps):
        cs, xs = benchmark_circuit(fr, 4, 1 << log2)
        compiled = compile_r1cs(cs)
        note("groth16", f"2^{log2}: setup")
        params = groth16.generate_parameters(eng, cs, **TOXIC)
        note("groth16", f"2^{log2}: prove (compile + first run)")
        proof = groth16.create_proof(eng, params, compiled,
                                     cs.assignment(), r=31337, s=71717)
        note("groth16", f"2^{log2}: host-oracle verify")
        host_check(cs, proof, xs)
        note("groth16", f"2^{log2}: steady-state x{reps}")
        t0 = time.perf_counter()
        for _ in range(reps):
            proof = groth16.create_proof(eng, params, compiled,
                                         cs.assignment(), r=31337, s=71717)
        np.asarray(proof.a[0])   # device->host fetch: completion barrier
        dt = (time.perf_counter() - t0) / reps
        emit({"metric": f"groth16_proofs_per_sec_2e{log2}_mnt4753",
              "value": round(1.0 / dt, 4), "unit": "proofs/s",
              "vs_baseline": round(1.0 / dt / CPU_BASELINE_PROOFS, 4)})

    one_size(6, int(os.environ.get("BENCH_G16_REPS", "3")))
    # The 2^10 upgrade is OPT-IN (BENCH_G16_LOG2=10): executing the
    # 2^11-domain witness-map graph crashes the TPU worker process
    # deterministically (2/2 reproductions, round 5 — same "kernel
    # fault" class as the windowed fixed-base query; Mosaic-level root
    # cause open, ROADMAP.md).  2^6 exercises the identical prover
    # dataflow and is host-oracle-verified bit-exact.
    log2_b = int(os.environ.get("BENCH_G16_LOG2", "6"))
    if log2_b <= 6:
        return
    if _deadline() < float(os.environ.get("BENCH_G16_MIN_B_S", "420")):
        note("groth16", "skipping headline rung: budget exhausted")
        return
    one_size(log2_b, int(os.environ.get("BENCH_G16_REPS", "3")))


def _tiled_field_batch(fr, n, seed):
    import numpy as np
    import jax.numpy as jnp
    from gingerlib_tpu.fields import fp as fpmod
    rng = np.random.RandomState(seed)
    base_n = min(n, 1 << 10)
    base = np.stack([fpmod.fp_from_int(
        fr, int.from_bytes(rng.bytes(94), "little") % fr.modulus)
        for _ in range(base_n)])
    return jnp.asarray(np.tile(base, (n // base_n, 1)))


def main_fft():
    """BENCH_METRIC=fft: fft+ifft roundtrip over MNT4-753 Fr (BASELINE
    config #3) with a bit-exact roundtrip check: guaranteed rung at 2^14,
    headline at 2^BENCH_FFT_LOG2 (default 20).  vs_baseline: a
    multicore-CPU radix-2 FFT over 753-bit Fr at 2^20 runs ~1-2 s per pass
    (estimate; the reference publishes no numbers), so the baseline is
    2^20 elements / 2 s = 5.2e5 butterflied-elements/s per fft+ifft."""
    jax = _setup_jax()
    import numpy as np
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops.fft import Domain

    fr = CI.mnt4753_g1().scalar_field

    def one_size(log2, check):
        n = 1 << log2
        dom = Domain(fr, n)
        coeffs = _tiled_field_batch(fr, n, seed=17)
        run = jax.jit(lambda c: dom.ifft(dom.fft(c)))
        note("fft", f"2^{log2}: compile+run")
        t0 = time.perf_counter()
        out = np.asarray(run(coeffs))
        note("fft", f"2^{log2} first pass {time.perf_counter() - t0:.1f}s")
        if check:
            assert np.array_equal(out, np.asarray(coeffs)), \
                "fft roundtrip mismatch"
        t0 = time.perf_counter()
        np.asarray(run(coeffs))
        dt = _time_reps(lambda: run(coeffs), lambda o: np.asarray(o),
                        time.perf_counter() - t0)
        emit({"metric": f"fft_roundtrip_elems_per_sec_2e{log2}_fr_mnt4753",
              "value": round(n / dt, 2), "unit": "elems/s",
              "vs_baseline": round(n / dt / 5.2e5, 4)})

    one_size(14, check=True)
    if _deadline() < float(os.environ.get("BENCH_FFT_MIN_B_S", "150")):
        note("fft", "skipping headline rung: budget exhausted")
        return
    one_size(int(os.environ.get("BENCH_FFT_LOG2", "20")), check=True)


def main_poseidon():
    """BENCH_METRIC=poseidon: Poseidon Merkle tree build over MNT4-753
    (BASELINE config #4): guaranteed rung 2^10 leaves, headline
    2^BENCH_MERKLE_LOG2 (default 16).  vs_baseline: the reference's batch
    Poseidon on a multicore CPU hashes ~1e4 2-to-1/s (test_hash_speed
    scale; estimate, no published numbers)."""
    _setup_jax()
    import numpy as np
    from gingerlib_tpu.primitives.poseidon import PoseidonHash, \
        PoseidonParams
    from gingerlib_tpu.primitives.merkle import FieldBasedMerkleTree

    h = PoseidonHash(PoseidonParams.mnt4753())
    fr = h.F
    max_log2 = int(os.environ.get("BENCH_MERKLE_LOG2", "16"))

    def one_size(log2, reps):
        n = 1 << log2
        leaves = _tiled_field_batch(fr, n, seed=23)
        tree = FieldBasedMerkleTree(h, log2 + 1)
        note("poseidon", f"2^{log2}: compile+build")
        t0 = time.perf_counter()
        # single-dispatch scan build, shapes padded to the headline size:
        # ONE compiled executable and ONE device round-trip serve both
        # rungs (the per-level build is one jitted call per chunk —
        # measured >25 min at 2^16 purely in tunnel dispatch latency)
        tree.build_scan(leaves, max_leaves=1 << max_log2)
        np.asarray(tree.root())
        note("poseidon",
             f"2^{log2} first pass {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(reps):
            tree.build_scan(leaves, max_leaves=1 << max_log2)
        np.asarray(tree.root())
        dt = (time.perf_counter() - t0) / reps
        emit({"metric": f"poseidon_merkle_hashes_per_sec_2e{log2}_mnt4753",
              "value": round((n - 1) / dt, 2), "unit": "hashes/s",
              "vs_baseline": round((n - 1) / dt / 1.0e4, 4)})

    one_size(10, reps=3)
    if _deadline() < float(os.environ.get("BENCH_MERKLE_MIN_B_S", "90")):
        note("poseidon", "skipping headline rung: budget exhausted")
        return
    one_size(int(os.environ.get("BENCH_MERKLE_LOG2", "16")),
             reps=int(os.environ.get("BENCH_MERKLE_REPS", "3")))


def main_all():
    """Run each metric in a subprocess under a hard wall-clock cap so one
    slow/hung remote compile cannot eat the driver budget (round-3
    failure: rc=124 with zero lines; round-4 failure: all four metrics
    cold-compiled past their caps with zero lines — hence the per-metric
    guaranteed small rungs above).  JSON lines stream through as each
    rung lands; a timed-out or crashed metric keeps whatever lines it
    already printed."""
    import subprocess

    budget = float(os.environ.get("BENCH_BUDGET_S", "2940"))
    caps = {"msm": 780.0, "poseidon": 330.0, "fft": 330.0, "groth16": 1500.0}
    t_start = time.monotonic()
    me = os.path.abspath(__file__)
    for name in ("msm", "poseidon", "fft", "groth16"):
        remaining = budget - (time.monotonic() - t_start)
        if remaining < 45:
            print(f"bench {name} skipped: budget exhausted",
                  file=sys.stderr, flush=True)
            continue
        cap = min(caps[name], remaining)
        env = dict(os.environ, BENCH_METRIC=name,
                   BENCH_METRIC_CAP_S=str(cap))
        t0 = time.monotonic()
        try:
            rc = subprocess.run([sys.executable, me], env=env,
                                timeout=cap).returncode
            status = f"rc={rc}"
        except subprocess.TimeoutExpired:
            status = f"timeout after {cap:.0f}s"
        print(f"bench {name}: {status} ({time.monotonic() - t0:.0f}s)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    which = os.environ.get("BENCH_METRIC", "all")
    fns = {"groth16": main_groth16, "fft": main_fft,
           "poseidon": main_poseidon, "msm": main_msm}
    if which in fns:
        fns[which]()
    else:
        main_all()
