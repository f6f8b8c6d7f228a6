"""gingerlib_tpu — a TPU-native zk-SNARK framework.

A from-scratch JAX/Pallas rebuild of the capabilities of ginger-lib
(Horizen's Rust zk-SNARK library): 753-bit Montgomery field arithmetic,
MNT4-753 / MNT6-753 pairing cycle, Pippenger MSM, prime-field FFT, Groth16 /
GM17 provers, Poseidon / Merkle / Schnorr / VRF primitives, an R1CS gadget
layer, and recursive proof composition — all batch-first on device meshes.

Layout (mirrors SURVEY.md §2's component inventory, redesigned TPU-first):
  ops/        limb + Montgomery kernels, FFT, MSM (the perf core)
  fields/     Fp + extension towers, concrete field parameters
  curves/     short-Weierstrass / twisted-Edwards models, pairings
  relations/  R1CS constraint system + QAP/SAP reductions
  proofs/     Groth16, GM17
  primitives/ Poseidon, Merkle trees, Schnorr, ECVRF, Pedersen, Blake2s
  gadgets/    in-circuit std + crypto gadgets incl. SNARK verifier (recursion)
  parallel/   mesh sharding for MSM / FFT / prover
  utils/      timers, serialization, rng
"""

__version__ = "0.1.0"
